"""Spectrogram demo — the library-side analog of the reference's playground
spectrogram mode (playground/src/spectrogram.js): synthesize a chirp+tones
signal, compute a mel-scaled log spectrogram with watfft_tpu.stft, and save
a PNG.

Usage: python examples/spectrogram_demo.py [out.png] [--cpu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
        else "spectrogram.png"
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from watfft_tpu import stft as S

    sr = 16000
    t = np.arange(4 * sr) / sr
    # chirp 200 Hz -> 4 kHz + two steady tones + noise floor
    sig = (np.sin(2 * np.pi * (200 * t + (3800 / 8) * t * t))
           + 0.5 * np.sin(2 * np.pi * 1000 * t)
           + 0.3 * np.sin(2 * np.pi * 3000 * t)
           + 0.02 * np.random.default_rng(0).standard_normal(len(t))
           ).astype(np.float32)

    n_fft, hop = 1024, 256
    p = np.asarray(S.spectrogram(sig, n_fft=n_fft, hop=hop, log=False))
    fb = S.mel_filterbank(80, n_fft, sr)
    mel = np.log(p @ fb.T + 1e-10)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 4), dpi=120)
    ax.imshow(mel.T, origin="lower", aspect="auto",
              extent=[0, t[-1], 0, 80], cmap="magma")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("mel bin")
    ax.set_title(f"watfft_tpu mel spectrogram (n_fft={n_fft}, hop={hop})")
    fig.tight_layout()
    fig.savefig(out_path)
    print(f"wrote {out_path}  (frames={p.shape[0]}, bins={p.shape[1]})")


if __name__ == "__main__":
    main()
