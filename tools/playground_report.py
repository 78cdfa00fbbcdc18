#!/usr/bin/env python
"""Playground report — the reference playground's analog as a generated,
self-contained HTML artifact.

The reference ships a browser playground with spectrogram / spectrum-analyzer
/ benchmark modes (playground/src/spectrogram.js, main.js; SURVEY.md §2.2).
A TPU framework has no microphone or canvas loop, so the analog is a
reproducible REPORT: synthesize a chirp+tones signal, run the real watfft_tpu
pipelines (stft.spectrogram, rfft spectrum, bench results JSON), and render
everything into one HTML file with embedded PNGs plus the data tables.

Usage: python tools/playground_report.py [out.html] [--cpu]

Chart styling follows the dataviz method: sequential magnitude = one blue
ramp light->dark (never a rainbow), single-series marks in slot-1 blue,
recessive grid/axes, muted ink, direct labels, a table view for every chart.
"""

from __future__ import annotations

import base64
import io
import json
import os
import sys

import numpy as np

# palette (validated reference instance; light surface)
SURFACE = "#fcfcfb"
PAGE = "#f9f9f7"
INK = "#0b0b0b"
INK2 = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
BASELINE = "#c3c2b7"
BLUE = "#2a78d6"
ORANGE = "#eb6834"
# sequential blue ramp 100 -> 700 (magnitude job: one hue, light -> dark)
BLUE_RAMP = ["#cde2fb", "#b7d3f6", "#9ec5f4", "#86b6ef", "#6da7ec", "#5598e7",
             "#3987e5", "#2a78d6", "#256abf", "#1c5cab", "#184f95", "#104281",
             "#0d366b"]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.rcParams.update({
        "figure.facecolor": SURFACE, "axes.facecolor": SURFACE,
        "savefig.facecolor": SURFACE,
        "text.color": INK, "axes.labelcolor": INK2,
        "xtick.color": MUTED, "ytick.color": MUTED,
        "axes.edgecolor": BASELINE, "axes.linewidth": 0.8,
        "grid.color": GRID, "grid.linewidth": 0.8,
        "font.family": "sans-serif", "font.size": 10,
        "axes.grid": True, "axes.axisbelow": True,
        "axes.spines.top": False, "axes.spines.right": False,
    })
    return plt


def _png(fig) -> str:
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    import matplotlib.pyplot as plt
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _blue_cmap():
    from matplotlib.colors import LinearSegmentedColormap
    return LinearSegmentedColormap.from_list("watfft_blue", BLUE_RAMP)


def synth_signal(sr: int = 16000, seconds: float = 2.0) -> np.ndarray:
    """Chirp + two tones + noise floor (the spectrogram demo's signal)."""
    t = np.arange(int(sr * seconds)) / sr
    chirp = np.sin(2 * np.pi * (300 + 1800 * t) * t)
    tone1 = 0.5 * np.sin(2 * np.pi * 2500 * t)
    tone2 = 0.35 * np.sin(2 * np.pi * 5200 * t) * (t > seconds / 2)
    noise = 0.02 * np.random.default_rng(0).standard_normal(t.shape)
    return (chirp + tone1 + tone2 + noise).astype(np.float32)


def spectrogram_png(sig, sr) -> tuple[str, dict]:
    from watfft_tpu import stft as S
    n_fft, hop, n_mels = 512, 128, 96
    p = np.asarray(S.spectrogram(sig, n_fft=n_fft, hop=hop, log=False))
    fb = S.mel_filterbank(n_mels, n_fft, sr)
    mel = np.log10(p @ fb.T + 1e-8).T  # [mels, frames]
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8.4, 3.2))
    ax.imshow(mel, aspect="auto", origin="lower", cmap=_blue_cmap(),
              extent=[0, len(sig) / sr, 0, n_mels], interpolation="nearest")
    ax.set_xlabel("time (s)")
    ax.set_ylabel("mel bin")
    ax.grid(False)
    meta = {"n_fft": n_fft, "hop": hop, "n_mels": n_mels,
            "frames": int(mel.shape[1])}
    return _png(fig), meta


def spectrum_png(sig, sr) -> tuple[str, list]:
    """Spectrum-analyzer snapshot: one Hann-windowed 2048-point frame."""
    from watfft_tpu import stft as S
    n = 2048
    frame = sig[len(sig) // 2: len(sig) // 2 + n] * S.get_window("hann", n)
    # rfft via the public context API (planner-dispatched)
    import watfft_tpu as wt
    X = np.asarray(wt.rfft(frame.astype(np.float32)))
    mag_db = 20 * np.log10(np.abs(X) + 1e-9)
    freqs = np.arange(len(X)) * sr / n
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8.4, 2.8))
    ax.plot(freqs, mag_db, color=BLUE, linewidth=2.0)
    ax.set_xlabel("frequency (Hz)")
    ax.set_ylabel("magnitude (dB)")
    ax.set_xlim(0, sr / 2)
    # direct labels on the three loudest peaks (selective, not every point)
    order = np.argsort(mag_db)[::-1]
    picked = []
    for i in order:
        if all(abs(freqs[i] - freqs[j]) > 300 for j in picked):
            picked.append(i)
        if len(picked) == 3:
            break
    for i in picked:
        ax.annotate(f"{freqs[i]:.0f} Hz", (freqs[i], mag_db[i]),
                    textcoords="offset points", xytext=(4, 4),
                    fontsize=9, color=INK2)
    rows = [(f"{freqs[i]:.0f}", f"{mag_db[i]:.1f}") for i in picked]
    return _png(fig), rows


def bench_chart_png() -> tuple[str | None, list]:
    """Speedup-vs-jnp bars from the latest saved headline bench results."""
    path = os.path.join(REPO, "benchmarks", "results", "headline.latest.json")
    if not os.path.exists(path):
        return None, []
    data = json.load(open(path))
    ours, theirs = {}, {}
    for r in data.get("results", []):
        name = r["name"]
        if "/f32/n" not in name or "stft" in name or "fft-large" in name:
            continue
        n = int(name.rsplit("n", 1)[1])
        if name.startswith("watfft/") and ("stockham" in name or "fourstep" in name):
            ours.setdefault(n, r["ops_per_sec"])
        elif name.startswith("jnp.fft/f32"):
            theirs.setdefault(n, r["ops_per_sec"])
    sizes = sorted(set(ours) & set(theirs))
    if not sizes:
        return None, []
    speedups = [ours[n] / theirs[n] for n in sizes]
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8.4, 3.0))
    xs = np.arange(len(sizes))
    ax.bar(xs, speedups, width=0.62, color=BLUE, zorder=3)
    ax.axhline(1.0, color=BASELINE, linewidth=1.2, zorder=2)
    ax.text(len(sizes) - 0.4, 1.06, "jnp.fft = 1x", fontsize=9, color=MUTED)
    for x, s in zip(xs, speedups):
        ax.annotate(f"{s:.2f}x", (x, s), textcoords="offset points",
                    xytext=(0, 3), ha="center", fontsize=9, color=INK2)
    ax.set_xticks(xs, [str(n) for n in sizes])
    ax.set_xlabel("transform size N")
    ax.set_ylabel("speedup vs jnp.fft")
    ax.grid(axis="x", visible=False)
    rows = [(str(n), f"{ours[n]:,.0f}", f"{theirs[n]:,.0f}",
             f"{ours[n]/theirs[n]:.2f}x") for n in sizes]
    return _png(fig), rows


HTML = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>watfft_tpu playground report</title>
<style>
  :root {{ color-scheme: light; }}
  body {{ background: {page}; color: {ink}; margin: 0;
         font-family: system-ui, -apple-system, "Segoe UI", sans-serif; }}
  main {{ max-width: 880px; margin: 0 auto; padding: 24px 16px 64px; }}
  h1 {{ font-size: 22px; margin: 8px 0 2px; }}
  h2 {{ font-size: 16px; margin: 28px 0 6px; }}
  p.sub {{ color: {ink2}; margin: 0 0 12px; font-size: 13px; }}
  .card {{ background: {surface}; border: 1px solid rgba(11,11,11,0.10);
          border-radius: 10px; padding: 14px; margin: 10px 0; }}
  img {{ max-width: 100%; height: auto; display: block; }}
  table {{ border-collapse: collapse; font-size: 12.5px; margin-top: 8px;
          font-variant-numeric: tabular-nums; }}
  th {{ text-align: left; color: {ink2}; font-weight: 600; }}
  th, td {{ padding: 3px 14px 3px 0; border-bottom: 1px solid {grid}; }}
  code {{ background: {grid}; border-radius: 4px; padding: 1px 5px;
         font-size: 12px; }}
  footer {{ color: {muted}; font-size: 12px; margin-top: 28px; }}
</style></head><body><main>
<h1>watfft_tpu playground report</h1>
<p class="sub">Generated by <code>python tools/playground_report.py</code> on
backend <b>{backend}</b> — the TPU-framework analog of the reference's
browser playground (spectrogram / spectrum analyzer / benchmark modes).</p>

<h2>Mel spectrogram</h2>
<p class="sub">Chirp (300&#8594;3900 Hz) + 2.5 kHz tone + gated 5.2 kHz tone,
through <code>watfft_tpu.stft.spectrogram</code> (n_fft={n_fft}, hop={hop},
{n_mels} mel bins, {frames} frames).</p>
<div class="card"><img alt="mel spectrogram heatmap: a rising chirp line, a
constant 2.5 kHz band, and a 5.2 kHz band appearing halfway"
src="data:image/png;base64,{spec}"></div>

<h2>Spectrum analyzer</h2>
<p class="sub">One Hann-windowed 2048-point frame through the public
<code>watfft_tpu.rfft</code> (planner-dispatched kernel). Peaks:</p>
<div class="card"><img alt="magnitude spectrum with labeled peaks"
src="data:image/png;base64,{spectrum}">
<table><tr><th>peak (Hz)</th><th>magnitude (dB)</th></tr>{peak_rows}</table>
</div>

<h2>Benchmark</h2>
<p class="sub">{bench_sub}</p>
<div class="card">{bench_body}</div>

<footer>watfft_tpu — TPU-native FFT framework. Reference playground:
playground/src in EmNudge/wat-fft.</footer>
</main></body></html>
"""


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--cpu" in sys.argv:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    out = args[0] if args else os.path.join(REPO, "playground_report.html")
    import jax
    sr = 16000
    sig = synth_signal(sr)
    spec, meta = spectrogram_png(sig, sr)
    spectrum, peaks = spectrum_png(sig, sr)
    bench, bench_rows = bench_chart_png()
    peak_rows = "".join(f"<tr><td>{f}</td><td>{m}</td></tr>" for f, m in peaks)
    if bench:
        bench_sub = ("Latest saved headline results "
                     "(<code>benchmarks/results/headline.latest.json</code>): "
                     "forward+inverse roundtrip throughput, ours vs jnp.fft.")
        rows = "".join(
            f"<tr><td>{n}</td><td>{o}</td><td>{j}</td><td>{s}</td></tr>"
            for n, o, j, s in bench_rows)
        bench_body = (f'<img alt="bar chart: speedup vs jnp.fft per size" '
                      f'src="data:image/png;base64,{bench}">'
                      f"<table><tr><th>N</th><th>ours (ops/s)</th>"
                      f"<th>jnp.fft (ops/s)</th><th>speedup</th></tr>{rows}</table>")
    else:
        bench_sub = ("No saved bench results found — run <code>python bench.py"
                     "</code> on a TPU host first, then regenerate.")
        bench_body = "<p class='sub'>(benchmark chart omitted)</p>"
    html = HTML.format(
        page=PAGE, surface=SURFACE, ink=INK, ink2=INK2, muted=MUTED,
        grid=GRID, backend=jax.default_backend(), spec=spec,
        spectrum=spectrum, peak_rows=peak_rows, bench_sub=bench_sub,
        bench_body=bench_body, **meta)
    with open(out, "w") as f:
        f.write(html)
    print(f"wrote {out} ({os.path.getsize(out) // 1024} KB)")


if __name__ == "__main__":
    main()
