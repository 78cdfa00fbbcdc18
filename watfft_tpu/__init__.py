"""watfft_tpu — a TPU-native batched FFT framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of EmNudge/wat-fft
(see SURVEY.md): complex and real forward/inverse FFTs in f32 and f64 tiers
behind a plan-once context API, with the compute re-axed for TPU — DFT
matmuls on the MXU, split re/im planes, batch across the 8x128 lane grid,
native inverse with folded 1/N, fused Hermitian real paths — plus new scope
the reference lacks: large-N four-step through VMEM and mesh-sharded
multi-chip transforms.
"""

from .api import (
    FFTContext,
    RFFTContext,
    create_fft,
    create_fft_f32,
    create_rfft,
    create_rfft_f32,
    fft,
    ifft,
    rfft,
    irfft,
    fft2,
    ifft2,
)

__version__ = "0.1.0"

__all__ = [
    "FFTContext", "RFFTContext",
    "create_fft", "create_fft_f32", "create_rfft", "create_rfft_f32",
    "fft", "ifft", "rfft", "irfft", "fft2", "ifft2",
    "__version__",
]
