"""Runtime tunables (env-overridable) — the framework's flag system.

Reference analog: per-module constants as WAT globals + the npm-scripts
matrix (SURVEY.md §5 "Config / flag system"). Every knob has a measured
default (docs/EXPERIMENT_LOG.md); env vars exist for experiments and for
future hardware generations, not for routine use.

  WATFFT_VMEM_LIMIT_MB   scoped VMEM limit for Pallas kernels (default 100)
  WATFFT_USE3D_MAX_N     largest n using the 3D small-n layout (default 128)
  WATFFT_DIRECT_MAX      largest DFT-matmul factor in the MXU surface (128)
  WATFFT_STOCKHAM_MAX_N  largest n the planner sends to the Stockham kernel
  WATFFT_RFFT_MAX_N      largest n the planner sends to the Pallas real path
  WATFFT_INTERPRET       force Pallas interpret mode (debugging / CPU CI
                         coverage of the dispatch branch)
"""

from __future__ import annotations

import os


def _int_env(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


VMEM_LIMIT_BYTES = _int_env("WATFFT_VMEM_LIMIT_MB", 100) * 1024 * 1024
USE3D_MAX_N = _int_env("WATFFT_USE3D_MAX_N", 128)
DIRECT_MAX = _int_env("WATFFT_DIRECT_MAX", 128)
STOCKHAM_MAX_N = _int_env("WATFFT_STOCKHAM_MAX_N", 4096)
RFFT_PALLAS_MAX_N = _int_env("WATFFT_RFFT_MAX_N", 8192)
FORCE_INTERPRET = os.environ.get("WATFFT_INTERPRET", "") not in ("", "0", "false")
