"""Test harness config: CPU backend with a virtual 8-device mesh + x64.

Tests run on the CPU backend (8 virtual devices for sharding tests, per the
driver contract) with x64 enabled so the f64 tier and the f64 reference DFT
are exact. TPU execution is exercised by bench.py / __graft_entry__.py on the
real chip.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon site forces JAX_PLATFORMS=axon via the environment; the config
# update below (after import) reliably pins tests to CPU.
# WATFFT_TEST_TPU=1 skips the pin for targeted chip spot-runs of single
# files (e.g. tests/test_mxu_select.py's bf16x3 bit-equality pin, which
# only exercises the compiled-Mosaic path on a real TPU backend); x64
# stays off there — the chip has no f64 units, and full-suite runs remain
# a CPU/CI concern.
if os.environ.get("WATFFT_TEST_TPU", "") in ("", "0"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (repo-local, gitignored): the interpret-mode
# Pallas kernels at the per-bin override sizes (tests/test_per_bin.py) cost
# 50-210 s of XLA:CPU compile EACH cold (Exp 43-style measurement: n=4096
# first call 208 s, second 0.14 s); the cache amortizes them across runs on
# the same machine.
from watfft_tpu.bench.harness import enable_compile_cache  # noqa: E402

enable_compile_cache()
