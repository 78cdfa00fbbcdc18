"""Tier 7: ecosystem/meta tests — registry coverage + baseline fairness.

Port of tests/benchmark-coverage.test.js (registry <-> surfaces consistency +
an N=64 DFT spot-check per entry) and tests/third-party-correctness.test.js
(verify the competitor baselines produce correct results so benchmarks are
meaningful — here the competitor is jnp.fft).
"""

import numpy as np
import pytest

from watfft_tpu import registry
from watfft_tpu.registry import SurfaceEntry
from watfft_tpu.reference import dft as ref


def test_every_surface_has_exactly_one_flagship():
    for surface in registry.SURFACES:
        for dtype in ("float32", "float64"):
            e = registry.flagship(surface, dtype)
            assert e.flagship and not e.baseline


def test_registry_entries_are_well_formed():
    names = set()
    for e in registry.REGISTRY:
        assert isinstance(e, SurfaceEntry)
        assert e.surface in registry.SURFACES
        assert e.dtype in ("float32", "float64", "bfloat16")
        assert e.min_size <= e.max_size
        assert not (e.flagship and e.baseline), "a baseline cannot be flagship"
        names.add((e.name, e.surface, e.dtype))
    assert len(names) == len(registry.REGISTRY), "duplicate registry entries"


@pytest.mark.parametrize("surface,kind", [
    ("complex-forward", "c2c"),
    ("complex-inverse", "c2c_inv"),
    ("real-forward", "r2c"),
    ("real-inverse", "c2r"),
])
def test_spot_check_every_entry_n64(surface, kind):
    """Every registry entry (including baselines) must produce a correct N=64
    transform — no kernel escapes validation (benchmark-coverage.test.js:1-21)."""
    n = 64
    rng = ref.seeded_rng(64)
    for e in registry.entries(surface, include_baselines=True):
        if not (e.min_size <= n <= e.max_size):
            continue
        tol = {"float32": 1e-4, "float64": 1e-9,
               "bfloat16": 3e-2}[e.dtype]  # bf16: I/O-rounding tier
        fn = e.make(n)
        if kind == "c2c":
            x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
            got, expected = np.asarray(fn(x)), ref.dft(x)
        elif kind == "c2c_inv":
            x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
            got, expected = np.asarray(fn(x)), ref.idft(x)
        elif kind == "r2c":
            x = rng.uniform(-1, 1, n)
            got, expected = np.asarray(fn(x)), ref.real_dft(x)
        else:
            sig = rng.uniform(-1, 1, n)
            got = np.asarray(fn(ref.real_dft(sig)))
            expected = sig
        scale = max(np.max(np.abs(expected)), 1e-30)
        err = np.max(np.abs(got - expected)) / scale
        assert err < tol, f"{e.name}/{e.surface}/{e.dtype}: err={err:.3e}"


def test_jnp_fft_baseline_is_fair():
    """The jnp.fft competitor entries compute the same convention we do
    (unnormalized forward, 1/N inverse) — ensuring benchmark comparisons are
    apples-to-apples (third-party-correctness.test.js:10-16)."""
    n = 128
    rng = ref.seeded_rng(5)
    x = rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)
    base_fwd = registry.entries("complex-forward", "float64",
                                include_baselines=True)
    jn = [e for e in base_fwd if e.baseline]
    assert jn, "jnp.fft baseline must be registered"
    got = np.asarray(jn[0].make(n)(x))
    np.testing.assert_allclose(got, ref.dft(x), atol=1e-9)


def test_bench_covers_flagship_kernels():
    """Every hot-path kernel must appear in bench.py — the reference's
    BENCH_COVERAGE map (wat-surfaces.mjs:217-231) existed because a stale
    bench mis-reported for two generations; this is the equivalent guard."""
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "bench.py")) as f:
        src = f.read()
    for needle in ("stockham_fft_nb", "rfft_nb", "fft_large", "jnp.fft"):
        assert needle in src, f"bench.py no longer exercises {needle}"


def test_bench_enumerates_registry():
    """bench.py's DEFAULT mode must bench every non-baseline registry
    surface — no kernel can silently escape benchmarking. New registry
    entries must be added to bench.py's BENCHED_SURFACES (with an actual
    timing section) before this passes."""
    import importlib.util
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(root, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    registered = {e.name for e in registry.entries(include_baselines=False)}
    missing = registered - bench.BENCHED_SURFACES
    assert not missing, f"registry surfaces missing from bench.py: {missing}"
    stale = bench.BENCHED_SURFACES - registered
    assert not stale, f"bench.py names surfaces not in the registry: {stale}"
    # the declared set must be backed by real timing sections
    with open(os.path.join(root, "bench.py")) as f:
        src = f.read()
    for name in bench.BENCHED_SURFACES:
        # each surface appears in a record() name (statically or via the
        # ours_name variable whose default is the literal)
        assert src.count(f'"{name}"') + src.count(f"watfft/{name}/") >= 2, (
            f"BENCHED_SURFACES claims {name} but bench.py never records it")


def test_bench_snapshot_covers_all_surfaces():
    """The COMMITTED results snapshot from a real chip run must contain a
    timed row for every BENCHED_SURFACES name (VERDICT r2 Weak #6): the
    static check above proves bench.py *names* each surface, but each bench
    section is wrapped in try/except — a section that silently excepts every
    run would still pass the static check while the surface goes unmeasured.
    Asserting against the saved run makes a dead section fail the suite the
    moment its snapshot is refreshed."""
    import importlib.util
    import json
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(root, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    path = os.path.join(root, "benchmarks", "results", "headline.latest.json")
    with open(path) as f:
        saved = json.load(f)
    rows = {r["name"] for r in saved["results"]}
    for name in bench.BENCHED_SURFACES:
        assert any(r.startswith(f"watfft/{name}/") for r in rows), (
            f"saved snapshot {path} has no timed row for surface {name} — "
            f"its bench section silently failed on the last recorded run")


def test_bench_sizes_are_tested_sizes():
    """The benchmark sweep must stay inside the correctness-tested range."""
    import os
    import re as _re
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "bench.py")) as f:
        src = f.read()
    m = _re.search(r"SIZES = \[([0-9, ]+)\]", src)
    assert m, "bench.py SIZES list not found"
    sizes = [int(s) for s in m.group(1).split(",")]
    for n in sizes:
        assert 2 <= n <= 4096 and (n & (n - 1)) == 0


def test_scipy_fft_competitor_is_correct():
    """scipy.fft (pocketfft) is the validated second competitor in the
    CPU second-runtime bench rows (bench.py main_cpu). Its rows are only
    meaningful if scipy computes the transform we compare against — the
    reference validates every competitor library the same way
    (tests/third-party-correctness.test.js:10-16, which caught kissfft-js
    silently running f32 and webfft's broken real FFT). Fails if scipy's
    output or normalization convention ever drifts."""
    sfft = pytest.importorskip("scipy.fft")
    n = 128
    rng = ref.seeded_rng(11)
    z = (rng.uniform(-1, 1, n) + 1j * rng.uniform(-1, 1, n)).astype(
        np.complex64)
    np.testing.assert_allclose(sfft.fft(z), ref.dft(z), atol=2e-4)
    # convention: unnormalized forward, 1/N inverse (ours + numpy's)
    np.testing.assert_allclose(sfft.ifft(sfft.fft(z)), z, atol=1e-5)
    np.testing.assert_allclose(sfft.ifft(z), ref.idft(z), atol=2e-4)
    xr = rng.uniform(-1, 1, n).astype(np.float32)
    np.testing.assert_allclose(sfft.rfft(xr), ref.real_dft(xr), atol=2e-4)


def test_readme_table_matches_snapshot():
    """README's headline table is GENERATED from the committed snapshot
    (tools/readme_table.py) — this fails whenever they drift (ADVICE r4 #3:
    README once matched no committed artifact). Evidence-chain guard."""
    import importlib.util
    import json
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "readme_table", os.path.join(root, "tools", "readme_table.py"))
    rt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rt)
    with open(rt.SNAPSHOT) as f:
        snapshot = json.load(f)
    with open(rt.README) as f:
        text = f.read()
    assert rt.current_block(text) == rt.render(snapshot), (
        "README.md headline table is out of sync with "
        "benchmarks/results/headline.latest.json — run "
        "python tools/readme_table.py")
