"""Isolated butterfly / single-stage tester for the Stockham kernel math.

Analog of tools/butterfly_tester.js (reference: verifies radix-2/-4
butterfly math in isolation from the algorithm structure, incl. the
w = 1 / +-j special-case branches, tools/butterfly_tester.js:40-120).
TPU re-axing: this kernel's "butterfly" is `_small_dft` — a recursive
radix-2 network over R whole part-planes with scalar constant twiddles
(including the q==0 -> w=1 and 4q==R -> w=-+j special cases the reference
tests explicitly) — and one "stage" is `_stage` (twiddle scaling + small
DFT + Stockham interleave). Both are tested here in ISOLATION against
O(R^2) numpy oracles, for every radix the plans use (2..64) and for every
(R, l) stage of every standard plan, forward and inverse, plus the folded
1/n inverse scaling of the final stage.

Usage:
    python tools/butterfly_tester.py [--radices 2,4,...] [--sizes 64,...]
                                     [--seed 7] [--batch 16] [--cases 5]
Exit code 0 iff every check passes (CI runs this next to
permutation_validator.py / index_visualizer.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# host-side debug tool: keep the eager jnp stage ops off any accelerator
jax.config.update("jax_platforms", "cpu")

from watfft_tpu.ops.pallas_stockham import (_small_dft, _stage, stage_plan,
                                            make_twiddle_pack)

TOL = 5e-6  # f32 butterflies vs f64 oracle, scaled by radix below


def oracle_dft(parts: np.ndarray, inverse: bool) -> np.ndarray:
    """O(R^2) matrix DFT across the part axis (axis 0), f64."""
    r = parts.shape[0]
    sign = +1.0 if inverse else -1.0
    w = np.exp(sign * 2j * np.pi * np.outer(np.arange(r), np.arange(r)) / r)
    return np.tensordot(w, parts, axes=(1, 0))


def test_small_dft(radices, rng, batch, cases) -> int:
    """_small_dft vs the matrix oracle, random parts + special patterns."""
    fails = 0
    for r in radices:
        for inverse in (False, True):
            specials = [
                np.ones((r, batch)) + 0j,                   # w=1 path (DC)
                np.eye(r, batch) * 1j,                      # pure imag part 0
            ]
            randoms = [rng.uniform(-1, 1, (r, batch))
                       + 1j * rng.uniform(-1, 1, (r, batch))
                       for _ in range(cases)]
            for ci, z in enumerate(specials + randoms):
                res = [z[p].real.astype(np.float32) for p in range(r)]
                ims = [z[p].imag.astype(np.float32) for p in range(r)]
                ore, oim = _small_dft(res, ims, inverse)
                got = np.stack([np.asarray(ore[q]) + 1j * np.asarray(oim[q])
                                for q in range(r)])
                want = oracle_dft(z, inverse)
                err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)),
                                                       1e-30)
                if err > TOL * r:
                    print(f"FAIL small_dft R={r} inverse={inverse} "
                          f"case={ci}: err={err:.3e}")
                    fails += 1
    return fails


def oracle_stage(z: np.ndarray, n: int, r: int, l: int, inverse: bool,
                 final_scale: bool) -> np.ndarray:
    """One Stockham stage in f64: twiddle-scale part p by w_{R*l}^{p*(row
    mod l)}, R-point DFT across parts, interleave to rows j*R*l + q*l + k."""
    sign = +1.0 if inverse else -1.0
    q = n // r
    parts = np.stack([z[p * q:(p + 1) * q] for p in range(r)])
    k = np.arange(q) % l
    for p in range(1, r):
        ang = sign * 2.0 * np.pi * (p * k) / (r * l)
        parts[p] = parts[p] * np.exp(1j * ang)[:, None]
    out_parts = oracle_dft(parts, inverse)
    if final_scale:
        out_parts = out_parts / n
    g = n // (r * l)
    out = np.empty_like(z)
    for j in range(g):
        for p in range(r):
            out[j * r * l + p * l:(j * r * l + p * l) + l] = \
                out_parts[p, j * l:(j + 1) * l]
    return out


def test_stage(sizes, rng, batch) -> int:
    """_stage (2D and native-3D ranks) vs the f64 oracle for every (R, l)
    stage of every plan, forward + inverse, incl. the folded 1/n final."""
    fails = 0
    for n in sizes:
        for inverse in (False, True):
            twre, twim, offsets = make_twiddle_pack(n, inverse)
            stages = stage_plan(n)
            z = rng.uniform(-1, 1, (n, batch)) \
                + 1j * rng.uniform(-1, 1, (n, batch))
            for idx, (r, l) in enumerate(stages):
                is_final = idx == len(stages) - 1
                tw = None
                if offsets[idx] >= 0:
                    o = offsets[idx]
                    rows = (r - 1) * (n // r)
                    tw = (twre[o:o + rows].astype(np.float32),
                          twim[o:o + rows].astype(np.float32))
                scale0 = (np.float32(1.0 / n)
                          if (inverse and is_final) else None)
                want = oracle_stage(z, n, r, l, inverse,
                                    final_scale=inverse and is_final)
                for rank in ("2d", "3d"):
                    cre = z.real.astype(np.float32)
                    cim = z.imag.astype(np.float32)
                    if rank == "3d":
                        if batch % 8:
                            continue
                        cre = cre.reshape(n, 8, batch // 8)
                        cim = cim.reshape(n, 8, batch // 8)
                    ore, oim = _stage(cre, cim, n, r, l, tw, inverse, scale0)
                    got = (np.asarray(ore).reshape(n, batch)
                           + 1j * np.asarray(oim).reshape(n, batch))
                    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
                    if err > TOL * r:
                        print(f"FAIL stage n={n} idx={idx} (R={r}, l={l}) "
                              f"inverse={inverse} rank={rank}: err={err:.3e}")
                        fails += 1
    return fails


def main() -> int:
    args = sys.argv[1:]

    def opt(name, default):
        if name in args:
            return args[args.index(name) + 1]
        return default

    radices = [int(s) for s in opt("--radices", "2,4,8,16,32,64").split(",")]
    sizes = [int(s) for s in
             opt("--sizes", "16,64,256,1024,2048,4096,8192").split(",")]
    rng = np.random.default_rng(int(opt("--seed", "7")))
    batch = int(opt("--batch", "16"))
    cases = int(opt("--cases", "5"))

    fails = test_small_dft(radices, rng, batch, cases)
    fails += test_stage(sizes, rng, batch)
    n_dft = len(radices) * 2 * (cases + 2)
    n_stage = sum(len(stage_plan(n)) for n in sizes) * 2 * 2
    if fails == 0:
        print(f"OK — {n_dft} isolated small-DFT cases "
              f"(radices {radices}, w=1/+-j specials included) and "
              f"{n_stage} isolated stage cases (2D + native-3D ranks, "
              f"fwd+inv, folded 1/n finals) all match the f64 oracle")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
