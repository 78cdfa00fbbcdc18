"""Probe (Exp 51): fuse the 3D real path end-to-end for the STFT workload.

The stft-workload row runs 3.3x while standalone rfft n=1024 runs 6.1x.
Hypothesis: the chain's XLA side passes (hermitian_post_nb + the [re;im]
concat carry) cost us relatively more than jnp (whose rfft fuses with the
consumer in one XLA program). In the 3D layout the Hermitian mirror is a
LEADING-axis flip (untiled in Mosaic — unlike the 2D layout where it needs
the MXU, Exp 47), so the whole pipeline can fuse into ONE kernel emitting
pffft-style packed halfcomplex [n, 8, W]: rows [X0.re, X1..m-1.re,
Xm.re, X1..m-1.im] (lossless; bins 0/m are real).

Variants at the workload shape [1024, 8, 512] (b=4096):
  A. current: rfft_nb (core kernel + XLA post) + lossy concat carry, vs
     jnp with the same lossy concat (reproduces the committed 3.3x row)
  B. fused packed kernel (ONE pallas_call) vs jnp building the SAME
     packed array (both sides produce identical outputs)
  C. fused kernel with split-plane outputs [m+1,8,W]x2 + concat carry
     (isolates the XLA-post saving from the packed-carry saving)
"""
import sys, os, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from watfft_tpu import config
from watfft_tpu.bench.harness import paired_chain, enable_compile_cache
from watfft_tpu.ops.pallas_stockham import (stage_plan, make_twiddle_pack,
                                            run_stages, _TwCache)
from watfft_tpu.ops.pallas_rfft import rfft_nb, _Cache

enable_compile_cache()
rng = np.random.default_rng(11)

n, b = 1024, 4096
m = n // 2
W = b // 8
x3 = jnp.asarray(rng.uniform(-1, 1, (n, b)).astype(np.float32)
                 .reshape(n, 8, W))
x2 = jnp.asarray(np.asarray(x3).reshape(n, b))  # same data, [n, b] row-major
xb = jnp.asarray(np.asarray(x3).reshape(n, b).T.copy())  # [b, n] for jnp


def _flip_lead(x, block=32):
    """Reverse the (untiled) leading axis of a rank-3 array inside a Mosaic
    kernel without lax.rev (no 'rev' lowering, verified on chip): reverse a
    [nb, G, ...] view with G static slices, then reorder the nb blocks —
    G + m/G copies instead of m."""
    m = x.shape[0]
    G = min(block, m)
    while m % G:
        G //= 2
    nb = m // G
    v = x.reshape(nb, G, *x.shape[1:])
    inner = jnp.concatenate([v[:, i:i + 1] for i in range(G - 1, -1, -1)],
                            axis=1)
    out = jnp.concatenate([inner[j:j + 1] for j in range(nb - 1, -1, -1)],
                          axis=0)
    return out.reshape(x.shape)


def _fused_kernel(n, offsets, stages, packed,
                  x_ref, twre_ref, twim_ref, hre_ref, him_ref, *out_refs):
    m = n // 2
    x = x_ref[:]
    s, w = x.shape[-2], x.shape[-1]
    xv = x.reshape(m, 2, s, w)
    zre, zim = run_stages(xv[:, 0], xv[:, 1], m, False, offsets, stages,
                          twre_ref[:], twim_ref[:])
    are, aim = zre[1:], zim[1:]
    bre = _flip_lead(zre)[:m - 1]
    bim = _flip_lead(zim)[:m - 1]
    ere = 0.5 * (are + bre)
    eim = 0.5 * (aim - bim)
    dre = are - bre
    dim = aim + bim
    ore = 0.5 * dim
    oim = -0.5 * dre
    wr = hre_ref[:][1:m].reshape(m - 1, 1, 1)
    wi = him_ref[:][1:m].reshape(m - 1, 1, 1)
    xre_core = ere + wr * ore - wi * oim
    xim_core = eim + wr * oim + wi * ore
    z0re, z0im = zre[:1], zim[:1]
    if packed:
        out_refs[0][:] = jnp.concatenate(
            [z0re + z0im, xre_core, z0re - z0im, xim_core], axis=0)
    else:
        zero = jnp.zeros_like(z0re)
        out_refs[0][:] = jnp.concatenate(
            [z0re + z0im, xre_core, z0re - z0im], axis=0)
        out_refs[1][:] = jnp.concatenate([zero, xim_core, zero], axis=0)


@functools.partial(jax.jit, static_argnames=("n", "w_tile", "packed"))
def fused_call(x, twre, twim, hre, him, n, w_tile, packed=True):
    m = n // 2
    Wt = x.shape[-1]
    stages = tuple(stage_plan(m, three_d=True))
    offsets = make_twiddle_pack(m, False, three_d=True)[2]
    kernel = functools.partial(_fused_kernel, n, offsets, stages, packed)
    grid = (Wt // w_tile,)
    xblock = pl.BlockSpec((n, 8, w_tile), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    pblock = pl.BlockSpec((m + 1, 8, w_tile), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec(twre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    hspec = pl.BlockSpec(hre.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    if packed:
        out_specs = [xblock]
        out_shape = [jax.ShapeDtypeStruct((n, 8, Wt), x.dtype)]
    else:
        out_specs = [pblock, pblock]
        out_shape = [jax.ShapeDtypeStruct((m + 1, 8, Wt), x.dtype)] * 2
    r = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[xblock, twspec, twspec, hspec, hspec],
        out_specs=out_specs, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=config.VMEM_LIMIT_BYTES),
    )(x, twre, twim, hre, him)
    return r[0] if packed else r


sre, sim = _TwCache.get(m, False, three_d=True)
hre, him = _Cache.get(n, False)
sre, sim = jnp.asarray(sre), jnp.asarray(sim)
hrej, himj = jnp.asarray(hre), jnp.asarray(him)

# correctness: packed vs numpy
y = np.fft.rfft(np.asarray(x2).T.astype(np.float64), axis=-1)  # [b, m+1]
pk_ref = np.concatenate([y.real[:, :m], y.real[:, m:m + 1], y.imag[:, 1:m]],
                        axis=1)  # [b, n]
got = np.asarray(fused_call(x3, sre, sim, hrej, himj, n, 128, True))
got2 = got.reshape(n, b).T
err = np.max(np.abs(got2 - pk_ref)) / np.max(np.abs(pk_ref))
print(f"packed fused rel_err vs numpy: {err:.2e}", flush=True)

pre, pim = fused_call(x3, sre, sim, hrej, himj, n, 128, False)
zfull = np.asarray(pre).reshape(m + 1, b) + 1j * np.asarray(pim).reshape(m + 1, b)
err_p = np.max(np.abs(zfull.T - y)) / np.max(np.abs(y))
print(f"planes fused rel_err vs numpy: {err_p:.2e}", flush=True)

# ---- A: current path (reproduce committed row) ----

def sstep(c):
    re, im = rfft_nb(c)
    return jnp.concatenate([re[:-1], im[:-1]], axis=0)[:n]

def jstft(c):
    yy = jnp.fft.rfft(c)
    return jnp.concatenate([yy.real[:, :-1], yy.imag[:, :-1]], axis=1)[:, :n]

t_a, t_ja, r_a, _ = paired_chain(sstep, x3, jstft, xb, reps=5)
print(f"A current : ours={t_a*1e6:.1f}us jnp={t_ja*1e6:.1f}us x{r_a:.2f}",
      flush=True)

# ---- B: fused packed vs jnp packed ----

def fstep(c):
    return fused_call(c, sre, sim, hrej, himj, n, 128, True)

def jpacked(c):
    yy = jnp.fft.rfft(c)
    re, im = yy.real, yy.imag
    return jnp.concatenate([re[:, :m], re[:, m:m + 1], im[:, 1:m]], axis=1)

t_b, t_jb, r_b, _ = paired_chain(fstep, x3, jpacked, xb, reps=5)
print(f"B packed  : ours={t_b*1e6:.1f}us jnp={t_jb*1e6:.1f}us x{r_b:.2f}",
      flush=True)

# ---- C: fused planes + concat carry vs jnp (same consumer as A) ----

def cstep(c):
    re, im = fused_call(c, sre, sim, hrej, himj, n, 128, False)
    return jnp.concatenate([re[:-1], im[:-1]], axis=0)[:n]

t_c, t_jc, r_c, _ = paired_chain(cstep, x3, jstft, xb, reps=5)
print(f"C fplanes : ours={t_c*1e6:.1f}us jnp={t_jc*1e6:.1f}us x{r_c:.2f}",
      flush=True)

# w_tile ladder on the winner
for wt in (256, 512):
    if W % wt:
        continue
    def fstep_wt(c, wt=wt):
        return fused_call(c, sre, sim, hrej, himj, n, wt, True)
    t_w, t_jw, r_w, _ = paired_chain(fstep_wt, x3, jpacked, xb, reps=3)
    print(f"B packed w_tile={wt}: ours={t_w*1e6:.1f}us x{r_w:.2f}", flush=True)
