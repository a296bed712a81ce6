"""Clean A/B: old (R,C,W)-layout moments kernel (+ its XLA transpose prep) vs
the new NWC moments kernel, at the model's real matching shapes. Inputs
materialized NHWC bf16; chained carry + scalar readback."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
ensure_tpu()
from decnet_tpu.ops.pallas import spamat  # new NWC moments

EPS = 1e-6
_NEG = -3.0e38


def _ceil_to(x, m):
    return -(-x // m) * m


def _prec(dt):
    return (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)


# --- old (R,C,W) moments, verbatim from git show HEAD:...spamat.py ----------
def _moments_kernel_cw(ref_ref, rm_ref, tar_ref, tm_ref,
                       m_ref, se_ref, sed_ref, sed2_ref,
                       *, max_disp: int, tw: int):
    t = pl.program_id(1)
    dp = max_disp - 1
    kw = tw + dp
    q = ref_ref[...]                       # (RB, C, TW)
    k = tar_ref[:, :, pl.ds(t * tw, kw)]
    km = tm_ref[:, pl.ds(t * tw, kw)]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=_prec(q.dtype))
    qi = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 0)
    kj = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 1)
    d = qi - kj + dp
    band = (d >= 0) & (d < max_disp)
    valid = band[None] & (km[:, None, :] > 0)
    s = jnp.where(valid, s, _NEG)
    m = jnp.max(s, axis=2)
    m_c = jnp.maximum(m, EPS)
    e = jnp.where(valid, jnp.exp(s - m_c[:, :, None]), 0.0)
    d_f = d.astype(jnp.float32)[None]
    m_ref[...] = m_c
    se_ref[...] = jnp.sum(e, axis=2)
    sed_ref[...] = jnp.sum(e * d_f, axis=2)
    sed2_ref[...] = jnp.sum(e * d_f * d_f, axis=2)


@functools.partial(jax.jit, static_argnames=("max_disp", "tw", "rb"))
def moments_cw(ref, tar, ref_mask, tar_mask, max_disp: int,
               tw: int = 128, rb: int = 8):
    B, H, W, C = ref.shape
    R = B * H
    dp = max_disp - 1
    Rp = _ceil_to(max(R, rb), rb)
    Wp = _ceil_to(max(W, tw), tw)

    def rows_cw(x):
        x = x.reshape(R, W, C).transpose(0, 2, 1)
        return jnp.pad(x, ((0, Rp - R), (0, 0), (0, Wp - W)))

    def rows_cw_l(x):
        x = x.reshape(R, W, C).transpose(0, 2, 1)
        return jnp.pad(x, ((0, Rp - R), (0, 0), (dp, Wp - W)))

    refr = rows_cw(ref)
    tarr = rows_cw_l(tar)
    rmr = jnp.pad(ref_mask.astype(jnp.float32).reshape(R, W),
                  ((0, Rp - R), (0, Wp - W)))
    tmr = jnp.pad(tar_mask.astype(jnp.float32).reshape(R, W),
                  ((0, Rp - R), (dp, Wp - W)))

    grid = (Rp // rb, Wp // tw)
    out_spec = pl.BlockSpec((rb, tw), lambda r, t: (r, t),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((Rp, Wp), jnp.float32)
    m, se, sed, sed2 = pl.pallas_call(
        functools.partial(_moments_kernel_cw, max_disp=max_disp, tw=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, C, tw), lambda r, t: (r, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, tw), lambda r, t: (r, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, C, Wp + dp), lambda r, t: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Wp + dp), lambda r, t: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec,) * 4,
        out_shape=(shp,) * 4,
    )(refr, rmr, tarr, tmr)

    def unpack(x):
        return x[:R, :W].reshape(B, H, W)
    return unpack(m), unpack(se), unpack(sed), unpack(sed2)


def timeit(name, fn, carry0, iters=20):
    g = jax.jit(fn)
    c = g(carry0); jax.block_until_ready(c)
    c = g(c); jax.block_until_ready(c)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            c = g(c)
        v = float(c)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{name:44s} {best*1e3:8.3f} ms  ({v:.4g})", flush=True)
    return best


SHAPES = [
    ("stage1  1/9  C=72", 4, 60, 108, 72, 24),
    ("stage2  1/3  C=24", 4, 180, 324, 24, 72),
    ("stage3  full C=8 ", 4, 540, 972, 8, 216),
]

rng = np.random.RandomState(0)
for name, B, H, W, C, D in SHAPES:
    ref = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    tar = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    msk = jnp.asarray((rng.rand(B, H, W) < 0.3), jnp.float32)

    def nwc_path(carry, ref=ref, tar=tar, msk=msk, D=D):
        r = ref + carry.astype(jnp.bfloat16) * 0
        m, se, sed, sed2 = spamat.moments(r, tar, msk, msk, D)
        return sed.mean() + se.mean()

    def cw_path(carry, ref=ref, tar=tar, msk=msk, D=D):
        r = ref + carry.astype(jnp.bfloat16) * 0
        m, se, sed, sed2 = moments_cw(r, tar, msk, msk, D)
        return sed.mean() + se.mean()

    a = jax.jit(nwc_path)(jnp.float32(0))
    b = jax.jit(cw_path)(jnp.float32(0))
    print(f"{name}: |nwc-cw| = {abs(float(a)-float(b)):.3e}", flush=True)
    timeit(f"{name} NWC (new)", nwc_path, jnp.float32(0))
    timeit(f"{name} CW+transposes (old)", cw_path, jnp.float32(0))
