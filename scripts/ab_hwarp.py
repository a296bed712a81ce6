"""Clean A/B: old (R,C,W)-layout hwarp kernel (+ its XLA transposes) vs the
new NWC kernel, at the model's real warp shapes. All inputs materialized NHWC
bf16; timing includes the layout prep each path needs (that's what the model
pays). Chained carry + scalar readback per CLAUDE.md."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
import time, functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
ensure_tpu()
from decnet_tpu.ops.pallas.warp import _hwarp_rows, NEG_MARGIN  # NWC (new)

DEF_TW = 128
DEF_RB = 8


def _ceil_to(x, m):
    return -(-x // m) * m


# --- old (R,C,W) kernel, verbatim from git show HEAD:...warp.py -------------
def _hwarp_kernel_cw(feat_ref, x_ref, out_ref, *, band: int, tw: int):
    t = pl.program_id(1)
    kw = tw + band + NEG_MARGIN + 2
    k = feat_ref[:, :, pl.ds(t * tw, kw)]
    x = x_ref[...]
    x0 = jnp.floor(x)
    frac = x - x0
    kj = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 1)
    real_col = t * tw + kj - band
    x0i = x0.astype(jnp.int32)
    p = (jnp.where(real_col[None] == x0i[:, :, None], 1.0 - frac[:, :, None],
                   0.0)
         + jnp.where(real_col[None] == (x0i + 1)[:, :, None],
                     frac[:, :, None], 0.0))
    prec = (jax.lax.Precision.HIGHEST if k.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out_ref[...] = jax.lax.dot_general(
        k, p.astype(k.dtype), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "tw", "rb"))
def hwarp_cw(feat, x, max_disp: int, tw: int = DEF_TW, rb: int = DEF_RB):
    """feat (R, C, W) -> (R, C, W)."""
    R, C, W = feat.shape
    band = max_disp + 2
    Rp = _ceil_to(max(R, rb), rb)
    Wp = _ceil_to(max(W, tw), tw)
    fpad = jnp.pad(feat, ((0, Rp - R), (0, 0),
                          (band, Wp - W + NEG_MARGIN + 2)))
    xpad = jnp.pad(x, ((0, Rp - R), (0, Wp - W)), constant_values=-1e6)
    grid = (Rp // rb, Wp // tw)
    out = pl.pallas_call(
        functools.partial(_hwarp_kernel_cw, band=band, tw=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, C, Wp + band + NEG_MARGIN + 2),
                         lambda r, t: (r, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, tw), lambda r, t: (r, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, C, tw), lambda r, t: (r, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C, Wp), jnp.float32),
    )(fpad, xpad)
    return out[:R, :, :W]


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


# model warp shapes (flagship B=4): (B, H, W, C, max_disp)
SHAPES = [
    ("stage1  1/9  C=72", 4, 60, 108, 72, 24),
    ("stage2  1/3  C=24", 4, 180, 324, 24, 72),
    ("stage3  full C=8 ", 4, 540, 972, 8, 216),
]

rng = np.random.RandomState(0)
for name, B, H, W, C, D in SHAPES:
    img = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    xc = jnp.asarray(rng.rand(B, H, W) * (W - 1), jnp.float32)
    R = B * H

    def nwc_path(carry, img=img, xc=xc, R=R, W=W, C=C, D=D):
        f = (img + carry.astype(jnp.bfloat16) * 0).reshape(R, W, C)
        o = _hwarp_rows(f, xc.reshape(R, W), D)
        return o.mean()

    def cw_path(carry, img=img, xc=xc, R=R, W=W, C=C, D=D):
        f = (img + carry.astype(jnp.bfloat16) * 0).reshape(R, W, C)
        f = f.transpose(0, 2, 1)
        o = hwarp_cw(f, xc.reshape(R, W), D)
        return o.transpose(0, 2, 1).mean()

    # correctness first
    a = jax.jit(nwc_path)(jnp.float32(0))
    b = jax.jit(cw_path)(jnp.float32(0))
    print(f"{name}: |nwc-cw| = {abs(float(a)-float(b)):.3e}", flush=True)
    timeit(f"{name} NWC (new)", nwc_path, jnp.float32(0))
    timeit(f"{name} CW+transposes (old)", cw_path, jnp.float32(0))
