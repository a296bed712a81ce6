"""Pallas TPU kernel for disparity warping (grid_sample parity).

The profiler shows the generic XLA gather behind `warp_by_disparity` is the
single most expensive op in the model (~38% of the forward at full res — TPU
gathers run far from speed-of-light).  Disparity warps only ever look a
bounded distance along the row, so the gather is re-expressed as a **banded
one-hot matmul**: each program builds the (out-pixel x in-pixel) bilinear
weight tile from iota comparisons in VMEM and contracts it with the feature
row on the MXU.  No gather instruction is emitted.

Parity: torch grid_sample semantics as used by the reference
(submodule.py:719-745): sample x = (w - d) * W/(W-1) - 0.5 and
y' = y * H/(H-1) - 0.5, bilinear, zeros padding.  The vertical interpolation
couples only adjacent rows and is done with two cheap shifted XLA adds before
the kernel; the horizontal (banded) part runs in Pallas.

The kernel supports d in [-NEG_MARGIN, max_disp]; callers clamp (model
disparities live in that range; the XLA path remains the reference).
Gradients: custom_vjp re-runs the XLA formulation's VJP, so training is
exact while inference pays zero gather cost.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from decnet_tpu.ops import warp as xla_warp

DEF_TW = 128
DEF_RB = 8
NEG_MARGIN = 16  # how far negative disparities are honoured


def _ceil_to(x, m):
    return -(-x // m) * m


def _hwarp_kernel(feat_ref, x_ref, out_ref, *, band: int, tw: int):
    """feat (RB, C, Wpad) full row (left-padded by `band`); x (RB, TW)
    unnormalised sample positions in real column coords; out (RB, C, TW)."""
    t = pl.program_id(1)
    kw = tw + band + NEG_MARGIN + 2
    k = feat_ref[:, :, pl.ds(t * tw, kw)]            # (RB, C, KW)
    x = x_ref[...]                                   # (RB, TW)
    x0 = jnp.floor(x)
    frac = x - x0
    # padded key column j corresponds to real column t*tw + j - band
    kj = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 1)
    real_col = t * tw + kj - band                    # (TW, KW)
    x0i = x0.astype(jnp.int32)
    p = (jnp.where(real_col[None] == x0i[:, :, None], 1.0 - frac[:, :, None],
                   0.0)
         + jnp.where(real_col[None] == (x0i + 1)[:, :, None],
                     frac[:, :, None], 0.0))
    # zeros padding handled by the zero-padded feature row itself; taps
    # outside [0, W) land on zeros.
    prec = (jax.lax.Precision.HIGHEST if k.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)  # HIGHEST+bf16 crashes Mosaic
    out_ref[...] = jax.lax.dot_general(
        k, p.astype(k.dtype), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "tw", "rb"))
def _hwarp_rows(feat, x, max_disp: int, tw: int = DEF_TW, rb: int = DEF_RB):
    """feat (R, C, W), x (R, W) sample positions -> (R, C, W) f32."""
    R, C, W = feat.shape
    band = max_disp + 2
    Rp = _ceil_to(max(R, rb), rb)
    Wp = _ceil_to(max(W, tw), tw)
    fpad = jnp.pad(feat, ((0, Rp - R), (0, 0),
                          (band, Wp - W + NEG_MARGIN + 2)))
    xpad = jnp.pad(x, ((0, Rp - R), (0, Wp - W)), constant_values=-1e6)

    grid = (Rp // rb, Wp // tw)
    out = pl.pallas_call(
        functools.partial(_hwarp_kernel, band=band, tw=tw),
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
        interpret=jax.default_backend() != "tpu",
    )(fpad, xpad)
    return out[:R, :, :W]


def _warp_pallas_fwd(img, disp, max_disp: int):
    """img (B,H,W,C), disp (B,H,W) -> (B,H,W,C), torch-parity warp."""
    B, H, W, C = img.shape
    disp = jnp.clip(disp.astype(jnp.float32), -float(NEG_MARGIN),
                    float(max_disp))
    # vertical pre-interpolation: y' = y*H/(H-1) - 0.5 (in the input dtype —
    # bf16 stays bf16, avoiding two full-res f32 conversions)
    wdt = img.dtype if img.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    ys = jnp.arange(H, dtype=jnp.float32)
    yy = ys * (H / (H - 1.0)) - 0.5
    y0 = jnp.floor(yy).astype(jnp.int32)
    wy1 = (yy - y0.astype(jnp.float32)).astype(wdt)   # weight of row y0+1
    imgc = img.astype(wdt)
    zrow = jnp.zeros_like(imgc[:, :1])
    up = jnp.concatenate([zrow, imgc[:, :-1]], axis=1)      # row y-1
    dn = jnp.concatenate([imgc[:, 1:], zrow], axis=1)       # row y+1
    row_y0 = jnp.where((y0 == ys.astype(jnp.int32) - 1)[None, :, None, None],
                       up, imgc)
    row_y1_same = jnp.where((y0 == ys.astype(jnp.int32) - 1)
                            [None, :, None, None], imgc, dn)
    # out-of-range rows (y0 < 0 or y0+1 > H-1) contribute zeros
    row_y0 = jnp.where((y0 >= 0)[None, :, None, None], row_y0,
                       jnp.zeros((), wdt))
    row_y1 = jnp.where((y0 + 1 <= H - 1)[None, :, None, None], row_y1_same,
                       jnp.zeros((), wdt))
    vert = (row_y0 * (1 - wy1)[None, :, None, None]
            + row_y1 * wy1[None, :, None, None])

    # horizontal banded warp
    xs = jnp.arange(W, dtype=jnp.float32)
    xcoord = (xs[None, None, :] - disp) * (W / (W - 1.0)) - 0.5
    feat = vert.reshape(B * H, W, C).transpose(0, 2, 1)
    out = _hwarp_rows(feat, xcoord.reshape(B * H, W), max_disp)
    return out.transpose(0, 2, 1).reshape(B, H, W, C).astype(img.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp_by_disparity_fast(img, disp, max_disp: int):
    """Gather-free disparity warp (forward in Pallas, backward via the XLA
    reference VJP).  Matches ops.warp.warp_by_disparity for disparities in
    [-NEG_MARGIN, max_disp]."""
    return _warp_pallas_fwd(img, disp, max_disp)


def _fast_fwd(img, disp, max_disp):
    return _warp_pallas_fwd(img, disp, max_disp), (img, disp)


def _fast_bwd(max_disp, res, g):
    img, disp = res
    _, vjp = jax.vjp(xla_warp.warp_by_disparity, img, disp)
    return vjp(g)


warp_by_disparity_fast.defvjp(_fast_fwd, _fast_bwd)
