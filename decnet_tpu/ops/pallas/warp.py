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
DEF_RB = 16
NEG_MARGIN = 16  # how far negative disparities are honoured


def _pick_tiles(W: int):
    """Tile-sweep result (scripts/sweep_tiles.py, stage-3 shape 540x972
    D=216): (256,16) beats (128,8) 2.82 vs 3.91 ms; narrower stages keep
    tw=128 so the ceil-to-tw width padding stays small."""
    return (256 if W >= 768 else DEF_TW), DEF_RB


def _ceil_to(x, m):
    return -(-x // m) * m


def _hwarp_kernel(feat_ref, d_ref, out_ref, *, band: int, tw: int, W: int,
                  max_disp: int):
    """feat (1, RB, C, Wpad) full row (left-padded by `band` — the slice
    start must stay lane-aligned for Mosaic); d (1, RB, TW) RAW disparities;
    out (1, RB, C, TW).  The sample coordinate x = (col - clip(d)) * W/(W-1)
    - 0.5 is computed in-kernel, saving three full-resolution elementwise
    passes in XLA, and the output is written unpadded (the H/W grids may be
    uneven; Pallas masks the ragged edge blocks).
    Blocks are 4D — grid (B, H-blocks, W-blocks); flattening B*H would force
    a tiling-relayout copy in XLA (see spamat._pad4)."""
    t = pl.program_id(2)
    kw = tw + band + NEG_MARGIN + 2
    k = feat_ref[0, :, :, pl.ds(t * tw, kw)]         # (RB, C, KW)
    d = jnp.clip(d_ref[0].astype(jnp.float32), -float(NEG_MARGIN),
                 float(max_disp))                    # (RB, TW)
    col = (t * tw
           + jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1)
           ).astype(jnp.float32)  # Mosaic iota must be integer-typed
    x = (col - d) * (W / (W - 1.0)) - 0.5
    # padded key column j corresponds to real column t*tw + j - band.
    # Bilinear taps as a tent: weight(j) = max(0, 1 - |j_real - x|) equals the
    # (1-frac, frac) one-hot pair but needs no floor/int-cast/compares — the
    # kernel is VPU-bound on exactly this (RB,TW,KW) build.
    kj = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 1)
    real_col = (t * tw - band + kj).astype(jnp.float32)  # (TW, KW)
    p = jnp.maximum(0.0, 1.0 - jnp.abs(real_col[None] - x[:, :, None]))
    # zeros padding handled by the zero-padded feature row itself; taps
    # outside [0, W) land on zeros.
    prec = (jax.lax.Precision.HIGHEST if k.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)  # HIGHEST+bf16 crashes Mosaic
    out_ref[0] = jax.lax.dot_general(
        k, p.astype(k.dtype), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "tw", "rb",
                                              "out_dtype"))
def _hwarp_rows(feat, disp, max_disp: int, tw: int = DEF_TW, rb: int = DEF_RB,
                out_dtype=jnp.float32):
    """feat (B, H, C, W), disp (B, H, W) raw disparities -> (B, H, C, W)
    out_dtype; the torch-parity coordinate transform + clip to
    [-NEG_MARGIN, max_disp] happens inside the kernel.

    The kernel accumulates in f32 and writes out_dtype directly — emitting
    bf16 here saves a full-resolution convert_element_type pass (~3 ms at
    the flagship shape) versus casting afterwards.  Only the feature row is
    padded (one fused pad op); disparities go in and the warped rows come
    out unpadded via ragged-edge grid blocks."""
    B, H, C, W = feat.shape
    band = max_disp + 2
    Wp = _ceil_to(max(W, tw), tw)
    fpad = jnp.pad(feat, ((0, 0), (0, 0), (0, 0),
                          (band, Wp - W + NEG_MARGIN + 2)))

    grid = (B, -(-H // rb), -(-W // tw))
    out = pl.pallas_call(
        functools.partial(_hwarp_kernel, band=band, tw=tw, W=W,
                          max_disp=max_disp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rb, C, Wp + band + NEG_MARGIN + 2),
                         lambda b, r, t: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rb, tw), lambda b, r, t: (b, r, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, C, tw), lambda b, r, t: (b, r, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, C, W), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(fpad, disp)
    return out


def _vert_interp(img, wdt):
    """Bilinear vertical resample y' = y*H/(H-1) - 0.5 along axis 1, zeros
    padding — torch grid_sample's row coupling.  Layout-agnostic: works for
    NHWC (B,H,W,C) and rows-form (B,H,C,W) alike (H is axis 1 in both)."""
    H = img.shape[1]
    ys = jnp.arange(H, dtype=jnp.float32)
    yy = ys * (H / (H - 1.0)) - 0.5
    y0 = jnp.floor(yy).astype(jnp.int32)
    wy1 = (yy - y0.astype(jnp.float32)).astype(wdt)   # weight of row y0+1
    imgc = img.astype(wdt)
    zrow = jnp.zeros_like(imgc[:, :1])
    up = jnp.concatenate([zrow, imgc[:, :-1]], axis=1)      # row y-1
    dn = jnp.concatenate([imgc[:, 1:], zrow], axis=1)       # row y+1
    is_up = (y0 == ys.astype(jnp.int32) - 1)[None, :, None, None]
    row_y0 = jnp.where(is_up, up, imgc)
    row_y1_same = jnp.where(is_up, imgc, dn)
    # out-of-range rows (y0 < 0 or y0+1 > H-1) contribute zeros
    row_y0 = jnp.where((y0 >= 0)[None, :, None, None], row_y0,
                       jnp.zeros((), wdt))
    row_y1 = jnp.where((y0 + 1 <= H - 1)[None, :, None, None], row_y1_same,
                       jnp.zeros((), wdt))
    return (row_y0 * (1 - wy1)[None, :, None, None]
            + row_y1 * wy1[None, :, None, None])


def _warp_pallas_fwd(img, disp, max_disp: int):
    """img (B,H,W,C), disp (B,H,W) -> (B,H,W,C), torch-parity warp."""
    # vertical pre-interpolation in the input dtype — bf16 stays bf16,
    # avoiding two full-res f32 conversions
    wdt = img.dtype if img.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    vert = _vert_interp(img, wdt)
    # horizontal banded warp; clip + coordinate transform happen in-kernel
    tw, rb = _pick_tiles(img.shape[2])
    out = _hwarp_rows(vert.transpose(0, 1, 3, 2), disp, max_disp,
                      tw=tw, rb=rb, out_dtype=img.dtype)
    return out.transpose(0, 1, 3, 2)


def _warp_rows_fwd(img_rows, disp, max_disp: int):
    """img_rows (B,H,C,W), disp (B,H,W) -> (B,H,C,W) in the input dtype.

    Rows-form twin of _warp_pallas_fwd: the feature tensor is already in the
    kernel's layout, so no transpose is paid on either side."""
    wdt = img_rows.dtype if img_rows.dtype in (jnp.bfloat16, jnp.float32) \
        else jnp.float32
    vert = _vert_interp(img_rows, wdt)
    tw, rb = _pick_tiles(img_rows.shape[3])
    return _hwarp_rows(vert, disp, max_disp, tw=tw, rb=rb,
                       out_dtype=img_rows.dtype)


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
    out, vjp = jax.vjp(xla_warp.warp_by_disparity, img, disp)
    # the Pallas forward emits img.dtype (bf16 under mixed precision) while
    # the XLA reference formulation produces f32 (weights are f32); align the
    # cotangent dtype with the reference output before pulling it back
    return vjp(g.astype(out.dtype))


warp_by_disparity_fast.defvjp(_fast_fwd, _fast_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp_rows_fast(img_rows, disp, max_disp: int):
    """Gather-free disparity warp on rows-form features (B,H,C,W) — same
    semantics as warp_by_disparity_fast on the NHWC-transposed input, with
    zero layout cost on either side of the kernel."""
    return _warp_rows_fwd(img_rows, disp, max_disp)


def _rows_fast_fwd(img_rows, disp, max_disp):
    return _warp_rows_fwd(img_rows, disp, max_disp), (img_rows, disp)


def _rows_fast_bwd(max_disp, res, g):
    img_rows, disp = res
    out, vjp = jax.vjp(xla_warp.warp_by_disparity,
                       img_rows.transpose(0, 1, 3, 2), disp)
    gimg, gdisp = vjp(g.transpose(0, 1, 3, 2).astype(out.dtype))
    return gimg.transpose(0, 1, 3, 2), gdisp


warp_rows_fast.defvjp(_rows_fast_fwd, _rows_fast_bwd)
