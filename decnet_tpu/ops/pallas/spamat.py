"""Pallas TPU kernels for masked sparse stereo matching (SpaMat/SpaVar).

Design (TPU-first, not a CUDA translation): the op is banded row-wise
cross-attention.  For each left pixel (query) q at column w, keys are the
right pixels in [w-max_disp+1, w]; the score is a feature dot product and the
output is the softmax-weighted expected disparity (SpaMat) or variance around
a given disparity (SpaVar) — reference math in
modules/SparseMatching/src/SM_kernel.cu:22-125 and
modules/SparseVar/src/SV_kernel.cu:22-124.

Kernel layout: rows (B*H) are independent and shard/tile freely.  Features are
transposed to (rows, C, W) so W rides the 128-lane axis and C the sublanes.
Each program holds RB rows x one TW query tile, slices the TW+D-1 key window
out of a full-row VMEM block, computes the (RB, TW, KW) score tile on the MXU,
and reduces the band with a masked softmax — scores never touch HBM (the XLA
fallback scans disparity instead; see decnet_tpu/ops/matching.py).

The backward kernels follow the flash-attention split: dRef consumes the
query-side band again; dTar runs over key tiles with the mirrored window
(SM_kernel.cu:300-355's forward scan).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def _prec(dtype):
    """HIGHEST for f32 inputs (exact parity); default for bf16 — bf16 is
    native on the MXU with f32 accumulation, and HIGHEST+bf16 crashes the
    Mosaic remote compiler (HTTP 500)."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
_NEG = -3.0e38
DEF_TW = 128


def _interpret() -> bool:
    """Interpret kernels off-TPU so the same code path runs in CPU tests."""
    return jax.default_backend() != "tpu"
DEF_RB = 8


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _cast_feat(x):
    """bf16 passes through (f32 accumulation happens in-kernel); anything
    else is cast to f32."""
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        x = x.astype(jnp.float32)
    return x


def _pad4(x, h_to, w_to, left=0):
    """Pad a 4D rows-form (B,H,C,W) or 3D (B,H,W) array: H to h_to, W to
    total w_to (left zeros for the disparity band, remainder right).

    The kernels stay 4D on purpose: flattening (B,H,...,W) to (B*H,...,W)
    with unaligned H/W forces a full tiling-relayout copy in XLA (measured
    ~4.6 ms at the flagship shape); padding alone is a cheap fused op."""
    pads = [(0, 0)] * x.ndim
    pads[1] = (0, h_to - x.shape[1])
    pads[-1] = (left, w_to - left - x.shape[-1])
    return jnp.pad(x, pads)


# ---------------------------------------------------------------------------
# Forward moments kernel
# ---------------------------------------------------------------------------

def _moments_kernel(ref_ref, rm_ref, tar_ref, tm_ref, *rest,
                    max_disp: int, tw: int, window: int = 0):
    # prior-windowed variant (window > 0): one extra per-query center block;
    # candidates additionally gated to |d - center| <= window (see
    # ops/matching.py "Prior-windowed fused matching")
    if window > 0:
        c_ref, m_ref, se_ref, sed_ref, sed2_ref = rest
    else:
        m_ref, se_ref, sed_ref, sed2_ref = rest
    # Sparsity: the reference CUDA kernel early-exits per masked-out query
    # (SM_kernel.cu:32-33); the TPU analog is per-PROGRAM — detail masks are
    # spatially clustered, so whole (rows x query-tile) blocks are empty and
    # skip all compute.  Every consumer gates the moment maps by ref_mask
    # (ops/matching.py), so zero-filled outputs for an empty tile are exact.
    # Blocks are 4D (1, RB, [C,] TW) — grid (B, H-blocks, W-blocks).
    any_query = jnp.sum(rm_ref[...]) > 0
    t = pl.program_id(2)

    @pl.when(any_query)
    def _compute():
        dp = max_disp - 1
        kw = tw + dp
        q = ref_ref[0]                            # (RB, C, TW)
        k = tar_ref[0, :, :, pl.ds(t * tw, kw)]   # (RB, C, KW) from full row
        km = tm_ref[0, :, pl.ds(t * tw, kw)]      # (RB, KW)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q.dtype))  # (RB,TW,KW)
        qi = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 1)
        d = qi - kj + dp                        # disparity per (query, key)
        band = (d >= 0) & (d < max_disp)
        valid = band[None] & (km[:, None, :] > 0)
        if window > 0:
            c = c_ref[0]                        # (RB, TW) per-query centers
            valid = valid & (jnp.abs(d.astype(jnp.float32)[None]
                                     - c[:, :, None]) <= window)

        s2 = jnp.where(valid, s, _NEG)
        m = jnp.max(s2, axis=2)
        m_c = jnp.maximum(m, EPS)           # SM_kernel.cu:45 max-cost floor
        # exp(_NEG - m_c) underflows to exactly 0, so no second select is
        # needed to zero the invalid lanes.  (Folding the three band
        # reductions into an MXU matvec via d = b - kj was tried and measured
        # SLOWER: 6.6-11 ms vs 5.6 ms at the stage-3 shape, both with the
        # moments on lanes at HIGHEST and on sublanes — the VPU reductions
        # fuse with exp, the matmul forces e to materialize.)
        e = jnp.exp(s2 - m_c[:, :, None])
        d_f = d.astype(jnp.float32)[None]
        m_ref[0] = m_c
        se_ref[0] = jnp.sum(e, axis=2)
        ed = e * d_f
        sed_ref[0] = jnp.sum(ed, axis=2)
        sed2_ref[0] = jnp.sum(ed * d_f, axis=2)

    @pl.when(jnp.logical_not(any_query))
    def _skip():
        zero = jnp.zeros(m_ref.shape, m_ref.dtype)
        m_ref[...] = zero
        se_ref[...] = zero
        sed_ref[...] = zero
        sed2_ref[...] = zero


@functools.partial(jax.jit, static_argnames=("max_disp", "tw", "rb",
                                             "window"))
def _moments_rows_impl(ref, tar, ref_mask, tar_mask, center, max_disp: int,
                       tw: int, rb: int, window: int):
    B, H, C, W = ref.shape
    dp = max_disp - 1
    Hp = _ceil_to(max(H, rb), rb)
    Wp = _ceil_to(max(W, tw), tw)

    refr = _pad4(_cast_feat(ref), Hp, Wp)
    rmr = _pad4(ref_mask.astype(jnp.float32), Hp, Wp)
    tarr = _pad4(_cast_feat(tar), Hp, Wp + dp, left=dp)
    tmr = _pad4(tar_mask.astype(jnp.float32), Hp, Wp + dp, left=dp)

    grid = (B, Hp // rb, Wp // tw)
    out_spec = pl.BlockSpec((1, rb, tw), lambda b, r, t: (b, r, t),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32)
    in_specs = [
        pl.BlockSpec((1, rb, C, tw), lambda b, r, t: (b, r, 0, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, tw), lambda b, r, t: (b, r, t),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, C, Wp + dp), lambda b, r, t: (b, r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb, Wp + dp), lambda b, r, t: (b, r, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [refr, rmr, tarr, tmr]
    if window > 0:
        in_specs.append(out_spec)            # per-query center block
        operands.append(_pad4(center.astype(jnp.float32), Hp, Wp))
    m, se, sed, sed2 = pl.pallas_call(
        functools.partial(_moments_kernel, max_disp=max_disp, tw=tw,
                          window=window),
        grid=grid,
        in_specs=in_specs,
        out_specs=(out_spec,) * 4,
        out_shape=(shp,) * 4,
        interpret=_interpret(),
    )(*operands)

    def unpack(x):
        return x[:, :H, :W]
    return unpack(m), unpack(se), unpack(sed), unpack(sed2)


def moments_rows(ref, tar, ref_mask, tar_mask, max_disp: int,
                 tw: int = DEF_TW, rb: int = DEF_RB, center=None,
                 window: int = 0):
    """Banded online-softmax moments from rows-form features.

    ref/tar (B,H,C,W) — the kernels' native layout (see layers.s2d_to_rows);
    masks (B,H,W).  Returns (m, se, sed, sed2), each (B,H,W) f32.
    With center (B,H,W) + window > 0, candidates are gated to
    |d - center| <= window (prior-windowed matching)."""
    if window <= 0:
        center = jnp.zeros((1, 1, 1), jnp.float32)  # unused placeholder
        window = 0
    return _moments_rows_impl(ref, tar, ref_mask, tar_mask, center,
                              max_disp, tw, rb, window)


def moments(ref, tar, ref_mask, tar_mask, max_disp: int,
            tw: int = DEF_TW, rb: int = DEF_RB, center=None,
            window: int = 0):
    """NHWC wrapper over moments_rows (transposes features to rows-form)."""
    return moments_rows(ref.transpose(0, 1, 3, 2), tar.transpose(0, 1, 3, 2),
                        ref_mask, tar_mask, max_disp, tw, rb, center, window)


def spamat_forward(ref, tar, ref_mask, tar_mask, max_disp: int):
    """(out, sum_sim, max_cost) with CUDA-parity epsilon semantics."""
    m, se, sed, _ = moments(ref, tar, ref_mask, tar_mask, max_disp)
    refm = ref_mask != 0
    out = jnp.where(refm, (EPS + sed) / (EPS + se), 0.0)
    return out, jnp.where(refm, EPS + se, 0.0), jnp.where(refm, m, 0.0)


def spavar_forward(ref, tar, ref_mask, tar_mask, disparity, max_disp: int):
    """(var, sum_sim, max_cost, sed, se) — SpaVar forward."""
    m, se, sed, sed2 = moments(ref, tar, ref_mask, tar_mask, max_disp)
    refm = ref_mask != 0
    disp = disparity.astype(jnp.float32)
    svar = sed2 - 2.0 * disp * sed + disp * disp * se
    out = jnp.where(refm, (EPS + svar) / (EPS + se), 0.0)
    return (out, jnp.where(refm, EPS + se, 0.0), jnp.where(refm, m, 0.0),
            sed, se)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _dref_kernel(ref_ref, tar_ref, tm_ref, mc_ref, out_ref, w_ref,
                 *rest, max_disp: int, tw: int, window: int = 0):
    """grad_ref[q] = (g/sum_sim)[q] * sum_k e(q,k) * (d - out[q]) * tar[k]
    (SM_kernel.cu:143-195). w_ref holds g/sum_sim pre-gated by ref_mask."""
    if window > 0:
        c_ref, gref_ref = rest
    else:
        (gref_ref,) = rest
    # Tile skip (cf. the forward kernel): w is g/sum_sim pre-gated by
    # ref_mask, so an all-zero w block contributes nothing.
    w = w_ref[0]
    any_query = jnp.sum(jnp.abs(w)) > 0
    t = pl.program_id(2)

    @pl.when(any_query)
    def _compute():
        dp = max_disp - 1
        kw = tw + dp
        q = ref_ref[0]
        k = tar_ref[0, :, :, pl.ds(t * tw, kw)]
        km = tm_ref[0, :, pl.ds(t * tw, kw)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q.dtype))
        qi = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 1)
        d = qi - kj + dp
        band = (d >= 0) & (d < max_disp)
        # Gate by the query weight too: at ref_mask==0 queries the stored
        # max_cost is 0, so exp(s) can overflow to inf and inf*0 -> NaN if
        # only multiplied out afterwards. where() discards the inf safely.
        valid = band[None] & (km[:, None, :] > 0) & (w[:, :, None] != 0)
        if window > 0:
            valid = valid & (jnp.abs(d.astype(jnp.float32)[None]
                                     - c_ref[0][:, :, None]) <= window)
        e = jnp.where(valid, jnp.exp(s - mc_ref[0][:, :, None]), 0.0)
        wq = e * (d.astype(jnp.float32)[None] - out_ref[0][:, :, None])
        wq = wq * w[:, :, None]
        # (RB,C,KW) x (RB,TW,KW) -> (RB,C,TW)
        gref_ref[0] = jax.lax.dot_general(
            k, wq.astype(k.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_prec(k.dtype))

    @pl.when(jnp.logical_not(any_query))
    def _skip():
        gref_ref[...] = jnp.zeros(gref_ref.shape, gref_ref.dtype)


def _dtar_kernel(tar_ref, tm_ref, ref_ref, mc_ref, out_ref, w_ref,
                 *rest, max_disp: int, tw: int, window: int = 0):
    """grad_tar[k] = sum_q e(q,k)*(d-out[q])*(g/sum_sim)[q]*ref[q]
    over q in [k, k+max_disp) (SM_kernel.cu:300-355). Query-side arrays are
    right-padded by max_disp-1; w_ref is g/sum_sim gated by ref_mask."""
    if window > 0:
        c_ref, gtar_ref = rest
    else:
        (gtar_ref,) = rest
    t = pl.program_id(2)
    dp = max_disp - 1
    qw = tw + dp
    wq = w_ref[0, :, pl.ds(t * tw, qw)]
    tm = tm_ref[0]
    # Tile skip: no masked key in this tile, or no contributing query in the
    # window (wq is g/sum_sim gated by ref_mask). gtar is multiplied by
    # tar_mask by the caller, so zeros are exact either way.
    any_work = (jnp.sum(tm) > 0) & (jnp.sum(jnp.abs(wq)) > 0)

    @pl.when(any_work)
    def _compute():
        k = tar_ref[0]                        # (RB, C, TW) keys (real coords)
        qs = ref_ref[0, :, :, pl.ds(t * tw, qw)]  # queries window
        mc = mc_ref[0, :, pl.ds(t * tw, qw)]
        ot = out_ref[0, :, pl.ds(t * tw, qw)]
        s = jax.lax.dot_general(k, qs, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=_prec(k.dtype))  # (RB,TW,QW)
        kj = jax.lax.broadcasted_iota(jnp.int32, (tw, qw), 0)
        qi = jax.lax.broadcasted_iota(jnp.int32, (tw, qw), 1)
        d = qi - kj                            # q_global - k_global = i - j
        band = (d >= 0) & (d < max_disp)
        # A masked-out key was not part of the forward max, so its score can
        # exceed mc[q] and exp overflows — gate by the key's tar mask
        # in-kernel (NaN would survive the caller's multiply-by-mask: inf*0).
        valid = band[None] & (wq[:, None, :] != 0) \
            & (tm[:, :, None] > 0)
        if window > 0:
            cq = c_ref[0, :, pl.ds(t * tw, qw)]   # (RB, QW) query centers
            valid = valid & (jnp.abs(d.astype(jnp.float32)[None]
                                     - cq[:, None, :]) <= window)
        e = jnp.where(valid, jnp.exp(s - mc[:, None, :]), 0.0)
        wk = e * (d.astype(jnp.float32)[None] - ot[:, None, :]) \
            * wq[:, None, :]
        gtar_ref[0] = jax.lax.dot_general(
            qs, wk.astype(qs.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_prec(qs.dtype))

    @pl.when(jnp.logical_not(any_work))
    def _skip():
        gtar_ref[...] = jnp.zeros(gtar_ref.shape, gtar_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "tw", "rb",
                                             "window"))
def _spamat_backward_rows_impl(ref, tar, ref_mask, tar_mask, out, sum_sim,
                               max_cost, g, max_disp: int,
                               tw: int = DEF_TW, rb: int = DEF_RB,
                               center=None, window: int = 0):
    """Backward from rows-form features (B,H,C,W); grads in rows-form."""
    B, H, C, W = ref.shape
    dp = max_disp - 1
    Hp = _ceil_to(max(H, rb), rb)
    Wp = _ceil_to(max(W, tw), tw)

    refm = ref_mask != 0
    w_map = jnp.where(refm & (sum_sim != 0),
                      g / jnp.where(sum_sim != 0, sum_sim, 1.0), 0.0)
    f32 = jnp.float32

    refr = _pad4(_cast_feat(ref), Hp, Wp)
    tarr_l = _pad4(_cast_feat(tar), Hp, Wp + dp, left=dp)
    tmr_l = _pad4(tar_mask.astype(f32), Hp, Wp + dp, left=dp)
    mcr = _pad4(max_cost.astype(f32), Hp, Wp)
    outr = _pad4(out.astype(f32), Hp, Wp)
    wr = _pad4(w_map.astype(f32), Hp, Wp)

    grid = (B, Hp // rb, Wp // tw)
    row_spec = pl.BlockSpec((1, rb, tw), lambda b, r, t: (b, r, t),
                            memory_space=pltpu.VMEM)
    feat_spec = pl.BlockSpec((1, rb, C, tw), lambda b, r, t: (b, r, 0, t),
                             memory_space=pltpu.VMEM)
    full_feat = pl.BlockSpec((1, rb, C, Wp + dp), lambda b, r, t: (b, r, 0, 0),
                             memory_space=pltpu.VMEM)
    full_row = pl.BlockSpec((1, rb, Wp + dp), lambda b, r, t: (b, r, 0),
                            memory_space=pltpu.VMEM)

    dref_specs = [feat_spec, full_feat, full_row, row_spec, row_spec,
                  row_spec]
    dref_ops = [refr, tarr_l, tmr_l, mcr, outr, wr]
    if window > 0:
        dref_specs.append(row_spec)
        dref_ops.append(_pad4(center.astype(f32), Hp, Wp))
    gref = pl.pallas_call(
        functools.partial(_dref_kernel, max_disp=max_disp, tw=tw,
                          window=window),
        grid=grid,
        in_specs=dref_specs,
        out_specs=feat_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, C, Wp), jnp.float32),
        interpret=_interpret(),
    )(*dref_ops)

    # dTar: query-side arrays right-padded by dp
    refr_r = _pad4(_cast_feat(ref), Hp, Wp + dp)
    mcr_r = _pad4(max_cost.astype(f32), Hp, Wp + dp)
    outr_r = _pad4(out.astype(f32), Hp, Wp + dp)
    wr_r = _pad4(w_map.astype(f32), Hp, Wp + dp)
    tarr = _pad4(_cast_feat(tar), Hp, Wp)

    dtar_specs = [feat_spec, row_spec, full_feat, full_row, full_row,
                  full_row]
    dtar_ops = [tarr, _pad4(tar_mask.astype(f32), Hp, Wp), refr_r, mcr_r,
                outr_r, wr_r]
    if window > 0:
        dtar_specs.append(full_row)
        dtar_ops.append(_pad4(center.astype(f32), Hp, Wp + dp))
    gtar = pl.pallas_call(
        functools.partial(_dtar_kernel, max_disp=max_disp, tw=tw,
                          window=window),
        grid=grid,
        in_specs=dtar_specs,
        out_specs=feat_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, C, Wp), jnp.float32),
        interpret=_interpret(),
    )(*dtar_ops)

    def unpack(x):
        return x[:, :H, :, :W]
    gtar = unpack(gtar) * (tar_mask != 0)[:, :, None, :]
    return unpack(gref).astype(ref.dtype), gtar.astype(tar.dtype)


def spamat_backward_rows(ref, tar, ref_mask, tar_mask, out, sum_sim,
                         max_cost, g, max_disp: int, center=None,
                         window: int = 0):
    """Rows-form backward: ref/tar and the returned grads are (B,H,C,W)."""
    if window <= 0:
        center, window = jnp.zeros((1, 1, 1), jnp.float32), 0
    return _spamat_backward_rows_impl(ref, tar, ref_mask, tar_mask, out,
                                      sum_sim, max_cost, g, max_disp,
                                      center=center, window=window)


def spamat_backward(ref, tar, ref_mask, tar_mask, out, sum_sim, max_cost, g,
                    max_disp: int):
    """NHWC wrapper over the rows-form backward."""
    gref, gtar = _spamat_backward_rows_impl(
        ref.transpose(0, 1, 3, 2), tar.transpose(0, 1, 3, 2), ref_mask,
        tar_mask, out, sum_sim, max_cost, g, max_disp)
    return gref.transpose(0, 1, 3, 2), gtar.transpose(0, 1, 3, 2)
