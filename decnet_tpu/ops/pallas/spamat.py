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


def _rows(x):
    """(B,H,W,C) -> (B*H, C, W); masks (B,H,W) -> (B*H, W) f32.

    bf16 features pass through uncast (the kernels accumulate scores in f32
    via preferred_element_type); anything else is cast to f32."""
    if x.ndim == 4:
        B, H, W, C = x.shape
        if x.dtype not in (jnp.bfloat16, jnp.float32):
            x = x.astype(jnp.float32)
        return x.reshape(B * H, W, C).transpose(0, 2, 1)
    B, H, W = x.shape
    return x.astype(jnp.float32).reshape(B * H, W)


def _pad_rows(x, r_to, w_to, w_axis, left=0):
    """Pad rows to r_to and the W axis to total width w_to (left zeros for the
    disparity band, remainder on the right)."""
    pads = [(0, 0)] * x.ndim
    pads[0] = (0, r_to - x.shape[0])
    pads[w_axis] = (left, w_to - left - x.shape[w_axis])
    return jnp.pad(x, pads)


# ---------------------------------------------------------------------------
# Forward moments kernel
# ---------------------------------------------------------------------------

def _moments_kernel(ref_ref, rm_ref, tar_ref, tm_ref,
                    m_ref, se_ref, sed_ref, sed2_ref,
                    *, max_disp: int, tw: int):
    # Sparsity: the reference CUDA kernel early-exits per masked-out query
    # (SM_kernel.cu:32-33); the TPU analog is per-PROGRAM — detail masks are
    # spatially clustered, so whole (rows x query-tile) blocks are empty and
    # skip all compute.  Every consumer gates the moment maps by ref_mask
    # (ops/matching.py), so zero-filled outputs for an empty tile are exact.
    any_query = jnp.sum(rm_ref[...]) > 0
    t = pl.program_id(1)

    @pl.when(any_query)
    def _compute():
        dp = max_disp - 1
        kw = tw + dp
        q = ref_ref[...]                       # (RB, C, TW)
        k = tar_ref[:, :, pl.ds(t * tw, kw)]   # (RB, C, KW) from full row
        km = tm_ref[:, pl.ds(t * tw, kw)]      # (RB, KW)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=_prec(q.dtype))  # (RB,TW,KW)
        qi = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (tw, kw), 1)
        d = qi - kj + dp                        # disparity per (query, key)
        band = (d >= 0) & (d < max_disp)
        valid = band[None] & (km[:, None, :] > 0)

        s2 = jnp.where(valid, s, _NEG)
        m = jnp.max(s2, axis=2)
        m_c = jnp.maximum(m, EPS)           # SM_kernel.cu:45 max-cost floor
        e = jnp.where(valid, jnp.exp(s2 - m_c[:, :, None]), 0.0)
        d_f = d.astype(jnp.float32)[None]
        m_ref[...] = m_c
        se_ref[...] = jnp.sum(e, axis=2)
        sed_ref[...] = jnp.sum(e * d_f, axis=2)
        sed2_ref[...] = jnp.sum(e * d_f * d_f, axis=2)

    @pl.when(jnp.logical_not(any_query))
    def _skip():
        zero = jnp.zeros(m_ref.shape, m_ref.dtype)
        m_ref[...] = zero
        se_ref[...] = zero
        sed_ref[...] = zero
        sed2_ref[...] = zero


@functools.partial(jax.jit, static_argnames=("max_disp", "tw", "rb"))
def moments(ref, tar, ref_mask, tar_mask, max_disp: int,
            tw: int = DEF_TW, rb: int = DEF_RB):
    """Banded online-softmax moments (m, se, sed, sed2), each (B,H,W) f32."""
    B, H, W, C = ref.shape
    R = B * H
    dp = max_disp - 1
    Rp = _ceil_to(max(R, rb), rb)
    Wp = _ceil_to(max(W, tw), tw)

    refr = _pad_rows(_rows(ref), Rp, Wp, 2)
    rmr = _pad_rows(_rows(ref_mask), Rp, Wp, 1)
    tarr = _pad_rows(_rows(tar), Rp, Wp + dp, 2, left=dp)
    tmr = _pad_rows(_rows(tar_mask), Rp, Wp + dp, 1, left=dp)

    grid = (Rp // rb, Wp // tw)
    out_spec = pl.BlockSpec((rb, tw), lambda r, t: (r, t),
                            memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((Rp, Wp), jnp.float32)
    m, se, sed, sed2 = pl.pallas_call(
        functools.partial(_moments_kernel, max_disp=max_disp, tw=tw),
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
        interpret=_interpret(),
    )(refr, rmr, tarr, tmr)

    def unpack(x):
        return x[:R, :W].reshape(B, H, W)
    return unpack(m), unpack(se), unpack(sed), unpack(sed2)


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
                 gref_ref, *, max_disp: int, tw: int):
    """grad_ref[q] = (g/sum_sim)[q] * sum_k e(q,k) * (d - out[q]) * tar[k]
    (SM_kernel.cu:143-195). w_ref holds g/sum_sim pre-gated by ref_mask."""
    # Tile skip (cf. the forward kernel): w is g/sum_sim pre-gated by
    # ref_mask, so an all-zero w block contributes nothing.
    w = w_ref[...]
    any_query = jnp.sum(jnp.abs(w)) > 0
    t = pl.program_id(1)

    @pl.when(any_query)
    def _compute():
        dp = max_disp - 1
        kw = tw + dp
        q = ref_ref[...]
        k = tar_ref[:, :, pl.ds(t * tw, kw)]
        km = tm_ref[:, pl.ds(t * tw, kw)]
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
        e = jnp.where(valid, jnp.exp(s - mc_ref[...][:, :, None]), 0.0)
        wq = e * (d.astype(jnp.float32)[None] - out_ref[...][:, :, None])
        wq = wq * w[:, :, None]
        # (RB,C,KW) x (RB,TW,KW) -> (RB,C,TW)
        gref_ref[...] = jax.lax.dot_general(
            k, wq.astype(k.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_prec(k.dtype))

    @pl.when(jnp.logical_not(any_query))
    def _skip():
        gref_ref[...] = jnp.zeros(gref_ref.shape, gref_ref.dtype)


def _dtar_kernel(tar_ref, tm_ref, ref_ref, mc_ref, out_ref, w_ref,
                 gtar_ref, *, max_disp: int, tw: int):
    """grad_tar[k] = sum_q e(q,k)*(d-out[q])*(g/sum_sim)[q]*ref[q]
    over q in [k, k+max_disp) (SM_kernel.cu:300-355). Query-side arrays are
    right-padded by max_disp-1; w_ref is g/sum_sim gated by ref_mask."""
    t = pl.program_id(1)
    dp = max_disp - 1
    qw = tw + dp
    wq = w_ref[:, pl.ds(t * tw, qw)]
    tm = tm_ref[...]
    # Tile skip: no masked key in this tile, or no contributing query in the
    # window (wq is g/sum_sim gated by ref_mask). gtar is multiplied by
    # tar_mask by the caller, so zeros are exact either way.
    any_work = (jnp.sum(tm) > 0) & (jnp.sum(jnp.abs(wq)) > 0)

    @pl.when(any_work)
    def _compute():
        k = tar_ref[...]                      # (RB, C, TW) keys (real coords)
        qs = ref_ref[:, :, pl.ds(t * tw, qw)]     # queries window
        mc = mc_ref[:, pl.ds(t * tw, qw)]
        ot = out_ref[:, pl.ds(t * tw, qw)]
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
        e = jnp.where(valid, jnp.exp(s - mc[:, None, :]), 0.0)
        wk = e * (d.astype(jnp.float32)[None] - ot[:, None, :]) \
            * wq[:, None, :]
        gtar_ref[...] = jax.lax.dot_general(
            qs, wk.astype(qs.dtype), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_prec(qs.dtype))

    @pl.when(jnp.logical_not(any_work))
    def _skip():
        gtar_ref[...] = jnp.zeros(gtar_ref.shape, gtar_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "tw", "rb"))
def _spamat_backward_impl(ref, tar, ref_mask, tar_mask, out, sum_sim,
                          max_cost, g, max_disp: int,
                          tw: int = DEF_TW, rb: int = DEF_RB):
    B, H, W, C = ref.shape
    R = B * H
    dp = max_disp - 1
    Rp = _ceil_to(max(R, rb), rb)
    Wp = _ceil_to(max(W, tw), tw)

    refm = ref_mask != 0
    w_map = jnp.where(refm & (sum_sim != 0),
                      g / jnp.where(sum_sim != 0, sum_sim, 1.0), 0.0)

    refr = _pad_rows(_rows(ref), Rp, Wp, 2)
    tarr_l = _pad_rows(_rows(tar), Rp, Wp + dp, 2, left=dp)
    tmr_l = _pad_rows(_rows(tar_mask), Rp, Wp + dp, 1, left=dp)
    mcr = _pad_rows(_rows(max_cost), Rp, Wp, 1)
    outr = _pad_rows(_rows(out), Rp, Wp, 1)
    wr = _pad_rows(_rows(w_map), Rp, Wp, 1)

    grid = (Rp // rb, Wp // tw)
    row_spec = pl.BlockSpec((rb, tw), lambda r, t: (r, t),
                            memory_space=pltpu.VMEM)
    full_feat_l = pl.BlockSpec((rb, C, Wp + dp), lambda r, t: (r, 0, 0),
                               memory_space=pltpu.VMEM)
    full_row_l = pl.BlockSpec((rb, Wp + dp), lambda r, t: (r, 0),
                              memory_space=pltpu.VMEM)

    gref = pl.pallas_call(
        functools.partial(_dref_kernel, max_disp=max_disp, tw=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, C, tw), lambda r, t: (r, 0, t),
                         memory_space=pltpu.VMEM),
            full_feat_l, full_row_l, row_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((rb, C, tw), lambda r, t: (r, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C, Wp), jnp.float32),
        interpret=_interpret(),
    )(refr, tarr_l, tmr_l, mcr, outr, wr)

    # dTar: query-side arrays right-padded by dp
    refr_r = _pad_rows(_rows(ref), Rp, Wp + dp, 2)
    mcr_r = _pad_rows(_rows(max_cost), Rp, Wp + dp, 1)
    outr_r = _pad_rows(_rows(out), Rp, Wp + dp, 1)
    wr_r = _pad_rows(_rows(w_map), Rp, Wp + dp, 1)
    tarr = _pad_rows(_rows(tar), Rp, Wp, 2)

    full_feat_r = pl.BlockSpec((rb, C, Wp + dp), lambda r, t: (r, 0, 0),
                               memory_space=pltpu.VMEM)
    full_row_r = pl.BlockSpec((rb, Wp + dp), lambda r, t: (r, 0),
                              memory_space=pltpu.VMEM)
    gtar = pl.pallas_call(
        functools.partial(_dtar_kernel, max_disp=max_disp, tw=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rb, C, tw), lambda r, t: (r, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, tw), lambda r, t: (r, t),
                         memory_space=pltpu.VMEM),
            full_feat_r, full_row_r, full_row_r, full_row_r,
        ],
        out_specs=pl.BlockSpec((rb, C, tw), lambda r, t: (r, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, C, Wp), jnp.float32),
        interpret=_interpret(),
    )(tarr, _pad_rows(_rows(tar_mask), Rp, Wp, 1), refr_r, mcr_r, outr_r,
      wr_r)

    def unpack(x):
        return x[:R].transpose(0, 2, 1)[:, :W].reshape(B, H, W, C)
    gtar = unpack(gtar) * (tar_mask != 0)[..., None]
    return unpack(gref).astype(ref.dtype), gtar.astype(tar.dtype)


def spamat_backward(ref, tar, ref_mask, tar_mask, out, sum_sim, max_cost, g,
                    max_disp: int):
    return _spamat_backward_impl(ref, tar, ref_mask, tar_mask, out, sum_sim,
                                 max_cost, g, max_disp)
