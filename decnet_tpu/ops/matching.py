"""Masked sparse stereo matching & variance — the DecNet custom ops, TPU-style.

The reference implements these as hand-written CUDA kernels
(modules/SparseMatching/src/SM_kernel.cu, modules/SparseVar/src/SV_kernel.cu):
for each left pixel with ``ref_mask != 0`` scan disparities ``d in
[0, min(max_disp, w+1))``, skip right pixels with ``tar_mask == 0``, score by a
feature dot product, and take a softmax-weighted expectation of ``d`` (SpaMat)
or of ``(d - disparity)^2`` (SpaVar), using a two-pass online softmax.

This is exactly banded row-wise cross-attention: left pixels are queries,
right pixels in the trailing ``max_disp`` window are keys, and the "values"
are the disparity offsets themselves.  The TPU build therefore provides:

* an XLA implementation (`impl='xla'`) — a `lax.scan` over disparity with an
  online max/sum carry (the same decomposition as SM_kernel.cu:100-124), so
  the (B,S,H,W) score volume is never materialised;
* a Pallas flash-attention-style kernel (`impl='pallas'`,
  decnet_tpu/ops/pallas/spamat.py) for the hot path;
* `jax.custom_vjp` rules that reproduce the reference's analytic backward
  (SM_kernel.cu:143-355, SV_kernel.cu:142-325).

Numerics parity: max-cost is clamped to >= 1e-6 (SM_kernel.cu:45) and both
softmax accumulators carry a +1e-6 bias (SM_kernel.cu:100), so a masked-in
left pixel with *no* valid right pixel outputs exactly 1.0.

Layout: feats (B,H,W,C) float32/bf16, masks (B,H,W) (0 = inactive).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

EPS = 1e-6
_NEG = -3.0e38  # effectively -inf for f32 without nan hazards


def _pad_tar(tar: jax.Array, max_disp: int) -> jax.Array:
    """Left-pad the W axis with max_disp-1 zeros so shift-by-d is a slice."""
    pad = [(0, 0)] * tar.ndim
    pad[2] = (max_disp - 1, 0)
    return jnp.pad(tar, pad)


def _shift_right(padded: jax.Array, d: jax.Array, W: int, max_disp: int) -> jax.Array:
    """tar[w-d] with zeros for w < d, from a pre-padded array."""
    start = [0] * padded.ndim
    start[2] = max_disp - 1 - d
    sizes = list(padded.shape)
    sizes[2] = W
    return lax.dynamic_slice(padded, start, sizes)


def _shift_left(x: jax.Array, d: jax.Array, max_disp: int) -> jax.Array:
    """x[w+d] with zeros for w+d >= W (scatter side of the band)."""
    pad = [(0, 0)] * x.ndim
    pad[2] = (0, max_disp - 1)
    xp = jnp.pad(x, pad)
    start = [0] * x.ndim
    start[2] = d
    return lax.dynamic_slice(xp, start, list(x.shape))


def matching_moments(ref, tar, ref_mask, tar_mask, max_disp: int,
                     center=None, window: int = 0):
    """Online-softmax moments over the disparity band.

    Returns (m, se, sed, sed2), each (B,H,W) f32:
      m    = max over valid d of score(d)        (-inf when no valid d)
      se   = sum_d exp(score - max(m, EPS))
      sed  = sum_d exp(...) * d
      sed2 = sum_d exp(...) * d^2
    The EPS clamp on the max matches SM_kernel.cu:45; accumulator biases are
    added by the callers.

    With `center` (B,H,W) and `window > 0`, candidates are additionally
    gated to |d - center| <= window — prior-windowed matching around a
    coarse disparity estimate (the adaptive-sampling idea of
    submodule.py:398-411 applied to the sparse op; the reference always
    scans the full band).
    """
    B, H, W, C = ref.shape
    ref = ref.astype(jnp.float32)
    tarp = _pad_tar(tar.astype(jnp.float32), max_disp)
    tmaskp = _pad_tar((tar_mask != 0).astype(jnp.float32), max_disp)
    if window > 0:
        center = center.astype(jnp.float32)

    def step(carry, d):
        m, se, sed, sed2 = carry
        tar_d = _shift_right(tarp, d, W, max_disp)
        ok = _shift_right(tmaskp, d, W, max_disp) > 0
        d_f = d.astype(jnp.float32)
        if window > 0:
            ok = ok & (jnp.abs(d_f - center) <= window)
        s = jnp.sum(ref * tar_d, axis=-1)
        s = jnp.where(ok, s, _NEG)
        m_new = jnp.maximum(m, s)
        scale = jnp.exp(m - m_new)        # exp(-inf - finite) = 0: safe
        e = jnp.where(ok, jnp.exp(s - m_new), 0.0)
        return (m_new, se * scale + e, sed * scale + e * d_f,
                sed2 * scale + e * d_f * d_f), None

    z = jnp.zeros((B, H, W), jnp.float32)
    init = (jnp.full((B, H, W), _NEG, jnp.float32), z, z, z)
    (m, se, sed, sed2), _ = lax.scan(step, init, jnp.arange(max_disp))
    m_fin = jnp.maximum(m, EPS)
    r = jnp.exp(m - m_fin)                # rescale to the clamped max
    return m_fin, se * r, sed * r, sed2 * r


def candidate_availability(tar_mask: jax.Array, max_disp: int) -> jax.Array:
    """1.0 where the disparity band holds >= 1 valid right-view candidate.

    For left pixel x the kernels scan d in [0, min(max_disp, x+1)), i.e.
    right pixels x-d with tar_mask != 0 (SM_kernel.cu:90-99).  A masked-in
    left pixel whose whole band is masked out contributes nothing and
    outputs exactly 1.0 by the reference's eps semantics (SM_kernel.cu:45,
    :100-124) — a sentinel, not a match.  This trailing-window max over
    tar_mask computes exactly that availability bit, so losses/metrics can
    separate real matches from the sentinel pixels.

    tar_mask (B,H,W) any dtype; returns (B,H,W) float32 in {0,1}.
    """
    m = (tar_mask != 0).astype(jnp.float32)
    return lax.reduce_window(
        m, 0.0, lax.max,
        window_dimensions=(1, 1, max_disp),
        window_strides=(1, 1, 1),
        padding=((0, 0), (0, 0), (max_disp - 1, 0)))


def candidate_availability_windowed(tar_mask: jax.Array, max_disp: int,
                                    center: jax.Array,
                                    window: int) -> jax.Array:
    """candidate_availability for the prior-windowed scan: 1.0 where some
    d with |d - center| <= window AND 0 <= d < min(max_disp, x+1) has
    tar_mask[x-d] != 0.  Exact (per-offset gather with per-pixel band
    checks); cost is 2*window+1 gathers."""
    m = (tar_mask != 0).astype(jnp.float32)
    B, H, W = m.shape
    xs = jnp.arange(W)[None, None, :]
    cf = center.astype(jnp.float32)
    # integer d range of the scan's gate |d - center| <= window intersected
    # with the band 0 <= d <= min(max_disp-1, x); interval emptiness is then
    # a prefix-sum count over tar_mask — 1 cumsum + 2 gathers total (a
    # per-offset gather loop here cost ~40% of the train step)
    d_lo = jnp.maximum(jnp.ceil(cf - window).astype(jnp.int32), 0)
    d_hi = jnp.minimum(jnp.floor(cf + window).astype(jnp.int32),
                       jnp.minimum(max_disp - 1, xs))
    nonempty = d_hi >= d_lo
    p_hi = jnp.clip(xs - d_lo, 0, W - 1)          # largest source column
    p_lo = xs - d_hi                              # smallest source column
    S = jnp.cumsum(m, axis=2)
    cnt_hi = jnp.take_along_axis(S, p_hi, axis=2)
    cnt_lo = jnp.where(p_lo > 0,
                       jnp.take_along_axis(S, jnp.clip(p_lo - 1, 0, W - 1),
                                           axis=2), 0.0)
    return (nonempty & (cnt_hi - cnt_lo > 0.5)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# sparse_matching — SpaMat
# ---------------------------------------------------------------------------

def _spamat_fwd_xla(ref, tar, ref_mask, tar_mask, max_disp: int):
    m, se, sed, _ = matching_moments(ref, tar, ref_mask, tar_mask, max_disp)
    refm = ref_mask != 0
    out = jnp.where(refm, (EPS + sed) / (EPS + se), 0.0)
    sum_sim = jnp.where(refm, EPS + se, 0.0)
    max_cost = jnp.where(refm, m, 0.0)
    return out, sum_sim, max_cost


def _spamat_bwd_xla(ref, tar, ref_mask, tar_mask, out, sum_sim, max_cost, g,
                    max_disp: int, center=None, window: int = 0):
    """Analytic grads, parity with SM_kernel.cu:143-195 (ref) / :300-355 (tar)."""
    B, H, W, C = ref.shape
    ref32 = ref.astype(jnp.float32)
    tarp = _pad_tar(tar.astype(jnp.float32), max_disp)
    tmaskp = _pad_tar((tar_mask != 0).astype(jnp.float32), max_disp)
    refm = ref_mask != 0
    inv_ss = jnp.where(refm, 1.0 / jnp.where(refm, sum_sim, 1.0), 0.0)
    g_over_ss = g * inv_ss
    if window > 0:
        center = center.astype(jnp.float32)

    def step(carry, d):
        acc_ref, acc_tar = carry
        tar_d = _shift_right(tarp, d, W, max_disp)
        ok = _shift_right(tmaskp, d, W, max_disp) > 0
        d_f = d.astype(jnp.float32)
        if window > 0:
            ok = ok & (jnp.abs(d_f - center) <= window)
        s = jnp.sum(ref32 * tar_d, axis=-1)
        e = jnp.where(ok & refm, jnp.exp(s - max_cost), 0.0)
        wq = e * (d_f - out)                       # query-side weight
        acc_ref = acc_ref + (wq * g_over_ss)[..., None] * tar_d
        # scatter to key side: grad_tar[w] += (g*e*(d-out)/ss)[w+d] * ref[w+d]
        q_term = (wq * g_over_ss)[..., None] * ref32
        acc_tar = acc_tar + _shift_left(q_term, d, max_disp)
        return (acc_ref, acc_tar), None

    z = jnp.zeros((B, H, W, C), jnp.float32)
    (gref, gtar), _ = lax.scan(step, (z, z), jnp.arange(max_disp))
    gref = gref * refm[..., None]
    gtar = gtar * (tar_mask != 0)[..., None]
    return gref.astype(ref.dtype), gtar.astype(tar.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sparse_matching(ref, tar, ref_mask, tar_mask, max_disp: int,
                    impl: str = "auto"):
    """Masked softargmin disparity from sparse matching (SpaMat).

    Args: ref/tar (B,H,W,C) features, ref_mask/tar_mask (B,H,W), static
    max_disp. Returns the (B,H,W) expected-disparity map (0 where
    ref_mask == 0). Differentiable w.r.t. ref and tar.
    """
    out, _, _ = _spamat_dispatch(ref, tar, ref_mask, tar_mask, max_disp, impl)
    return out


def _spamat_dispatch(ref, tar, ref_mask, tar_mask, max_disp, impl):
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from decnet_tpu.ops.pallas import spamat as _k
        return _k.spamat_forward(ref, tar, ref_mask, tar_mask, max_disp)
    return _spamat_fwd_xla(ref, tar, ref_mask, tar_mask, max_disp)


def _spamat_vjp_fwd(ref, tar, ref_mask, tar_mask, max_disp, impl):
    out, sum_sim, max_cost = _spamat_dispatch(ref, tar, ref_mask, tar_mask,
                                              max_disp, impl)
    return out, (ref, tar, ref_mask, tar_mask, out, sum_sim, max_cost)


def _spamat_vjp_bwd(max_disp, impl, res, g):
    ref, tar, ref_mask, tar_mask, out, sum_sim, max_cost = res
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from decnet_tpu.ops.pallas import spamat as _k
        gref, gtar = _k.spamat_backward(ref, tar, ref_mask, tar_mask, out,
                                        sum_sim, max_cost, g, max_disp)
    else:
        gref, gtar = _spamat_bwd_xla(ref, tar, ref_mask, tar_mask, out,
                                     sum_sim, max_cost, g, max_disp)
    return gref, gtar, jnp.zeros_like(ref_mask), jnp.zeros_like(tar_mask)


sparse_matching.defvjp(_spamat_vjp_fwd, _spamat_vjp_bwd)


# ---------------------------------------------------------------------------
# sparse_var — SpaVar
# ---------------------------------------------------------------------------

def _spavar_fwd_xla(ref, tar, ref_mask, tar_mask, disparity, max_disp: int):
    m, se, sed, sed2 = matching_moments(ref, tar, ref_mask, tar_mask, max_disp)
    refm = ref_mask != 0
    disparity = disparity.astype(jnp.float32)
    svar = sed2 - 2.0 * disparity * sed + disparity * disparity * se
    out = jnp.where(refm, (EPS + svar) / (EPS + se), 0.0)
    sum_sim = jnp.where(refm, EPS + se, 0.0)
    max_cost = jnp.where(refm, m, 0.0)
    return out, sum_sim, max_cost, sed, se


def _spavar_bwd_feats_xla(ref, tar, ref_mask, tar_mask, disparity, out,
                          sum_sim, max_cost, g, max_disp: int):
    """SpaVar feature gradients (SV_kernel.cu:142-195 ref / :215-271 tar).

    Same banded scan as the SpaMat backward, with the query-side weight
    ``e^{cost-max} * ((d - disparity)^2 - out)`` instead of ``e*(d - out)``.
    Latent upstream (the shipped model calls SpaVar under torch.no_grad);
    exposed here behind sparse_var(..., full_grad=True).
    """
    B, H, W, C = ref.shape
    ref32 = ref.astype(jnp.float32)
    tarp = _pad_tar(tar.astype(jnp.float32), max_disp)
    tmaskp = _pad_tar((tar_mask != 0).astype(jnp.float32), max_disp)
    refm = ref_mask != 0
    disparity = disparity.astype(jnp.float32)
    inv_ss = jnp.where(refm, 1.0 / jnp.where(refm, sum_sim, 1.0), 0.0)
    g_over_ss = g * inv_ss

    def step(carry, d):
        acc_ref, acc_tar = carry
        tar_d = _shift_right(tarp, d, W, max_disp)
        ok = _shift_right(tmaskp, d, W, max_disp) > 0
        s = jnp.sum(ref32 * tar_d, axis=-1)
        e = jnp.where(ok & refm, jnp.exp(s - max_cost), 0.0)
        d_f = d.astype(jnp.float32)
        wq = e * ((d_f - disparity) ** 2 - out)
        acc_ref = acc_ref + (wq * g_over_ss)[..., None] * tar_d
        q_term = (wq * g_over_ss)[..., None] * ref32
        acc_tar = acc_tar + _shift_left(q_term, d, max_disp)
        return (acc_ref, acc_tar), None

    z = jnp.zeros((B, H, W, C), jnp.float32)
    (gref, gtar), _ = lax.scan(step, (z, z), jnp.arange(max_disp))
    gref = gref * refm[..., None]
    gtar = gtar * (tar_mask != 0)[..., None]
    return gref.astype(ref.dtype), gtar.astype(tar.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def sparse_var(ref, tar, ref_mask, tar_mask, disparity, max_disp: int,
               impl: str = "auto", full_grad: bool = False):
    """Softmax-weighted variance of the disparity band around `disparity`
    (SpaVar, SV_kernel.cu:76-124). Returns (B,H,W); 0 where ref_mask == 0.

    The shipped model evaluates this under stop_gradient
    (SparseDenseNetRefinementMask.py:188-192), so by default the feature
    gradients are zeroed (torch.no_grad parity) and only the disparity
    gradient (SV_kernel.cu:275-325) flows.  `full_grad=True` additionally
    enables the latent ref/tar feature gradients (SV_kernel.cu:142-271).
    """
    out, *_ = _spavar_dispatch(ref, tar, ref_mask, tar_mask, disparity,
                               max_disp, impl)
    return out


def _spavar_dispatch(ref, tar, ref_mask, tar_mask, disparity, max_disp, impl):
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from decnet_tpu.ops.pallas import spamat as _k
        return _k.spavar_forward(ref, tar, ref_mask, tar_mask, disparity,
                                 max_disp)
    return _spavar_fwd_xla(ref, tar, ref_mask, tar_mask, disparity, max_disp)


def _spavar_vjp_fwd(ref, tar, ref_mask, tar_mask, disparity, max_disp, impl,
                    full_grad):
    out, sum_sim, max_cost, sed, se = _spavar_dispatch(
        ref, tar, ref_mask, tar_mask, disparity, max_disp, impl)
    return out, (ref, tar, ref_mask, tar_mask, disparity, out, sum_sim,
                 max_cost, sed, se)


def _spavar_vjp_bwd(max_disp, impl, full_grad, res, g):
    (ref, tar, ref_mask, tar_mask, disparity, out, sum_sim, max_cost,
     sed, se) = res
    refm = ref_mask != 0
    inv_ss = jnp.where(refm, 1.0 / jnp.where(refm, sum_sim, 1.0), 0.0)
    # SV_kernel.cu:275-325: grad_disp = -2 g * sum_d e*(d-disp) / sum_sim
    acc = sed - disparity.astype(jnp.float32) * se
    gdisp = (-2.0 * g * acc * inv_ss).astype(disparity.dtype)
    if full_grad:
        gref, gtar = _spavar_bwd_feats_xla(ref, tar, ref_mask, tar_mask,
                                           disparity, out, sum_sim, max_cost,
                                           g, max_disp)
    else:
        # Feature grads are zeroed by default, as torch's no_grad context
        # does in the shipped model.
        gref, gtar = jnp.zeros_like(ref), jnp.zeros_like(tar)
    return (gref, gtar, jnp.zeros_like(ref_mask), jnp.zeros_like(tar_mask),
            gdisp)


sparse_var.defvjp(_spavar_vjp_fwd, _spavar_vjp_bwd)


# ---------------------------------------------------------------------------
# Fused matching + variance — one banded-softmax pass for both
# ---------------------------------------------------------------------------

def _fused_moments(ref, tar, ref_mask, tar_mask, max_disp, impl):
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from decnet_tpu.ops.pallas import spamat as _k
        return _k.moments(ref, tar, ref_mask, tar_mask, max_disp)
    return matching_moments(ref, tar, ref_mask, tar_mask, max_disp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sparse_matching_with_var(ref, tar, ref_mask, tar_mask, max_disp: int,
                             impl: str = "auto"):
    """(expected disparity, variance) from ONE banded-softmax pass.

    The model always evaluates SpaVar at disparity == the SpaMat output under
    stop_gradient (SparseDenseNetRefinementMask.py:183-192); by the moment
    identity sum e*(d-out)^2 = sed2 - 2*out*sed + out^2*se this equals the
    two-kernel reference result exactly while halving the matching work.
    Gradients flow to ref/tar through the expected disparity only (the
    variance is treated as stop_gradient, matching the reference's no_grad).
    """
    out, var, _, _, _ = _fused_forward(ref, tar, ref_mask, tar_mask,
                                       max_disp, impl)
    return out, var


def _fused_forward(ref, tar, ref_mask, tar_mask, max_disp, impl):
    m, se, sed, sed2 = _fused_moments(ref, tar, ref_mask, tar_mask,
                                      max_disp, impl)
    refm = ref_mask != 0
    out = jnp.where(refm, (EPS + sed) / (EPS + se), 0.0)
    svar = sed2 - 2.0 * out * sed + out * out * se
    var = jnp.where(refm, (EPS + svar) / (EPS + se), 0.0)
    sum_sim = jnp.where(refm, EPS + se, 0.0)
    max_cost = jnp.where(refm, m, 0.0)
    return out, var, sum_sim, max_cost, refm


def _fused_vjp_fwd(ref, tar, ref_mask, tar_mask, max_disp, impl):
    out, var, sum_sim, max_cost, _ = _fused_forward(
        ref, tar, ref_mask, tar_mask, max_disp, impl)
    return (out, var), (ref, tar, ref_mask, tar_mask, out, sum_sim, max_cost)


def _fused_vjp_bwd(max_disp, impl, res, gs):
    g_out, _ = gs  # variance is stop_gradient by contract
    ref, tar, ref_mask, tar_mask, out, sum_sim, max_cost = res
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from decnet_tpu.ops.pallas import spamat as _k
        gref, gtar = _k.spamat_backward(ref, tar, ref_mask, tar_mask, out,
                                        sum_sim, max_cost, g_out, max_disp)
    else:
        gref, gtar = _spamat_bwd_xla(ref, tar, ref_mask, tar_mask, out,
                                     sum_sim, max_cost, g_out, max_disp)
    return gref, gtar, jnp.zeros_like(ref_mask), jnp.zeros_like(tar_mask)


sparse_matching_with_var.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


# ---------------------------------------------------------------------------
# Rows-form fused matching — features already in the kernels' native layout
# ---------------------------------------------------------------------------

def _rows_to_nhwc(x):
    """(B,H,C,W) -> (B,H,W,C)."""
    return x.transpose(0, 1, 3, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def sparse_matching_with_var_rows(ref_rows, tar_rows, ref_mask, tar_mask,
                                  max_disp: int, impl: str = "auto"):
    """sparse_matching_with_var with features in rows-form (B,H,C,W).

    Rows-form is the Pallas kernels' native layout — the caller converts the
    extractor's s2d output once (layers.s2d_to_rows) instead of paying an
    NHWC->NCW transpose inside every kernel call.  Semantics are identical to
    sparse_matching_with_var on the transposed inputs."""
    (out, var), _ = _fused_rows_vjp_fwd(ref_rows, tar_rows, ref_mask,
                                        tar_mask, max_disp, impl)
    return out, var


def _fused_rows_moments(ref_rows, tar_rows, ref_mask, tar_mask, max_disp,
                        impl):
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from decnet_tpu.ops.pallas import spamat as _k
        return _k.moments_rows(ref_rows, tar_rows, ref_mask, tar_mask,
                               max_disp)
    return matching_moments(_rows_to_nhwc(ref_rows), _rows_to_nhwc(tar_rows),
                            ref_mask, tar_mask, max_disp)


def _fused_rows_vjp_fwd(ref_rows, tar_rows, ref_mask, tar_mask, max_disp,
                        impl):
    m, se, sed, sed2 = _fused_rows_moments(ref_rows, tar_rows, ref_mask,
                                           tar_mask, max_disp, impl)
    refm = ref_mask != 0
    out = jnp.where(refm, (EPS + sed) / (EPS + se), 0.0)
    svar = sed2 - 2.0 * out * sed + out * out * se
    var = jnp.where(refm, (EPS + svar) / (EPS + se), 0.0)
    sum_sim = jnp.where(refm, EPS + se, 0.0)
    max_cost = jnp.where(refm, m, 0.0)
    return (out, var), (ref_rows, tar_rows, ref_mask, tar_mask, out,
                        sum_sim, max_cost)


def _fused_rows_vjp_bwd(max_disp, impl, res, gs):
    g_out, _ = gs  # variance is stop_gradient by contract
    ref_rows, tar_rows, ref_mask, tar_mask, out, sum_sim, max_cost = res
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from decnet_tpu.ops.pallas import spamat as _k
        gref, gtar = _k.spamat_backward_rows(
            ref_rows, tar_rows, ref_mask, tar_mask, out, sum_sim, max_cost,
            g_out, max_disp)
    else:
        gref, gtar = _spamat_bwd_xla(
            _rows_to_nhwc(ref_rows), _rows_to_nhwc(tar_rows), ref_mask,
            tar_mask, out, sum_sim, max_cost, g_out, max_disp)
        gref, gtar = gref.transpose(0, 1, 3, 2), gtar.transpose(0, 1, 3, 2)
    return gref, gtar, jnp.zeros_like(ref_mask), jnp.zeros_like(tar_mask)


sparse_matching_with_var_rows.defvjp(_fused_rows_vjp_fwd, _fused_rows_vjp_bwd)


# ---------------------------------------------------------------------------
# Prior-windowed fused matching — scan only |d - center| <= window
# ---------------------------------------------------------------------------
#
# The reference scans the FULL band at every fine stage (SM_kernel.cu:86-88),
# which makes the matcher solve global correspondence with C<=8 descriptors —
# on repetitive texture the appearance-optimal candidate sits far from the
# truth for a large fraction of detail pixels.  The decomposition already
# provides a strong prior at every fine stage (the upsampled dense
# disparity); windowing the sparse scan around it is the adaptive-sampling
# idea the reference applies to its cost volumes (submodule.py:398-411) but
# never to SpaMat.  Semantics: identical to the full-band op with candidates
# outside the window treated as tar_mask==0 (incl. the eps/no-candidate
# sentinel when the whole window is masked out).  center gets a zero
# gradient (callers pass a stop_gradient'ed prior, as the reference detaches
# cross-stage predictions, SparseDenseNetRefinementMask.py:172-175).

def _windowed_moments(ref_rows, tar_rows, ref_mask, tar_mask, center,
                      max_disp, window, impl):
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from decnet_tpu.ops.pallas import spamat as _k
        return _k.moments_rows(ref_rows, tar_rows, ref_mask, tar_mask,
                               max_disp, center=center, window=window)
    return matching_moments(_rows_to_nhwc(ref_rows), _rows_to_nhwc(tar_rows),
                            ref_mask, tar_mask, max_disp, center=center,
                            window=window)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def sparse_matching_with_var_rows_windowed(ref_rows, tar_rows, ref_mask,
                                           tar_mask, center, max_disp: int,
                                           window: int, impl: str = "auto"):
    """(expected disparity, variance) over the |d - center| <= window band.

    ref/tar rows-form (B,H,C,W); center (B,H,W) in current-stage disparity
    units.  window <= 0 falls back to the full-band op."""
    (out, var), _ = _fused_win_vjp_fwd(ref_rows, tar_rows, ref_mask,
                                       tar_mask, center, max_disp, window,
                                       impl)
    return out, var


def _fused_win_vjp_fwd(ref_rows, tar_rows, ref_mask, tar_mask, center,
                       max_disp, window, impl):
    m, se, sed, sed2 = _windowed_moments(ref_rows, tar_rows, ref_mask,
                                         tar_mask, center, max_disp, window,
                                         impl)
    refm = ref_mask != 0
    out = jnp.where(refm, (EPS + sed) / (EPS + se), 0.0)
    svar = sed2 - 2.0 * out * sed + out * out * se
    var = jnp.where(refm, (EPS + svar) / (EPS + se), 0.0)
    sum_sim = jnp.where(refm, EPS + se, 0.0)
    max_cost = jnp.where(refm, m, 0.0)
    return (out, var), (ref_rows, tar_rows, ref_mask, tar_mask, center, out,
                        sum_sim, max_cost)


def _fused_win_vjp_bwd(max_disp, window, impl, res, gs):
    g_out, _ = gs  # variance is stop_gradient by contract
    ref_rows, tar_rows, ref_mask, tar_mask, center, out, sum_sim, \
        max_cost = res
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from decnet_tpu.ops.pallas import spamat as _k
        gref, gtar = _k.spamat_backward_rows(
            ref_rows, tar_rows, ref_mask, tar_mask, out, sum_sim, max_cost,
            g_out, max_disp, center=center, window=window)
    else:
        gref, gtar = _spamat_bwd_xla(
            _rows_to_nhwc(ref_rows), _rows_to_nhwc(tar_rows), ref_mask,
            tar_mask, out, sum_sim, max_cost, g_out, max_disp,
            center=center, window=window)
        gref, gtar = gref.transpose(0, 1, 3, 2), gtar.transpose(0, 1, 3, 2)
    return (gref, gtar, jnp.zeros_like(ref_mask), jnp.zeros_like(tar_mask),
            jnp.zeros_like(center))


sparse_matching_with_var_rows_windowed.defvjp(_fused_win_vjp_fwd,
                                              _fused_win_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def sparse_matching_with_var_windowed(ref, tar, ref_mask, tar_mask, center,
                                      max_disp: int, window: int,
                                      impl: str = "auto"):
    """NHWC twin of sparse_matching_with_var_rows_windowed."""
    (out, var), _ = _fused_win_nhwc_fwd(ref, tar, ref_mask, tar_mask, center,
                                        max_disp, window, impl)
    return out, var


def _to_rows(x):
    """(B,H,W,C) -> (B,H,C,W)."""
    return x.transpose(0, 1, 3, 2)


def _fused_win_nhwc_fwd(ref, tar, ref_mask, tar_mask, center, max_disp,
                        window, impl):
    (out, var), res = _fused_win_vjp_fwd(_to_rows(ref), _to_rows(tar),
                                         ref_mask, tar_mask, center,
                                         max_disp, window, impl)
    return (out, var), res


def _fused_win_nhwc_bwd(max_disp, window, impl, res, gs):
    gref, gtar, gm1, gm2, gc = _fused_win_vjp_bwd(max_disp, window, impl,
                                                  res, gs)
    return _rows_to_nhwc(gref), _rows_to_nhwc(gtar), gm1, gm2, gc


sparse_matching_with_var_windowed.defvjp(_fused_win_nhwc_fwd,
                                         _fused_win_nhwc_bwd)
