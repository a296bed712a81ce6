"""Disparity warping / bilinear sampling, torch-`grid_sample` parity.

The reference builds cost volumes and refinement inputs by sampling the right
view at ``x - d`` through ``F.grid_sample(align_corners=False,
padding_mode='zeros')`` (reference modules/submodule.py:479-510, :719-745).
Here the same semantics are expressed as vectorised gathers that XLA fuses and
tiles for the TPU — no kernel needed.

All image tensors are NHWC.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(img: jax.Array, x: jax.Array, y: jax.Array) -> jax.Array:
    """Bilinear sample `img` (B,H,W,C) at unnormalised pixel coords x,y (B,...).

    Zeros padding: taps outside the image contribute 0, matching
    torch.grid_sample(padding_mode='zeros', align_corners=False) once the
    caller has unnormalised the grid. x/y may have any trailing shape; the
    output is (B, *x.shape[1:], C).
    """
    img = jnp.asarray(img)
    B, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, wgt):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = img[jnp.arange(B).reshape((B,) + (1,) * (x.ndim - 1)), yi_c, xi_c]
        return vals * (wgt * inb)[..., None]

    out = (tap(x0, y0, wx0 * wy0) + tap(x0 + 1, y0, wx1 * wy0)
           + tap(x0, y0 + 1, wx0 * wy1) + tap(x0 + 1, y0 + 1, wx1 * wy1))
    return out


def grid_sample_normalized(img: jax.Array, grid: jax.Array) -> jax.Array:
    """Torch-parity grid_sample: `grid` (B,...,2) holds normalised (x, y) in
    [-1, 1]; align_corners=False unnormalisation ``x = ((gx+1)*W - 1)/2``."""
    B, H, W, C = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    x = ((gx + 1.0) * W - 1.0) / 2.0
    y = ((gy + 1.0) * H - 1.0) / 2.0
    return grid_sample_bilinear(img, x, y)


def warp_by_disparity(img: jax.Array, disp: jax.Array) -> jax.Array:
    """Sample right-view `img` (B,H,W,C) at ``x - disp`` (disp (B,H,W)).

    Parity with the reference homography warp (submodule.py:719-745): the grid
    is normalised with (W-1)/2 then resampled with align_corners=False, so the
    effective sampling position is ``(x - d) * W/(W-1) - 0.5`` — faithfully
    reproduced here (it is NOT an exact integer shift even for integer d).
    """
    B, H, W, C = img.shape
    xs = jnp.arange(W, dtype=disp.dtype)
    ys = jnp.arange(H, dtype=disp.dtype)
    gx = (xs[None, None, :] - disp) / ((W - 1.0) / 2.0) - 1.0
    x = ((gx + 1.0) * W - 1.0) / 2.0
    y = jnp.broadcast_to(ys[None, :, None], disp.shape)
    # gy = y/((H-1)/2) - 1 ; unnormalised back: y' = y*H/(H-1) - 0.5
    yy = y * (H / (H - 1.0)) - 0.5
    return grid_sample_bilinear(img, x, yy)


def warp_volume_by_disparity(img: jax.Array, disp_samples: jax.Array) -> jax.Array:
    """Build the warped right-feature volume (B,S,H,W,C) for per-pixel
    disparity hypotheses `disp_samples` (B,S,H,W) — reference
    submodule.py:479-510 (`get_warped_feats_by_homgrp`)."""
    def one(d):
        return warp_by_disparity(img, d)
    return jax.vmap(one, in_axes=1, out_axes=1)(disp_samples)


def _affine_tap_matrix(n_out: int, n_in: int, pos) -> "np.ndarray":
    """(n_out, n_in) bilinear sampling matrix: row i holds the two taps for
    sampling a length-n_in signal at position pos[i], zeros outside (torch
    grid_sample padding_mode='zeros' semantics).  numpy, trace-time static."""
    import numpy as np
    pos = np.asarray(pos, np.float32)
    x0 = np.floor(pos)
    w1 = pos - x0
    M = np.zeros((n_out, n_in), np.float32)
    for tap, wgt in ((x0, 1.0 - w1), (x0 + 1.0, w1)):
        ti = tap.astype(np.int64)
        ok = (ti >= 0) & (ti < n_in)
        M[np.arange(n_out)[ok], ti[ok]] += wgt[ok]
    return M


def warp_volume_uniform(img: jax.Array, max_disp: int) -> jax.Array:
    """Warped volume for the *uniform* hypothesis set d = 0..max_disp-1
    (stage 0 of the model, submodule.py:389-390) as two static matmuls.

    The reference's warp samples at affine positions ``x' = x*W/(W-1) -
    (d*W/(W-1) + 1/2)`` and ``y' = y*H/(H-1) - 1/2`` (the (W-1)/2 grid
    normalisation + align_corners=False round trip, submodule.py:479-510);
    bilinear interpolation is separable, so the whole volume is
    ``Ry @ img @ Mx[d]^T`` with trace-time-constant tap matrices — MXU
    matmuls instead of a vmapped gather (which XLA lowers to a serial
    gather loop; measured ~0.7 ms of the flagship forward)."""
    import numpy as np
    B, H, W, C = img.shape
    f = np.float32
    ys = np.arange(H, dtype=f)
    yy = ys * f(H / (H - 1.0)) - f(0.5)
    Ry = _affine_tap_matrix(H, H, yy)
    xs = np.arange(W, dtype=f)
    half = f((W - 1.0) / 2.0)
    cols = []
    for d in range(max_disp):
        gx = (xs - f(d)) / half - f(1.0)
        xp = ((gx + f(1.0)) * f(W) - f(1.0)) / f(2.0)
        cols.append(_affine_tap_matrix(W, W, xp))
    Mx = np.stack(cols)                                   # (S, W, W)
    tmp = jnp.einsum("ih,bhwc->biwc", jnp.asarray(Ry), img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("sxw,bhwc->bshxc", jnp.asarray(Mx), tmp,
                     preferred_element_type=jnp.float32)
    # accumulate in f32 on the MXU but materialise the volume in the input
    # dtype — under bf16 the f32 volume would double the stage-0 HBM traffic
    return out.astype(img.dtype)
