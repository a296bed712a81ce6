"""Torch-parity image resize (F.interpolate, align_corners=False) as matmuls.

The reference downsamples ground truth with bilinear/bicubic interpolation
(loss.py:186-196) and upsamples skip-stage predictions bicubically
(SparseDenseNetRefinementMask.py:143-144).  PyTorch's bicubic uses the
Catmull-Rom-like kernel with a=-0.75 while jax.image.resize uses a=-0.5, so we
build the torch tap weights explicitly and apply them as two small dense
matmuls (H and W separately) — MXU-friendly and exactly reproducible.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    x = np.abs(x)
    return np.where(
        x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
        np.where(x < 2, a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a, 0.0))


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """(out_size, in_size) interpolation matrix, torch align_corners=False."""
    scale = in_size / out_size
    mat = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(src))
        if mode == "bilinear":
            taps = [x0, x0 + 1]
            wgts = [1 - (src - x0), src - x0]
        elif mode == "bicubic":
            taps = [x0 - 1, x0, x0 + 1, x0 + 2]
            wgts = _cubic(src - np.array(taps, np.float64))
        else:
            raise ValueError(f"unknown resize mode {mode}")
        for k, g in zip(taps, wgts):
            mat[i, min(max(k, 0), in_size - 1)] += g
    return mat


def interpolate(img: jax.Array, out_h: int, out_w: int, mode: str) -> jax.Array:
    """Resize (B,H,W,C) or (B,H,W) to (out_h, out_w), torch semantics."""
    squeeze = img.ndim == 3
    if squeeze:
        img = img[..., None]
    B, H, W, C = img.shape
    if H != out_h:
        my = jnp.asarray(_resize_matrix(H, out_h, mode))
        img = jnp.einsum("oh,bhwc->bowc", my, img,
                         precision=jax.lax.Precision.HIGHEST)
    if W != out_w:
        mx = jnp.asarray(_resize_matrix(W, out_w, mode))
        img = jnp.einsum("ow,bhwc->bhoc", mx, img,
                         precision=jax.lax.Precision.HIGHEST)
    return img[..., 0] if squeeze else img


def downsample_gt(gt: jax.Array, down_size: int, mode: str) -> jax.Array:
    """Ground-truth pyramid: value-scaled then resized (loss.py:186-196).

    mode in {bilinear, bicubic, max, min}. `gt` is (B,H,W)."""
    B, H, W = gt.shape
    if mode in ("bilinear", "bicubic"):
        return interpolate(gt / down_size, H // down_size, W // down_size, mode)
    if mode == "max":
        x = (gt / down_size).reshape(B, H // down_size, down_size,
                                     W // down_size, down_size)
        return x.max(axis=(2, 4))
    if mode == "min":
        tmp = jnp.where(gt > 0, gt, 1e6)
        x = (tmp / down_size).reshape(B, H // down_size, down_size,
                                      W // down_size, down_size)
        return x.min(axis=(2, 4))
    raise ValueError(f"unknown down_func_name {mode}")


def avg_pool(x: jax.Array, k: int) -> jax.Array:
    """Non-overlapping average pool on (B,H,W,C)."""
    B, H, W, C = x.shape
    return x.reshape(B, H // k, k, W // k, k, C).mean(axis=(2, 4))
