"""Occlusion detection from disparity (reference utils/utils.py:158-208
`get_occ` and the loader-local twin SceneflowMask.py:12-66).

A left pixel is occluded iff some pixel to its right warps to a position at or
left of its own warped position: with shift(w) = w - d(w), occluded(w) =
(shift(w) > min_{w' >= w} shift(w')) or shift(w) <= 0.  The reference computes
the suffix-min with a Python loop over columns; here it is a reversed
`lax.cummin` — one vectorised pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def occlusion_mask(disparity: jax.Array) -> jax.Array:
    """disparity (B,H,W) -> bool (B,H,W), True where occluded."""
    B, H, W = disparity.shape
    xs = jnp.arange(W, dtype=disparity.dtype)[None, None, :]
    shift = xs - disparity
    suffix_min = jax.lax.cummin(shift, axis=2, reverse=True)
    return (shift > suffix_min) | (shift <= 0)
