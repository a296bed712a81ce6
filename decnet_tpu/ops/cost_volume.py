"""Cost-volume construction (reference modules/submodule.py:428-562).

The reference warps the right feature map to every disparity hypothesis with
grid_sample and combines with the left features via `cor` (product — the
shipped default), `cat` (concat) or `ssd`.  On TPU this is a vectorised
gather + elementwise op that XLA fuses; the volume layout is (B,S,H,W,C) so
3D convolutions run as NDHWC and the S axis can be sharded on a `disp` mesh
axis.

Out-of-range hypotheses (d > x) zero the *left* volume entries, matching
``left_vol[:, pos_x < disp_samples] = 0`` (submodule.py:507).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from decnet_tpu.ops.warp import warp_volume_by_disparity, warp_volume_uniform


def build_cost_volume(left: jax.Array, right: jax.Array,
                      disp_samples: jax.Array, cost_func: str = "cor"
                      ) -> jax.Array:
    """left/right (B,H,W,C), disp_samples (B,S,H,W) -> (B,S,H,W,C[*2]).

    cost_func: 'cor' (elementwise product — default in all shipped configs,
    demo.sh:1), 'cat' (channel concat -> 2C), or 'ssd'.
    """
    B, H, W, C = left.shape
    right_vol = warp_volume_by_disparity(right, disp_samples)   # (B,S,H,W,C)
    xs = jnp.arange(W, dtype=disp_samples.dtype)[None, None, None, :]
    in_range = (xs >= disp_samples)[..., None]                   # (B,S,H,W,1)
    left_vol = left[:, None] * in_range

    if cost_func == "cor":
        return left_vol * right_vol
    if cost_func == "cat":
        return jnp.concatenate([left_vol, right_vol], axis=-1)
    if cost_func == "ssd":
        # (l^2 + r^2)/2 - ((l+r)/2)^2  (submodule.py:524-530)
        s = left_vol + right_vol
        return (left_vol ** 2 + right_vol ** 2) / 2.0 - (s / 2.0) ** 2
    raise ValueError(f"unknown cost_func {cost_func}")


def build_cost_volume_uniform(left: jax.Array, right: jax.Array,
                              max_disp: int, cost_func: str = "cor"
                              ) -> jax.Array:
    """build_cost_volume for the stage-0 uniform hypothesis set
    d = 0..max_disp-1 (uniform_disp_samples): the warp becomes two static
    matmuls (warp_volume_uniform) and the left-volume zeroing mask
    ``x >= d`` is a trace-time constant."""
    import numpy as np
    B, H, W, C = left.shape
    right_vol = warp_volume_uniform(right, max_disp)            # (B,S,H,W,C)
    in_range = (np.arange(W)[None, :]
                >= np.arange(max_disp)[:, None])                # (S, W)
    left_vol = left[:, None] * jnp.asarray(
        in_range[None, :, None, :, None], left.dtype)

    if cost_func == "cor":
        return left_vol * right_vol
    if cost_func == "cat":
        return jnp.concatenate([left_vol, right_vol], axis=-1)
    if cost_func == "ssd":
        s = left_vol + right_vol
        return (left_vol ** 2 + right_vol ** 2) / 2.0 - (s / 2.0) ** 2
    raise ValueError(f"unknown cost_func {cost_func}")
