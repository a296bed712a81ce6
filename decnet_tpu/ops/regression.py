"""Disparity hypothesis sampling and soft-argmin regression.

TPU-native equivalents of reference modules/submodule.py:376-424
(`get_disp_samples`) and :766-776 (`disparity_regression`).
Cost volumes here are (B,S,H,W) with the hypothesis axis S second so it can be
sharded over a `disp` mesh axis; the softmax decomposes with psum exactly like
the online softmax in the matching kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_disp_samples(max_disp: int, batch: int, height: int, width: int,
                         dtype=jnp.float32) -> jax.Array:
    """Stage-0 full hypothesis set arange(max_disp) broadcast to (B,S,H,W)
    (submodule.py:389-390)."""
    d = jnp.arange(max_disp, dtype=dtype)
    return jnp.broadcast_to(d[None, :, None, None],
                            (batch, max_disp, height, width))


def adaptive_disp_samples(disparity: jax.Array, max_disp: int, step: float,
                          samp_num: int, kernel_size: int) -> jax.Array:
    """Adaptive sampling around a prior disparity (submodule.py:398-411).

    Bounds come from a kernel_size min/max pool of the prior; the range is
    padded up to ``samp_num*step`` then linspaced with `samp_num` values.
    `disparity` is (B,H,W); returns (B,samp_num,H,W).

    (The shipped forward never reaches this path — stages >= 1 use sparse
    matching — but the reference CLI exposes it, so it is kept.)
    """
    k = kernel_size
    pad = (k - 1) // 2

    def pool(x, op):
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)),
                     constant_values=-jnp.inf)
        patches = jnp.stack([
            xp[:, i:i + x.shape[1], j:j + x.shape[2]]
            for i in range(k) for j in range(k)], axis=0)
        return op(patches, axis=0)

    upper = pool(disparity, jnp.max)
    lower = -pool(-disparity, jnp.max)
    lower = jnp.abs(lower)
    modified = jnp.clip(samp_num * step - (upper - lower), min=0) / 2
    lower = jnp.clip(lower - modified, 0, max_disp)
    upper = jnp.clip(upper + modified, 0, max_disp)
    new_step = (upper - lower) / (samp_num - 1)
    idx = jnp.arange(samp_num, dtype=disparity.dtype)[None, :, None, None]
    return lower[:, None] + idx * new_step[:, None]


def disparity_regression(cost: jax.Array, disp_samples: jax.Array) -> jax.Array:
    """Soft-argmin: softmax over S then expectation (submodule.py:766-776).

    cost (B,S,H,W), disp_samples (B,S,H,W) -> (B,H,W). Computed in f32 for
    stability regardless of input dtype.
    """
    c = cost.astype(jnp.float32)
    p = jax.nn.softmax(c, axis=1)
    return jnp.sum(p * disp_samples.astype(jnp.float32), axis=1)
