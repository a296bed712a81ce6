"""Evaluation metrics: EPE and the 3px/5% error rate (reference
modules/loss.py:427-437 `test_loss_func`; numpy twin utils/utils.py:362-374).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def epe_and_d1(pred: jax.Array, gt: jax.Array, max_disp: float
               ) -> Tuple[jax.Array, jax.Array]:
    """Returns (epe, loss_3): mean |pred-gt| over 0<gt<max_disp, and the
    percentage of valid pixels with error >= 3px AND >= 5% of gt (the D1-all
    convention)."""
    valid = (gt > 0) & (gt < max_disp)
    err = jnp.abs(pred - gt)
    cnt = jnp.maximum(valid.sum(), 1)
    epe = jnp.where(valid, err, 0.0).sum() / cnt
    ok = (err < 3.0) | (err < 0.05 * gt)
    loss3 = 100.0 - (valid & ok).sum() / cnt * 100.0
    return epe, loss3


def metrics_dict(pred, gt, max_disp):
    epe, d1 = epe_and_d1(pred, gt, max_disp)
    return {"epe": epe, "d1": d1}
