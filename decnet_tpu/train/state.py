"""Train state + optimizer factory.

The reference never shipped a train loop ("the code is still a little messy",
README.md:6); this supplies the missing piece: Adam with warmup+cosine (or
piecewise) schedule, flax TrainState carrying BatchNorm statistics, and
gradient clipping.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state

from decnet_tpu.config import TrainConfig


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_schedule(cfg: TrainConfig):
    if cfg.lr_schedule == "constant":
        return optax.constant_schedule(cfg.lr)
    if cfg.lr_schedule == "cosine":
        warmup = min(cfg.warmup_steps, max(1, cfg.total_steps // 10))
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.lr, warmup_steps=warmup,
            decay_steps=max(cfg.total_steps, warmup + 1),
            end_value=cfg.lr * 0.01)
    if cfg.lr_schedule == "piecewise":
        return optax.piecewise_constant_schedule(
            cfg.lr, {int(cfg.total_steps * 0.6): 0.1,
                     int(cfg.total_steps * 0.85): 0.1})
    raise ValueError(cfg.lr_schedule)


def make_optimizer(cfg: TrainConfig):
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(make_schedule(cfg), weight_decay=cfg.weight_decay)
        if cfg.weight_decay > 0 else optax.adam(make_schedule(cfg)),
    )
    return tx


def create_train_state(model, variables, cfg: TrainConfig) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg))
