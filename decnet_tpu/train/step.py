"""Jitted train/eval step factories.

`batch` pytree:
  left, right      (B,H,W,3) normalised images
  gt               (B,H,W)   disparity ground truth (0 = invalid)
  left_masks/right_masks  lists of per-fine-stage (B,h,w) binary detail masks
                          (loader-precomputed; used as sparse-matching input
                          when the model runs with use_detail=False, and as
                          supervision targets for the learned detail heads
                          when use_detail=True).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from decnet_tpu.config import Config
from decnet_tpu.train import loss as loss_lib
from decnet_tpu.train.metrics import epe_and_d1
from decnet_tpu.train.state import TrainState


def make_train_step(model, cfg: Config, donate: bool = True,
                    freeze_bn: Optional[bool] = None,
                    apply_transform=None):
    """`apply_transform`: optional DIFFERENTIABLE variables->variables map
    applied before model.apply — training-mode repack
    (models/repack.py::repack_linear): `model` is then the packed s2d twin
    while params/optimizer state/checkpoints stay in the faithful
    reference-compatible layout.  Only valid with freeze_bn (a packed BN
    would collect per-phase batch statistics)."""
    mcfg, lcfg = cfg.model, cfg.loss
    if freeze_bn is None:
        freeze_bn = getattr(cfg.train, "freeze_bn", False)
    if apply_transform is not None:
        assert freeze_bn, "training-mode repack requires freeze_bn " \
                          "(packed BN batch statistics are per-phase)"
    loss_type = lcfg.loss_type.lower()
    known = ("multi_stage_regression_uploss", "chamfer", "lr_consistency",
             "multi_stage_regression_upsampleloss",
             "multi_stage_regression_upmaskloss")
    assert loss_type in known, f"No such loss: {lcfg.loss_type}"  # loss.py:28
    if loss_type == "multi_stage_regression_upmaskloss":
        assert mcfg.use_detail, \
            "upmaskloss supervises the learned detail heads (use_detail=1)"
    if loss_type == "lr_consistency":
        assert not mcfg.s2d_fine, \
            "LR_consistency reads per-stage NHWC feature maps " \
            "(reference-form variant only)"

    def compute_loss(out, batch):
        """The reference Loss dispatcher (loss.py:31-64), functional."""
        if loss_type == "multi_stage_regression_uploss":
            return loss_lib.multi_stage_uploss(
                out, batch["gt"], lcfg, mcfg.num_stage, mcfg.down_scale,
                mcfg.max_disp, mcfg.skip_stage_id)
        if loss_type == "chamfer":
            return loss_lib.multi_stage_chamfer(
                out, batch["gt"], lcfg, mcfg.num_stage, mcfg.down_scale,
                mcfg.max_disp, mcfg.skip_stage_id)
        if loss_type == "multi_stage_regression_upsampleloss":
            return loss_lib.upsample_loss(
                out, batch["gt"], lcfg, mcfg.num_stage, mcfg.down_scale,
                mcfg.max_disp)
        if loss_type == "lr_consistency":
            total = loss_lib.lr_consistency_loss(
                out["preds"], out["left_feats"], out["right_feats"],
                lcfg.weights)
            return total, {"lr_consistency": total}
        # multi_stage_regression_upmaskloss: pure detail-mask supervision
        # (loss.py:273-359); binary_thold binarises first (eval mode, :343-345)
        total, logs = loss_lib.detail_mask_loss(
            out, batch["left_masks"], batch["right_masks"], lcfg.weights,
            binary_thold=lcfg.binary_thold)
        return total, logs

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        if apply_transform is not None:
            variables = apply_transform(variables)
        if freeze_bn:
            # BN-freeze fine-tune: normalise with the (fixed) running
            # statistics exactly as eval will, so the weights adapt to them.
            # Closes the batch-stats/running-stats gap that batch-stat
            # training leaves (train=True EPE 2.7 vs eval 5.3 measured on
            # the 25k s2d checkpoint).
            out = model.apply(
                variables, batch["left"], batch["right"],
                batch.get("left_masks"), batch.get("right_masks"),
                train=False)
            mutated = {"batch_stats": batch_stats}
        else:
            out, mutated = model.apply(
                variables, batch["left"], batch["right"],
                batch.get("left_masks"), batch.get("right_masks"),
                train=True, mutable=["batch_stats"])
        total, logs = compute_loss(out, batch)
        if (loss_type != "multi_stage_regression_upmaskloss"
                and mcfg.use_detail and batch.get("left_masks") is not None):
            # detail heads get mask supervision alongside the disparity loss
            # (the reference applies maskloss as a second Loss object,
            # SparseDenseNetRefinementMask.py:91)
            mloss, mlogs = loss_lib.detail_mask_loss(
                out, batch["left_masks"], batch["right_masks"], lcfg.weights)
            total = total + lcfg.alpha * mloss
            logs.update(mlogs)
        logs["total"] = total
        return total, (mutated["batch_stats"], logs)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, logs)), grads = grad_fn(state.params,
                                                state.batch_stats, batch)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_stats)
        logs["grad_norm"] = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.vdot(x, x).real, grads, 0.0) ** 0.5
        return state, logs

    return train_step


def make_eval_step(model, cfg: Config):
    mcfg = cfg.model

    @jax.jit
    def eval_step(state: TrainState, batch) -> Dict[str, jax.Array]:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, batch["left"], batch["right"],
                          batch.get("left_masks"), batch.get("right_masks"),
                          train=False)
        epe, d1 = epe_and_d1(out["preds"][-1], batch["gt"], mcfg.max_disp)
        # Decomposition-win anchor: EPE of the coarse stage-0 prediction
        # naively bicubic-upsampled to full resolution (the baseline the
        # fine sparse/dense stages must beat — reference README.md:2; same
        # escape hatch as skip_stage_id, SparseDenseNetRefinementMask.py:143).
        from decnet_tpu.ops.resize import interpolate
        coarse = out["preds"][0]
        gt = batch["gt"]
        up = interpolate(coarse * (gt.shape[1] / coarse.shape[1]),
                         gt.shape[1], gt.shape[2], "bicubic")
        epe_up0, d1_up0 = epe_and_d1(up, gt, mcfg.max_disp)
        return {"epe": epe, "d1": d1, "epe_up0": epe_up0, "d1_up0": d1_up0,
                "pred": out["preds"][-1]}

    return eval_step


def make_infer_fn(model, cfg: Config, max_disp: Optional[int] = None):
    """Inference-only forward returning the final disparity map."""
    @jax.jit
    def infer(variables, left, right):
        out = model.apply(variables, left, right, train=False,
                          max_disp=max_disp)
        return out["preds"][-1]

    return infer
