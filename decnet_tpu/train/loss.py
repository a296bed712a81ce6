"""Training losses and metrics (reference modules/loss.py).

All losses are masked-mean reductions implemented jit-safely with
where+sum/count (no boolean indexing).  The flagship loss is
`multi_stage_uploss` (loss.py:168-242, the shipped default); the mask
supervision loss (loss.py:273-359), upsample-loss variant (loss.py:362-395),
left-right consistency (loss.py:398-424) and a repaired chamfer loss
(loss.py:67-165 — upstream references an undefined Huber; fixed here) are all
provided.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from decnet_tpu.config import LossConfig
from decnet_tpu.ops.resize import downsample_gt
from decnet_tpu.ops.warp import warp_by_disparity


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of x over mask!=0; 0 when the mask is empty."""
    m = mask.astype(jnp.float32)
    cnt = m.sum()
    return jnp.where(cnt > 0, (x.astype(jnp.float32) * m).sum() / jnp.maximum(cnt, 1.0), 0.0)


def smooth_l1(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Elementwise torch F.smooth_l1_loss (beta=1)."""
    d = jnp.abs(pred - gt)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def gt_pyramid(gt: jax.Array, num_stage: int, down_scale: int,
               down_func_name: str) -> List[jax.Array]:
    """Per-stage ground truth, value-scaled (loss.py:186-199). gt (B,H,W)."""
    gts = []
    for stage in range(num_stage):
        down = down_scale ** (num_stage - stage - 1)
        gts.append(gt if down == 1 else downsample_gt(gt, down, down_func_name))
    return gts


def multi_stage_uploss(outputs: Dict, gt: jax.Array, cfg: LossConfig,
                       num_stage: int, down_scale: int, max_disp: int,
                       skip_stage_id: int = 4) -> Tuple[jax.Array, Dict]:
    """The shipped training loss (multi_stage_regression_Uploss,
    loss.py:168-242). Per stage: valid = 0 < gt_s < max_disp/down (+ optional
    sky-row zeroing); stage0/skipped = smooth-L1 on pred; fine stages =
    0.5*pred + 0.1*dense + 0.2/(10+3.75*stage)*sparse(masked) + 0.2*fusion.
    All terms are computed on value-rescaled (x down_size) disparities.
    """
    preds = outputs["preds"]
    gts = gt_pyramid(gt, num_stage, down_scale, cfg.down_func_name)
    total = 0.0
    logs: Dict[str, jax.Array] = {}
    fine_idx = 0
    for stage in range(num_stage):
        down = float(down_scale ** (num_stage - stage - 1))
        cur_gt = gts[stage]
        valid = (cur_gt > 0) & (cur_gt < max_disp / down)
        if cfg.if_overmask:
            sky = jnp.arange(cur_gt.shape[1]) < int(108 // down)
            valid = valid & ~sky[None, :, None]
        w = cfg.weights[stage]

        if stage == 0 or stage >= skip_stage_id:
            l = masked_mean(smooth_l1(preds[stage] * down, cur_gt * down), valid)
            total = total + w * l
            logs[f"stage{stage}/pred"] = l
            continue

        dense = outputs["dense"][fine_idx]
        sparse = outputs["sparse"][fine_idx]
        fusion = outputs["fusion"][fine_idx]
        lmask = outputs["masks_used"][fine_idx]
        cand = outputs.get("cand")
        cand = cand[fine_idx] if cand else None
        fine_idx += 1

        whole = valid & (lmask == 1)
        if cand is not None and getattr(cfg, "sparse_cand_mask", False):
            # exclude the no-candidate sentinel pixels (they carry zero
            # gradient and only dilute the masked mean's denominator)
            whole = whole & (cand > 0)
        dense_l = masked_mean(smooth_l1(dense * down, cur_gt * down), valid)
        sparse_l = masked_mean(smooth_l1(sparse * down, cur_gt * down), whole)
        fusion_l = masked_mean(smooth_l1(fusion * down, cur_gt * down), valid)
        pred_l = masked_mean(smooth_l1(preds[stage] * down, cur_gt * down), valid)
        sparse_w = cfg.sparse_term_scale * 0.2 / (10.0 + 3.75 * stage)
        total = total + w * (0.5 * pred_l + 0.1 * dense_l
                             + sparse_w * sparse_l + 0.2 * fusion_l)
        logs[f"stage{stage}/pred"] = pred_l
        logs[f"stage{stage}/dense"] = dense_l
        logs[f"stage{stage}/sparse"] = sparse_l
        logs[f"stage{stage}/fusion"] = fusion_l
    return total, logs


def focal_loss(pt, gt, gamma=2.0, alpha=0.5):
    """loss.py:245-247."""
    pt = pt.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    loss = (-alpha * (1 - pt) ** gamma * gt * jnp.log(pt + 1e-5)
            - (1 - alpha) * pt ** gamma * (1 - gt) * jnp.log(1 - pt + 1e-5))
    return loss.mean()


def mask_l1_loss(x, gt):
    """Smooth-L1 on pixels where the target mask > 0.1 (loss.py:261-264)."""
    return masked_mean(smooth_l1(x, gt), gt > 0.1)


def detail_mask_loss(outputs: Dict, left_masks: Sequence[jax.Array],
                     right_masks: Sequence[jax.Array], weights: Sequence[float],
                     binary_thold: Optional[float] = None
                     ) -> Tuple[jax.Array, Dict]:
    """Supervise learned detail masks against precomputed ones
    (multi_stage_regression_UpMaskloss, loss.py:273-359):
    focal(gamma=2, alpha=0.5) + 3 * masked-L1, per fine stage.
    At eval, pass binary_thold to binarise predictions first (loss.py:343-345).
    """
    total = 0.0
    logs = {}
    for i, (ld, rd) in enumerate(zip(outputs["left_details"],
                                     outputs["right_details"])):
        lm, rm = left_masks[i], right_masks[i]
        if binary_thold is not None:
            ld = (ld > binary_thold).astype(jnp.float32)
            rd = (rd > binary_thold).astype(jnp.float32)
        lfl = focal_loss(ld, lm)
        rfl = focal_loss(rd, rm)
        ll1 = mask_l1_loss(ld, lm)
        rl1 = mask_l1_loss(rd, rm)
        total = total + (lfl + rfl + 3 * ll1 + 3 * rl1) * weights[i]
        logs[f"mask{i}/focal"] = lfl + rfl
        logs[f"mask{i}/l1"] = ll1 + rl1
    return total, logs


def upsample_loss(outputs: Dict, gt: jax.Array, cfg: LossConfig,
                  num_stage: int, down_scale: int, max_disp: int
                  ) -> Tuple[jax.Array, Dict]:
    """Upsample-every-stage-to-full-res variant (loss.py:362-395)."""
    from decnet_tpu.ops.resize import interpolate
    H, W = gt.shape[1], gt.shape[2]
    valid = (gt > 0) & (gt < max_disp)
    total = 0.0
    logs = {}
    for stage, pred in enumerate(outputs["preds"]):
        down = down_scale ** (num_stage - stage - 1)
        cur = pred if down == 1 else interpolate(pred * down, H, W,
                                                 cfg.down_func_name)
        l = masked_mean(smooth_l1(cur, gt), valid)
        total = total + cfg.weights[stage] * l
        logs[f"stage{stage}/up"] = l
    return total, logs


def lr_consistency_loss(preds: Sequence[jax.Array],
                        left_feats: Dict[str, jax.Array],
                        right_feats: Dict[str, jax.Array],
                        weights: Sequence[float]) -> jax.Array:
    """Photometric left-right feature consistency (loss.py:398-424)."""
    total = 0.0
    for stage, pred in enumerate(preds):
        rf = right_feats[f"stage{stage}"]
        warped = warp_by_disparity(rf, pred)
        diff = (left_feats[f"stage{stage}"].astype(jnp.float32)
                - warped.astype(jnp.float32)) ** 2
        total = total + weights[stage] * diff.sum(axis=-1).mean()
    return total


def chamfer_error(pred: jax.Array, gt: jax.Array, down_ratio: int) -> jax.Array:
    """Per-pixel sparse chamfer distance (loss.py:67-98 `sparseChamfer`):
    min distance from each coarse prediction (full-res disparity units) to any
    valid GT in its down_ratio cell, invalid (gt==0) candidates excluded.
    pred (B,h,w), gt (B,h*r,w*r) -> (B,h,w)."""
    B, h, w = pred.shape
    r = down_ratio
    cells = gt.reshape(B, h, r, w, r).transpose(0, 1, 3, 2, 4).reshape(B, h, w, r * r)
    d2 = (pred[..., None] - cells) ** 2 + jnp.where(cells == 0, 1e6, 0.0)
    return jnp.sqrt(d2.min(axis=-1) + 1e-6)


def chamfer_loss(pred: jax.Array, gt: jax.Array, down_ratio: int,
                 extra_mask: Optional[jax.Array] = None) -> jax.Array:
    """Repaired chamfer loss (loss.py:121-127; upstream's `MyHubeLoss` is
    undefined — standard Huber delta=1 stands in): Huber of the chamfer
    distance averaged over pixels with err < 100 (and `extra_mask` if given,
    the sparse-branch left_mask gate of loss.py:142-143)."""
    err = chamfer_error(pred, gt, down_ratio)
    mask = err < 100
    if extra_mask is not None:
        mask = mask & (extra_mask == 1)
    huber = jnp.where(err < 1.0, 0.5 * err * err, err - 0.5)
    return masked_mean(huber, mask)


def multi_stage_chamfer(outputs: Dict, gt: jax.Array, cfg: LossConfig,
                        num_stage: int, down_scale: int, max_disp: int,
                        skip_stage_id: int = 4) -> Tuple[jax.Array, Dict]:
    """The chamfer loss_type (loss.py:98-165 `multi_stage_chamfer_loss`):
    per stage, chamfer each branch against the FULL-RES ground truth through
    its down_ratio cells; fine stages combine 0.5*pred + 0.1*dense +
    0.2/(10+3.75*stage)*sparse(left-masked) + 0.2*fusion, as in uploss."""
    preds = outputs["preds"]
    total = 0.0
    logs: Dict[str, jax.Array] = {}
    fine_idx = 0
    for stage in range(num_stage):
        down = down_scale ** (num_stage - stage - 1)
        w = cfg.weights[stage]
        if stage == 0 or stage >= skip_stage_id:
            l = chamfer_loss(preds[stage] * down, gt, down)
            total = total + w * l
            logs[f"stage{stage}/pred"] = l
            continue
        lmask = outputs["masks_used"][fine_idx]
        dense_l = chamfer_loss(outputs["dense"][fine_idx] * down, gt, down)
        sparse_l = chamfer_loss(outputs["sparse"][fine_idx] * down, gt, down,
                                extra_mask=lmask)
        fusion_l = chamfer_loss(outputs["fusion"][fine_idx] * down, gt, down)
        pred_l = chamfer_loss(preds[stage] * down, gt, down)
        fine_idx += 1
        sparse_w = cfg.sparse_term_scale * 0.2 / (10.0 + 3.75 * stage)
        total = total + w * (0.5 * pred_l + 0.1 * dense_l
                             + sparse_w * sparse_l + 0.2 * fusion_l)
        logs[f"stage{stage}/pred"] = pred_l
        logs[f"stage{stage}/dense"] = dense_l
        logs[f"stage{stage}/sparse"] = sparse_l
        logs[f"stage{stage}/fusion"] = fusion_l
    return total, logs
