"""DecNet: the decomposition stereo-matching model, TPU-native.

Re-design of reference modules/SparseDenseNetRefinementMask.py:16-257 as a
functional flax module.  Per forward pass:

  stage 0 (1/27): dense cost volume (warp + cor) -> 3D-conv regularisation ->
                  soft-argmin disparity.
  stages 1..3:    learned (or precomputed) detail masks -> dynamic upsampling
                  of the coarse prediction (dense branch) -> Pallas sparse
                  matching on detail pixels (sparse branch) + its variance ->
                  soft-attention fusion -> residual refinement.

Outputs a dict of per-stage tensors; losses/metrics are computed outside the
module (decnet_tpu/train/loss.py) in functional style — XLA dead-code
eliminates whatever a jitted caller does not use, which replaces the
reference's is_check/is_eval return-signature zoo
(SparseDenseNetRefinementMask.py:214-236).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from decnet_tpu.config import ModelConfig
from decnet_tpu.nn.feature import FeatureExtractor
from decnet_tpu.nn.heads import (CostRegNet, DynamicUpsampling, SoftAttention,
                                 Refinement, DetailHead, SoftAttentionS2D,
                                 RefinementS2D, DetailHeadS2D)
from decnet_tpu.nn import layers as layers_lib
from decnet_tpu.nn.layers import (depth_to_space, s2d_to_rows, plane_to_s2d,
                                  s2d_to_plane)
from decnet_tpu.ops.cost_volume import build_cost_volume_uniform
from decnet_tpu.ops.regression import uniform_disp_samples, disparity_regression
from decnet_tpu.ops.matching import (sparse_matching_with_var,
                                     sparse_matching_with_var_rows,
                                     sparse_matching_with_var_windowed,
                                     sparse_matching_with_var_rows_windowed,
                                     candidate_availability,
                                     candidate_availability_windowed)
from decnet_tpu.ops.resize import interpolate
from decnet_tpu.parallel import mesh as mesh_lib


def binarise_detail(detail: jax.Array, cfg: ModelConfig) -> jax.Array:
    """Learned detail probabilities -> binary mask, under stop_gradient.

    thold_mode="fixed" reproduces the reference (detail > thold,
    SparseDenseNetRefinementMask.py:163-170).  thold_mode="quantile" keeps
    each image's top `detail_density` fraction instead — the per-image
    adaptive threshold of utils/Wavelet.py:96-106 applied to the learned
    heads, so mask density is calibrated by construction no matter where the
    head's sigmoids saturate.  Works on the (B,H,W) plane form and the
    (B,h,w,s^2) s2d plane form alike (quantile over all non-batch dims)."""
    if cfg.thold_mode == "quantile":
        B = detail.shape[0]
        flat = detail.reshape(B, -1).astype(jnp.float32)
        th = jnp.quantile(flat, 1.0 - cfg.detail_density, axis=1)
        th = th.reshape((B,) + (1,) * (detail.ndim - 1))
        mask = detail.astype(jnp.float32) > th
    else:
        mask = detail > cfg.thold
    return jax.lax.stop_gradient(mask.astype(jnp.float32))


def binarise_detail_pair(l_detail: jax.Array, r_detail: jax.Array,
                         cfg: ModelConfig):
    """Binarise BOTH views' detail probabilities.  In quantile mode the
    adaptive threshold is shared across the stereo pair (computed on the
    pooled distribution): the sparse matcher skips right pixels with
    tar_mask==0 (SM_kernel.cu:90-99), so per-view thresholds that keep
    different structures collapse cross-view candidate availability — the
    same failure the wavelet masks had with per-image thresholds
    (data/masks.py::wavelet_pair_masks_np).  The heads share weights across
    views, so their scores are directly comparable."""
    if cfg.thold_mode != "quantile":
        return binarise_detail(l_detail, cfg), binarise_detail(r_detail, cfg)
    B = l_detail.shape[0]
    flat = jnp.concatenate([l_detail.reshape(B, -1),
                            r_detail.reshape(B, -1)],
                           axis=1).astype(jnp.float32)
    th = jnp.quantile(flat, 1.0 - cfg.detail_density, axis=1)

    def cut(d):
        t = th.reshape((B,) + (1,) * (d.ndim - 1))
        return jax.lax.stop_gradient(
            (d.astype(jnp.float32) > t).astype(jnp.float32))

    return cut(l_detail), cut(r_detail)


class DecNet(nn.Module):
    """`masks`: list of (left, right) detail masks per fine stage, coarsest
    first, each (B,h_s,w_s) in {0,1}; optional when use_detail=True.
    `max_disp` may be overridden per call (static python int, bucketed by the
    caller) for per-scene disparity ranges (demo.py:172-173)."""
    cfg: ModelConfig

    @nn.compact
    def __call__(self, left, right,
                 left_masks: Optional[Sequence[jax.Array]] = None,
                 right_masks: Optional[Sequence[jax.Array]] = None,
                 *, train: bool = False,
                 max_disp: Optional[int] = None,
                 skip_stage_id: Optional[int] = None,
                 ablate_sparse: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        max_disp = int(max_disp or cfg.max_disp)
        # like max_disp, the huge-image escape hatch is a RUNTIME choice in
        # the reference (CLI flag, SparseDenseNetRefinementMask.py:143-144);
        # overriding per call keeps the param template identical so full
        # checkpoints restore regardless of the eval-time skip
        skip = cfg.skip_stage_id if skip_stage_id is None else int(skip_stage_id)
        ns, scale = cfg.num_stage, cfg.down_scale
        with layers_lib.norm_override(getattr(cfg, "norm", "bn")), \
                layers_lib.conv3d_impl(getattr(cfg, "conv3d_impl", "xla3d")), \
                layers_lib.split_concat(getattr(cfg, "split_concat", False)):
            return self._forward(cfg, dtype, max_disp, skip, ns, scale,
                                 left, right, left_masks, right_masks,
                                 train=train, ablate_sparse=ablate_sparse)

    def _forward(self, cfg, dtype, max_disp, skip_stage_id, ns, scale,
                 left, right, left_masks, right_masks, *, train,
                 ablate_sparse):

        n_s2d = getattr(cfg, "s2d_stages", 1) if cfg.s2d_fine else 0
        extractor = FeatureExtractor(cfg.base_channels, ns, scale,
                                     s2d_last=cfg.s2d_fine,
                                     s2d_mid=n_s2d >= 2,
                                     dtype=dtype, name="feature_extractor")
        left_all = extractor(left.astype(dtype), train=train)
        right_all = extractor(right.astype(dtype), train=train)

        out: Dict[str, Any] = {k: [] for k in (
            "preds", "dense", "sparse", "sparse_raw", "fusion", "soft_mask",
            "var", "residual", "left_details", "right_details", "masks_used",
            "cand")}
        # feature pyramids exposed for the LR-consistency loss (reference
        # loss.py:398-424 reads left/right_feature_map_all); XLA dead-code
        # eliminates them for callers that don't use them
        out["left_feats"] = left_all
        out["right_feats"] = right_all

        pred = None
        pre_left = pre_right = None
        for stage in range(ns):
            lf = left_all[f"stage{stage}"]
            rf = right_all[f"stage{stage}"]
            cur_max_disp = max_disp // (scale ** (ns - stage - 1))
            # the trailing fine stage(s) may arrive in space-to-depth form;
            # their whole pipeline then runs layout-native: features go ONCE
            # to the Pallas kernels' rows-form (B,H,C,W), planar maps stay in
            # s2d plane form (B,h,w,s^2), and the stage's native resolution
            # is never materialised in NHWC (s2d_stages controls how many)
            s2d = cfg.s2d_fine and stage > 0 and stage >= ns - n_s2d
            if s2d:
                lf_rows = s2d_to_rows(lf, scale)      # (B,H,C,W)
                rf_rows = s2d_to_rows(rf, scale)

            if stage == 0:
                B, H, W, _ = lf.shape
                samples = uniform_disp_samples(cur_max_disp, B, H, W)
                vol = build_cost_volume_uniform(lf, rf, cur_max_disp,
                                                cfg.cost_func)
                # disparity-hypothesis sharding: under a mesh context the S
                # axis spans the `disp` axis through the 3D convs and the
                # soft-argmin (psum-merged partial softmax); no-op otherwise
                vol = mesh_lib.constrain(vol, mesh_lib.volume_spec())
                cost = CostRegNet(lf.shape[-1], cfg.cost_func, dtype=dtype,
                                  name="cost_reg")(vol, train=train)
                cost = mesh_lib.constrain(cost, mesh_lib.cost_spec())
                pred = disparity_regression(cost, samples)
                # leave the disp-sharded region explicitly: pred is a plain
                # (B,H,W) map, batch+row sharded, REPLICATED over `disp`
                pred = mesh_lib.constrain(pred, jax.sharding.PartitionSpec(
                    "data", "tile"))
                pre_left, pre_right = lf, rf
                out["preds"].append(pred)
                continue

            if stage >= skip_stage_id:
                # plain bicubic upsampling escape hatch (Middlebury full-res,
                # SparseDenseNetRefinementMask.py:143-144)
                H, W = lf.shape[1], lf.shape[2]
                if s2d:
                    H, W = H * scale, W * scale
                pred = interpolate(pred * scale, H, W, "bicubic")
                out["preds"].append(pred)
                continue

            if cfg.use_detail:
                if s2d:
                    head = DetailHeadS2D(scale, dtype=dtype,
                                         name=f"detail_{stage - 1}")
                else:
                    head = DetailHead(dtype=dtype, name=f"detail_{stage - 1}")
                l_logit, _, _ = head(lf, pre_left, train=train)
                r_logit, _, _ = head(rf, pre_right, train=train)
                l_detail = jax.nn.sigmoid(l_logit)  # s2d plane when s2d
                r_detail = jax.nn.sigmoid(r_logit)
                if s2d:
                    lmask_s2d, rmask_s2d = binarise_detail_pair(
                        l_detail, r_detail, cfg)
                    # the matching kernel scans full-res rows
                    lmask = s2d_to_plane(lmask_s2d, scale)
                    rmask = s2d_to_plane(rmask_s2d, scale)
                    out["left_details"].append(s2d_to_plane(l_detail, scale))
                    out["right_details"].append(s2d_to_plane(r_detail, scale))
                else:
                    out["left_details"].append(l_detail)
                    out["right_details"].append(r_detail)
                    lmask, rmask = binarise_detail_pair(l_detail, r_detail,
                                                        cfg)
            else:
                lmask = left_masks[stage - 1].astype(jnp.float32)
                rmask = right_masks[stage - 1].astype(jnp.float32)
                if s2d:
                    lmask_s2d = plane_to_s2d(lmask, scale)
            out["masks_used"].append(lmask)
            # the next stage's DetailHead consumes this stage's features in
            # NHWC form at this stage's native resolution; unpacking the s2d
            # form is its exact inverse (layers.depth_to_space), and XLA
            # dead-code-eliminates it when no next stage uses it
            pre_left = depth_to_space(lf, scale) if s2d else lf
            pre_right = depth_to_space(rf, scale) if s2d else rf

            cur = jax.lax.stop_gradient(pred) if cfg.grad_method == "detach" \
                else pred

            dense = DynamicUpsampling(scale, pre_unfolded=s2d, out_s2d=s2d,
                                      dtype=dtype,
                                      name=f"dyn_up_{stage - 1}")(
                cur, lf, train=train)
            # with s2d, `dense` is the s2d plane (B,h,w,s^2)
            out["dense"].append(s2d_to_plane(dense, scale) if s2d else dense)

            # Matching-score temperature (config.py ModelConfig.match_temp):
            # scores are ref.tar dot products, so scaling the query features
            # scales every score — the Pallas/XLA kernels stay byte-identical
            # and the gradient reaches the (optional) learned log-temperature
            # through the matching custom_vjp's dRef.
            temp = None
            if cfg.match_temp_learned:
                import numpy as _np
                logt = self.param(f"match_logt_{stage - 1}",
                                  lambda key: jnp.asarray(
                                      _np.log(cfg.match_temp), jnp.float32))
                temp = jnp.exp(logt)
            elif cfg.match_temp != 1.0:
                temp = jnp.asarray(cfg.match_temp, jnp.float32)

            # prior-windowed matching (config.py match_window): the scan is
            # restricted around the detached dense prediction; the window
            # shrinks with the stage's disparity downscaling
            win = 0
            center = None
            if cfg.match_window > 0:
                down = scale ** (ns - 1 - stage)
                win = max(2, round(cfg.match_window / down))
                dense_plane = s2d_to_plane(dense, scale) if s2d else dense
                center = jax.lax.stop_gradient(
                    dense_plane.astype(jnp.float32))

            # candidate availability: 1 where the (windowed) band holds a
            # right detail pixel — elsewhere the kernels emit the
            # eps-sentinel 1.0
            if win > 0:
                cand = candidate_availability_windowed(rmask, cur_max_disp,
                                                       center, win)
            else:
                cand = candidate_availability(rmask, cur_max_disp)
            out["cand"].append(cand)

            # one banded-softmax pass yields both the sparse disparity and its
            # variance (SpaMat + SpaVar fused; variance under stop_gradient
            # as in the reference's no_grad block)
            if s2d:
                q = lf_rows if temp is None else \
                    (lf_rows.astype(jnp.float32) * temp).astype(lf_rows.dtype)
                if win > 0:
                    sparse_full, var_full = \
                        sparse_matching_with_var_rows_windowed(
                            q, rf_rows, lmask, rmask, center, cur_max_disp,
                            win, cfg.matching_impl)
                else:
                    sparse_full, var_full = sparse_matching_with_var_rows(
                        q, rf_rows, lmask, rmask, cur_max_disp,
                        cfg.matching_impl)
                var_full = jax.lax.stop_gradient(var_full)
                sparse = plane_to_s2d(sparse_full, scale)
                var = plane_to_s2d(var_full, scale)
                out["sparse_raw"].append(sparse_full)
                if cfg.cand_fallback:
                    cand_s2d = plane_to_s2d(cand, scale)
                    sparse = jnp.where(cand_s2d > 0, sparse, dense)
                    sparse_full = s2d_to_plane(sparse, scale)
                out["sparse"].append(sparse_full)
                out["var"].append(var_full)
            else:
                q = lf if temp is None else \
                    (lf.astype(jnp.float32) * temp).astype(lf.dtype)
                if win > 0:
                    sparse, var = sparse_matching_with_var_windowed(
                        q, rf, lmask, rmask, center, cur_max_disp, win,
                        cfg.matching_impl)
                else:
                    sparse, var = sparse_matching_with_var(
                        q, rf, lmask, rmask, cur_max_disp,
                        cfg.matching_impl)
                var = jax.lax.stop_gradient(var)
                out["sparse_raw"].append(sparse)
                if cfg.cand_fallback:
                    sparse = jnp.where(cand > 0, sparse, dense)
                out["sparse"].append(sparse)
                out["var"].append(var)

            # packed twins keep the faithful stage's widths and receptive
            # fields exactly (models/repack.py maps faithful weights on):
            # SoftAttention's hidden width is base_channels at EVERY stage
            # (submodule.py:593-604); Refinement's is the stage's channels
            stage_ch = cfg.base_channels * scale ** (ns - 1 - stage)
            if s2d:
                soft = SoftAttentionS2D(scale,
                                        hidden=scale * scale
                                        * cfg.base_channels,
                                        dtype=dtype,
                                        name=f"soft_att_{stage - 1}")(
                    lf, [dense, sparse, lmask_s2d, -var], train=train)
                out["soft_mask"].append(s2d_to_plane(soft, scale))
            else:
                att_in = layers_lib.maybe_concat([
                    lf,
                    dense[..., None].astype(dtype),
                    sparse[..., None].astype(dtype),
                    lmask[..., None].astype(dtype),
                    (-var)[..., None].astype(dtype)])
                soft = SoftAttention(cfg.base_channels, dtype=dtype,
                                     name=f"soft_att_{stage - 1}")(
                    att_in, train=train)
                out["soft_mask"].append(soft)

            if ablate_sparse:
                # ablation eval: pretend the sparse branch doesn't exist so
                # its contribution to final accuracy is measurable
                # (scripts/report_eval.py --ablate_sparse)
                fused = dense
            else:
                fused = dense * (1.0 - soft) + soft * sparse
            out["fusion"].append(s2d_to_plane(fused, scale) if s2d else fused)

            if s2d:
                from decnet_tpu.models.repack import packed_geometry
                ds = Refinement._DILATIONS[stage]
                kern, dil = [3] * 7, [1] * 7
                for ci, d in zip((0, 2, 4), ds):
                    kern[ci], dil[ci] = packed_geometry(d, scale)
                pred_s2d, residual_s2d = RefinementS2D(
                    scale, hidden=scale * scale * stage_ch,
                    kernels=tuple(kern), dilations=tuple(dil),
                    dtype=dtype, name=f"refine_{stage - 1}")(
                    lf, rf_rows, fused, s2d_to_plane(fused, scale),
                    train=train, max_disp=cur_max_disp)
                pred = s2d_to_plane(pred_s2d, scale)
                residual = s2d_to_plane(residual_s2d, scale)
            else:
                pred, residual = Refinement(
                    lf.shape[-1], stage_id=stage,
                    dtype=dtype, name=f"refine_{stage - 1}")(
                    lf, rf, fused, train=train, max_disp=cur_max_disp)
            out["residual"].append(residual)
            out["preds"].append(pred)

        return out
