"""Per-stage heads: cost regularisation, dynamic upsampling, soft attention,
refinement, learned detail detection (reference modules/submodule.py:347-762).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from decnet_tpu.nn.layers import (ConvUnit, Conv3dUnit, DeconvUnit,
                                  he_fan_out, unfold_nonoverlap,
                                  unfold3x3_replicate, pixel_shuffle,
                                  space_to_depth, depth_to_space)
from decnet_tpu.ops.warp import warp_by_disparity


class CostRegNet(nn.Module):
    """3D cost aggregation at constant resolution (CostRegNetNoDown,
    submodule.py:608-662): 2 convs -> 3-conv residual block -> 3 convs ending
    1 channel.  Volume layout (B,S,H,W,C); returns (B,S,H,W)."""
    features: int
    cost_func: str = "cor"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vol, *, train: bool = False):
        f = self.features
        if self.cost_func == "cat":
            vol = nn.Conv(f, (1, 1, 1), use_bias=False, kernel_init=he_fan_out,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="conv_pre")(vol)
        x = Conv3dUnit(f, dtype=self.dtype, name="conv0_0")(vol, train=train)
        x0 = Conv3dUnit(f, dtype=self.dtype, name="conv0_1")(x, train=train)
        x = Conv3dUnit(f, dtype=self.dtype, name="conv1_0")(x0, train=train)
        x = Conv3dUnit(f, dtype=self.dtype, name="conv1_1")(x, train=train)
        x = Conv3dUnit(f, dtype=self.dtype, name="conv1_2")(x, train=train)
        x = x + x0
        x = Conv3dUnit(f, dtype=self.dtype, name="conv2_0")(x, train=train)
        x = Conv3dUnit(f, dtype=self.dtype, name="conv2_1")(x, train=train)
        x = Conv3dUnit(1, relu=False, dtype=self.dtype,
                       name="conv2_2")(x, train=train)
        return x[..., 0]


class DynamicUpsampling(nn.Module):
    """Content-aware x`scale` disparity upsampling (submodule.py:566-589):
    learn scale^2*9 softmax weights per coarse pixel from (disp, unfolded fine
    features), gather 3x3 coarse neighbourhoods, weighted-sum, pixel-shuffle,
    scale disparity values by `scale`."""
    scale: int = 3
    pre_unfolded: bool = False   # s2d features are already the 3x3 unfold
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, fine_fea, *, train: bool = False):
        B, H, W = disp.shape
        r2 = self.scale ** 2
        feats = fine_fea if self.pre_unfolded else \
            unfold_nonoverlap(fine_fea, self.scale)           # (B,H,W,C*r^2)
        inp = jnp.concatenate([disp[..., None], feats], axis=-1)
        w = ConvUnit(r2 * 9, 3, padding=1, dtype=self.dtype,
                     name="w0")(inp, train=train)
        w = ConvUnit(r2 * 9, 3, padding=1, dtype=self.dtype,
                     name="w1")(w, train=train)
        w = ConvUnit(r2 * 9, 3, padding=1, relu=False, dtype=self.dtype,
                     name="w2")(w, train=train)
        w = jax.nn.softmax(w.reshape(B, H, W, r2, 9).astype(jnp.float32),
                           axis=-1)
        content = unfold3x3_replicate(disp)                    # (B,H,W,9)
        res = jnp.einsum("bhwrk,bhwk->bhwr", w, content.astype(jnp.float32))
        up = pixel_shuffle(res, self.scale) * self.scale
        return up[..., 0]


class SoftAttention(nn.Module):
    """Dense/sparse fusion mask head (submodule.py:593-604)."""
    base_channels: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = ConvUnit(self.base_channels, 3, padding=1, dtype=self.dtype,
                     name="c0")(x, train=train)
        x = ConvUnit(self.base_channels, 3, padding=1, dtype=self.dtype,
                     name="c1")(x, train=train)
        x = ConvUnit(1, 3, padding=1, relu=False, dtype=self.dtype,
                     name="c2")(x, train=train)
        return jax.nn.sigmoid(x.astype(jnp.float32))[..., 0]


class Refinement(nn.Module):
    """Residual disparity refinement (submodule.py:666-762): warp right
    features by the current disparity, concat with left features + disparity,
    7-conv head whose dilation schedule grows with stage_id."""
    features: int
    stage_id: int = 1
    dtype: Any = jnp.float32

    _DILATIONS = {0: (1, 1, 1), 1: (1, 1, 1), 2: (2, 4, 6), 3: (3, 6, 9)}

    @nn.compact
    def __call__(self, left_fea, right_fea, disp, *, train: bool = False,
                 max_disp: int = 0):
        f = self.features
        d1, d2, d3 = self._DILATIONS[self.stage_id]
        if max_disp > 0 and jax.default_backend() == "tpu":
            # gather-free Pallas warp (the XLA gather is ~38% of the forward)
            from decnet_tpu.ops.pallas.warp import warp_by_disparity_fast
            warped = warp_by_disparity_fast(right_fea, disp, max_disp)
            warped = warped.astype(left_fea.dtype)
        else:
            warped = warp_by_disparity(right_fea, disp).astype(left_fea.dtype)
        x = jnp.concatenate(
            [left_fea, warped, disp[..., None].astype(left_fea.dtype)], axis=-1)
        x = ConvUnit(f, 3, dilation=d1, padding=d1, dtype=self.dtype,
                     name="c0")(x, train=train)
        x = ConvUnit(f, 3, padding=1, dtype=self.dtype,
                     name="c1")(x, train=train)
        x = ConvUnit(f, 3, dilation=d2, padding=d2, dtype=self.dtype,
                     name="c2")(x, train=train)
        x = ConvUnit(f // 2, 3, padding=1, dtype=self.dtype,
                     name="c3")(x, train=train)
        x = ConvUnit(f // 2, 3, dilation=d3, padding=d3, dtype=self.dtype,
                     name="c4")(x, train=train)
        x = ConvUnit(f // 2, 3, padding=1, dtype=self.dtype,
                     name="c5")(x, train=train)
        x = ConvUnit(1, 3, padding=1, relu=False, bn=False, dtype=self.dtype,
                     name="c6")(x, train=train)
        residual = x.astype(jnp.float32)[..., 0]
        return disp + residual, residual


class SoftAttentionS2D(nn.Module):
    """Fusion-mask head operating in space-to-depth form: full-res maps enter
    as s*s-channel planes at 1/s resolution, the logits leave as s*s channels
    and are shuffled back — same function class as SoftAttention
    (submodule.py:593-604) at ~an order of magnitude less HBM traffic."""
    scale: int = 3
    hidden: int = 72
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fea_s2d, maps, *, train: bool = False):
        """fea_s2d (B,h,w,Cs2d); maps: list of full-res (B,H,W) planes."""
        r = self.scale
        planes = [space_to_depth(m[..., None], r).astype(self.dtype)
                  for m in maps]
        x = jnp.concatenate([fea_s2d] + planes, axis=-1)
        x = ConvUnit(self.hidden, 3, padding=1, dtype=self.dtype,
                     name="c0")(x, train=train)
        x = ConvUnit(self.hidden, 3, padding=1, dtype=self.dtype,
                     name="c1")(x, train=train)
        x = ConvUnit(r * r, 3, padding=1, relu=False, dtype=self.dtype,
                     name="c2")(x, train=train)
        logits = depth_to_space(x.astype(jnp.float32), r)[..., 0]
        return jax.nn.sigmoid(logits)


class RefinementS2D(nn.Module):
    """Residual refinement in s2d form (cf. Refinement stage 3,
    submodule.py:707-716): the warped right features enter per-pixel (from
    the Pallas warp), are s2d-packed, and the 7-conv head runs at 1/s
    resolution with the dilation schedule divided by s (same full-res
    receptive field)."""
    scale: int = 3
    hidden: int = 72
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left_s2d, right_full, disp, *, train: bool = False,
                 max_disp: int = 0):
        r = self.scale
        h = self.hidden
        if max_disp > 0 and jax.default_backend() == "tpu":
            from decnet_tpu.ops.pallas.warp import warp_by_disparity_fast
            warped = warp_by_disparity_fast(right_full, disp, max_disp)
        else:
            warped = warp_by_disparity(right_full, disp)
        warped = space_to_depth(warped, r).astype(left_s2d.dtype)
        disp_s2d = space_to_depth(disp[..., None], r).astype(left_s2d.dtype)
        x = jnp.concatenate([left_s2d, warped, disp_s2d], axis=-1)
        x = ConvUnit(h, 3, padding=1, dtype=self.dtype,
                     name="c0")(x, train=train)
        x = ConvUnit(h, 3, padding=1, dtype=self.dtype,
                     name="c1")(x, train=train)
        x = ConvUnit(h, 3, dilation=2, padding=2, dtype=self.dtype,
                     name="c2")(x, train=train)
        x = ConvUnit(h // 2, 3, padding=1, dtype=self.dtype,
                     name="c3")(x, train=train)
        x = ConvUnit(h // 2, 3, dilation=3, padding=3, dtype=self.dtype,
                     name="c4")(x, train=train)
        x = ConvUnit(h // 2, 3, padding=1, dtype=self.dtype,
                     name="c5")(x, train=train)
        x = ConvUnit(r * r, 3, padding=1, relu=False, bn=False,
                     dtype=self.dtype, name="c6")(x, train=train)
        residual = depth_to_space(x.astype(jnp.float32), r)[..., 0]
        return disp + residual, residual


class DetailHeadS2D(nn.Module):
    """Lost-detail head in s2d form (cf. DetailHead, submodule.py:347-372):
    both branches project to s*s*3 "RGB-per-phase" planes at 1/s resolution;
    logits shuffle back to a full-res map."""
    scale: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cur_s2d, pre_fea, *, train: bool = False):
        r = self.scale
        p = ConvUnit(8 * r * r, 1, padding=0, bn=False, dtype=self.dtype,
                     name="deconv0")(pre_fea, train=train)
        p = ConvUnit(3 * r * r, 3, padding=1, relu=False, bn=True,
                     dtype=self.dtype, name="deconv1")(p, train=train)
        c = ConvUnit(8 * r * r, 3, padding=1, bn=False, dtype=self.dtype,
                     name="sub0")(cur_s2d, train=train)
        c = ConvUnit(3 * r * r, 3, padding=1, relu=False, bn=True,
                     dtype=self.dtype, name="sub1")(c, train=train)
        res = (c - p) ** 2
        x = ConvUnit(3 * r * r, 3, padding=1, relu=False, bn=True,
                     dtype=self.dtype, name="head0")(res, train=train)
        x = ConvUnit(r * r, 1, padding=0, relu=False, bn=True,
                     dtype=self.dtype, name="head1")(x, train=train)
        logits = depth_to_space(x.astype(jnp.float32), r)[..., 0]
        return logits, c, p


class DetailHead(nn.Module):
    """Learned lost-detail mask (GenerateSparseMask, submodule.py:347-372):
    deconv the coarser features, conv the finer ones, squared difference,
    2-conv head -> 1-channel logit map. Returns (logits, cur_fea, pre_fea)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cur_fea, pre_fea, *, train: bool = False):
        p = DeconvUnit(8, 3, 3, bn=False, dtype=self.dtype,
                       name="deconv0")(pre_fea, train=train)
        p = ConvUnit(3, 3, padding=1, relu=False, bn=True, dtype=self.dtype,
                     name="deconv1")(p, train=train)
        c = ConvUnit(8, 3, padding=1, bn=False, dtype=self.dtype,
                     name="sub0")(cur_fea, train=train)
        c = ConvUnit(3, 3, padding=1, relu=False, bn=True, dtype=self.dtype,
                     name="sub1")(c, train=train)
        res = (c - p) ** 2
        x = ConvUnit(3, 3, padding=1, relu=False, bn=True, dtype=self.dtype,
                     name="head0")(res, train=train)
        x = ConvUnit(1, 1, padding=0, relu=False, bn=True, dtype=self.dtype,
                     name="head1")(x, train=train)
        return x.astype(jnp.float32)[..., 0], c, p
