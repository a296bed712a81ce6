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
                                  space_to_depth, depth_to_space, rows_to_s2d,
                                  maybe_concat)
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
    out_s2d: bool = False        # return the s2d plane (B,H,W,r^2) unshuffled
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, disp, fine_fea, *, train: bool = False):
        B, H, W = disp.shape
        r2 = self.scale ** 2
        feats = fine_fea if self.pre_unfolded else \
            unfold_nonoverlap(fine_fea, self.scale)           # (B,H,W,C*r^2)
        inp = maybe_concat([disp[..., None], feats])
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
        res = res * self.scale
        if self.out_s2d:
            # pixel_shuffle's channel->offset map (i*r+j) equals the s2d
            # plane convention, so `res` IS the s2d form of the upsampled map
            return res
        return pixel_shuffle(res, self.scale)[..., 0]


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
        x = maybe_concat(
            [left_fea, warped, disp[..., None].astype(left_fea.dtype)])
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
    as s*s-channel s2d planes at 1/s resolution and the sigmoid mask leaves
    in the same form — same function class as SoftAttention
    (submodule.py:593-604) at ~an order of magnitude less HBM traffic, with
    no full-resolution round trips at all."""
    scale: int = 3
    hidden: int = 72
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fea_s2d, planes_s2d, *, train: bool = False):
        """fea_s2d (B,h,w,Cs2d); planes_s2d: list of (B,h,w,r*r) s2d planes
        (see layers.plane_to_s2d).  Returns the (B,h,w,r*r) sigmoid mask."""
        r = self.scale
        planes = [p.astype(self.dtype) for p in planes_s2d]
        x = maybe_concat([fea_s2d] + planes)
        x = ConvUnit(self.hidden, 3, padding=1, dtype=self.dtype,
                     name="c0")(x, train=train)
        x = ConvUnit(self.hidden, 3, padding=1, dtype=self.dtype,
                     name="c1")(x, train=train)
        x = ConvUnit(r * r, 3, padding=1, relu=False, dtype=self.dtype,
                     name="c2")(x, train=train)
        return jax.nn.sigmoid(x.astype(jnp.float32))


class RefinementS2D(nn.Module):
    """Residual refinement in s2d form (cf. Refinement stage 3,
    submodule.py:707-716): right features arrive rows-form and are warped by
    the Pallas rows kernel (no layout cost), then s2d-packed; the 7-conv head
    runs at 1/s resolution with per-conv (kernel, dilation) schedules that
    keep the faithful head's full-res receptive fields; the residual stays
    in s2d form.

    The default schedule is the packed twin of the stage-3 dilations 3/6/9
    (repack.packed_geometry: phase-diagonal, dilations 1/2/3).  The stage-2
    twin of dilations 2/4/6 is kernels (3,3,5,3,3,3,3) with dilations
    (1,1,1,1,2,1,1) — d=4 needs a 5-tap phase-mixing conv."""
    scale: int = 3
    hidden: int = 72
    kernels: Tuple[int, ...] = (3, 3, 3, 3, 3, 3, 3)
    dilations: Tuple[int, ...] = (1, 1, 2, 1, 3, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, left_s2d, right_rows, disp_s2d, disp_full, *,
                 train: bool = False, max_disp: int = 0):
        """left_s2d (B,h,w,r*r*C); right_rows (B,H,C,W) rows-form features;
        disp_s2d (B,h,w,r*r) + disp_full (B,H,W) are the same disparity in
        both layouts (the warp kernel samples along full-res rows, the conv
        head runs in s2d).  Returns (pred_s2d, residual_s2d)."""
        r = self.scale
        h = self.hidden
        if max_disp > 0 and jax.default_backend() == "tpu":
            from decnet_tpu.ops.pallas.warp import warp_rows_fast
            warped = rows_to_s2d(warp_rows_fast(right_rows, disp_full,
                                                max_disp), r)
        else:
            warped = space_to_depth(
                warp_by_disparity(right_rows.transpose(0, 1, 3, 2),
                                  disp_full), r)
        warped = warped.astype(left_s2d.dtype)
        x = maybe_concat([left_s2d, warped,
                          disp_s2d.astype(left_s2d.dtype)])
        feats = (h, h, h, h // 2, h // 2, h // 2, r * r)
        for i, (f, k, d) in enumerate(zip(feats, self.kernels,
                                          self.dilations)):
            x = ConvUnit(f, k, dilation=d, padding=d * (k - 1) // 2,
                         relu=i < 6, bn=i < 6, dtype=self.dtype,
                         name=f"c{i}")(x, train=train)
        residual_s2d = x.astype(jnp.float32)
        return disp_s2d + residual_s2d, residual_s2d


class DetailHeadS2D(nn.Module):
    """Lost-detail head in s2d form (cf. DetailHead, submodule.py:347-372):
    both branches project to s*s*3 "RGB-per-phase" planes at 1/s resolution;
    logits stay in s2d plane form (B,h,w,s*s) — callers shuffle to full res
    only where a full-res map is genuinely needed."""
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
        return x.astype(jnp.float32), c, p


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
