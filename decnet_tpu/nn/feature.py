"""Shared-weight feature pyramid UNet (reference FeatExtNetChannelPlus,
modules/submodule.py:209-343).

Encoder: conv0 (C, full res) -> conv1 (3C, 1/3) -> conv2 (9C, 1/9) ->
conv3 (27C, 1/27) with an ASPP context branch fused by 1x1.  Decoder: three
deconv blocks (stride-3 transpose conv + skip concat + 2 convs).  Outputs a
dict {"stage0": coarsest (1/27, 27C), ..., "stage3": full res (C)}.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.sharding import PartitionSpec as P

from decnet_tpu.nn.layers import ConvUnit, DeconvUnit, space_to_depth
from decnet_tpu.parallel import mesh as mesh_lib


class ASPP(nn.Module):
    """Atrous spatial pyramid (submodule.py:225-241): 1x1 conv + 3x3 convs at
    the given dilation rates, channel-concatenated."""
    features: int
    rates: Sequence[int] = (4, 8, 12)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        outs = [ConvUnit(self.features, 1, padding=0, dtype=self.dtype,
                         name="c0")(x, train=train)]
        for i, r in enumerate(self.rates):
            outs.append(ConvUnit(self.features, 3, dilation=r, padding=r,
                                 dtype=self.dtype,
                                 name=f"c{i + 1}")(x, train=train))
        return jnp.concatenate(outs, axis=-1)


class DeconvBlock(nn.Module):
    """Stride-3 upsample + skip fusion (submodule.py:162-179)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_skip, x, *, train: bool = False):
        x_up = DeconvUnit(self.features, 3, 3, dtype=self.dtype,
                          name="deconv")(x, train=train)
        y = jnp.concatenate([x_up, x_skip], axis=-1)
        y = ConvUnit(self.features, 3, padding=1, dtype=self.dtype,
                     name="conv_0")(y, train=train)
        y = ConvUnit(self.features, 3, padding=1, dtype=self.dtype,
                     name="conv_1")(y, train=train)
        return y


class FeatureExtractor(nn.Module):
    """4-scale pyramid; `out_channels` is coarse->fine [27C, 9C, 3C, C].

    s2d_last: run the full-resolution level in space-to-depth form — the
    image is s2d'd to (H/s, W/s, s*s*3) and "stage{ns-1}" is emitted as
    (H/s, W/s, s*s*C) whose channel slices (i*s+j)*C:(i*s+j+1)*C serve as the
    per-pixel descriptors of phase (i, j) (see layers.space_to_depth).  Full-
    res C=8 convs are ~16x HBM-layout-inefficient on TPU; their s2d twins are
    near-optimal."""
    base_channels: int = 8
    num_stage: int = 4
    down_scale: int = 3
    s2d_last: bool = False
    # also emit "stage{ns-2}" (the 1/3-res level) packed to s2d form
    # (1/9-res x s*s*3C) so its heads can run layout-native too
    s2d_mid: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self):
        chans = [self.base_channels * self.down_scale ** i
                 for i in range(self.num_stage)]
        return chans[::-1]

    @nn.compact
    def __call__(self, x, *, train: bool = False) -> Dict[str, jax.Array]:
        C, s = self.base_channels, self.down_scale
        ns = self.num_stage
        outputs: Dict[str, jax.Array] = {}
        s2d = self.s2d_last and ns > 1
        C0 = C * s * s if s2d else C

        x0 = space_to_depth(x, s) if s2d else x
        conv0 = ConvUnit(C0, 3, padding=1, dtype=self.dtype,
                         name="conv0_0")(x0, train=train)
        conv0 = ConvUnit(C0, 3, padding=1, dtype=self.dtype,
                         name="conv0_1")(conv0, train=train)
        if ns == 1:
            outputs["stage0"] = conv0
            return outputs

        conv1 = ConvUnit(C * s, 3, stride=1 if s2d else s, padding=1,
                         dtype=self.dtype,
                         name="conv1_0")(conv0, train=train)
        conv1 = ConvUnit(C * s, 3, padding=1, dtype=self.dtype,
                         name="conv1_1")(conv1, train=train)
        conv1 = ConvUnit(C * s, 3, padding=1, dtype=self.dtype,
                         name="conv1_2")(conv1, train=train)
        if ns > 2:
            conv2 = ConvUnit(C * s * s, 3, stride=s, padding=1,
                             dtype=self.dtype, name="conv2_0")(conv1, train=train)
            conv2 = ConvUnit(C * s * s, 3, padding=1, dtype=self.dtype,
                             name="conv2_1")(conv2, train=train)
            conv2 = ConvUnit(C * s * s, 3, padding=1, dtype=self.dtype,
                             name="conv2_2")(conv2, train=train)
            if ns > 3:
                c27 = C * s ** 3
                # the whole 1/27 level runs spatially replicated under a mesh
                # (tile shards there are smaller than the conv halos — and the
                # SPMD partitioner mis-scales gradients of the ASPP fork in
                # that regime; see parallel/mesh.py::coarse_spec)
                conv3_1 = ConvUnit(c27, 3, stride=s, padding=1,
                                   dtype=self.dtype,
                                   name="conv3_1")(conv2, train=train)
                conv3_1 = mesh_lib.constrain(conv3_1, mesh_lib.coarse_spec())
                conv3_2 = ConvUnit(c27, 3, padding=1, dtype=self.dtype,
                                   name="conv3_2a")(conv3_1, train=train)
                conv3_2 = ConvUnit(c27, 3, padding=1, dtype=self.dtype,
                                   name="conv3_2b")(conv3_2, train=train)
                ctx = ASPP(c27, dtype=self.dtype, name="aspp")(conv3_1,
                                                               train=train)
                ctx = ConvUnit(c27, 1, padding=0, dtype=self.dtype,
                               name="ctx_fuse")(ctx, train=train)
                conv3 = ConvUnit(c27, 1, padding=0, dtype=self.dtype,
                                 name="fusion")(
                    jnp.concatenate([conv3_2, ctx], axis=-1), train=train)
                conv3 = mesh_lib.constrain(conv3, mesh_lib.coarse_spec())
                outputs["stage0"] = conv3
                skip2 = ConvUnit(C * s * s, 1, padding=0, dtype=self.dtype,
                                 name="trans2")(conv2, train=train)
                res = DeconvBlock(C * s * s, dtype=self.dtype,
                                  name="deconv3")(skip2, conv3, train=train)
                # back onto the spatial tiling for the fine levels
                res = mesh_lib.constrain(res, P("data", "tile"))
            else:
                res = conv2
            outputs[f"stage{ns - 3}"] = res
            skip1 = ConvUnit(C * s, 1, padding=0, dtype=self.dtype,
                             name="trans1")(conv1, train=train)
            res = DeconvBlock(C * s, dtype=self.dtype,
                              name="deconv2")(skip1, res, train=train)
        else:
            res = conv1
        outputs[f"stage{ns - 2}"] = (space_to_depth(res, s)
                                     if self.s2d_mid else res)
        skip0 = ConvUnit(C0, 1, padding=0, dtype=self.dtype,
                         name="trans0")(conv0, train=train)
        if s2d:
            # the stride-s transpose conv of the faithful decoder is exactly a
            # 1x1 conv to s*s*C channels in s2d space
            up = ConvUnit(C0, 1, padding=0, dtype=self.dtype,
                          name="deconv1_s2d")(res, train=train)
            y = jnp.concatenate([up, skip0], axis=-1)
            y = ConvUnit(C0, 3, padding=1, dtype=self.dtype,
                         name="deconv1_c0")(y, train=train)
            res = ConvUnit(C0, 3, padding=1, dtype=self.dtype,
                           name="deconv1_c1")(y, train=train)
        else:
            res = DeconvBlock(C, dtype=self.dtype,
                              name="deconv1")(skip0, res, train=train)
        outputs[f"stage{ns - 1}"] = res
        return outputs
