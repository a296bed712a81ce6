"""Conv/norm building blocks (flax.linen), NHWC/NDHWC, bf16-friendly.

TPU-native equivalents of the reference conv units (modules/submodule.py:15-179).
Weight init matches the reference He-normal fan-out scheme
(SparseDenseNetRefinementMask.py:239-257); BatchNorm uses torch conventions
(momentum 0.1 -> flax momentum 0.9, eps 1e-5) and is synchronous by
construction: under jit+GSPMD, batch statistics are global means over the
sharded batch axis, which subsumes the reference's SyncBN machinery
(modules/sync_batchnorm/, 743 LoC) with zero extra code.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import contextlib
import contextvars

import jax
import jax.numpy as jnp
import flax.linen as nn

from decnet_tpu.ops import spmd_conv

# Trace-time normalisation override for the whole conv-unit family.  BatchNorm
# is the reference behaviour (and what checkpoints expect); "gn" swaps every
# unit's BN for GroupNorm (8 channels/group) — no batch statistics, so
# train==eval normalisation by construction.  Used by the model when
# ModelConfig.norm == "gn" (the BN train/eval-gap root-cause ablation,
# docs/training.md).
_NORM_OVERRIDE = contextvars.ContextVar("decnet_norm_override", default="bn")


@contextlib.contextmanager
def norm_override(norm: str):
    assert norm in ("bn", "gn"), norm
    tok = _NORM_OVERRIDE.set(norm)
    try:
        yield
    finally:
        _NORM_OVERRIDE.reset(tok)


# Execution strategy for 3x3x3 Conv3d (the stage-0 cost regulariser — the
# single largest FLOPs block, ~46% of the model).  "xla3d" is the stock
# lowering; "shift2d" decomposes the 3D conv into kernel-depth 2D convs over
# S-shifted slices with S folded into batch (identical math and params; the
# MXU sees plain well-shaped 2D convolutions).  Set per-model from
# ModelConfig.conv3d_impl; A/B-measured on chip before changing the default.
_CONV3D_IMPL = contextvars.ContextVar("decnet_conv3d_impl", default="xla3d")


@contextlib.contextmanager
def conv3d_impl(impl: str):
    assert impl in ("xla3d", "shift2d"), impl
    tok = _CONV3D_IMPL.set(impl)
    try:
        yield
    finally:
        _CONV3D_IMPL.reset(tok)


# Whether head-input concatenations feed the first conv as a tuple (PConv
# split-kernel execution — the concatenated tensor never hits HBM) or as a
# materialised jnp.concatenate.  Params identical either way.  Set from
# ModelConfig.split_concat.
_SPLIT_CONCAT = contextvars.ContextVar("decnet_split_concat", default=False)


@contextlib.contextmanager
def split_concat(on: bool):
    tok = _SPLIT_CONCAT.set(bool(on))
    try:
        yield
    finally:
        _SPLIT_CONCAT.reset(tok)


def maybe_concat(parts):
    """Channel concat for a head's first conv: a real concatenate, or the
    tuple form PConv executes with a sliced kernel (see _SPLIT_CONCAT)."""
    if _SPLIT_CONCAT.get():
        return tuple(parts)
    return jnp.concatenate(parts, axis=-1)


def _make_norm(bn: bool, gn: bool, gn_group: int, dtype):
    """The norm layer a conv unit should apply, honouring the override."""
    if bn and _NORM_OVERRIDE.get() == "gn":
        # target group size ~8: the largest divisor of C not above C//8
        def gn_layer(x, *, use_running_average):
            C = x.shape[-1]
            cap = max(1, C // 8)
            groups = max(g for g in range(1, cap + 1) if C % g == 0)
            return nn.GroupNorm(num_groups=groups, dtype=dtype,
                                param_dtype=jnp.float32,
                                name="GroupNorm_0")(x)
        return gn_layer
    if bn:
        bn_mod = FoldedBatchNorm(name="BatchNorm_0")
        return lambda x, *, use_running_average: bn_mod(
            x, use_running_average=use_running_average)
    if gn:
        def gn_layer(x, *, use_running_average):
            return nn.GroupNorm(num_groups=gn_group, dtype=dtype,
                                param_dtype=jnp.float32)(x)
        return gn_layer
    return None

# He-normal, fan_out: std = sqrt(2 / (prod(kernel) * out_features)).
he_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _pair(v, n=2):
    return tuple(v) if isinstance(v, (tuple, list)) else (v,) * n


class PConv(nn.Module):
    """nn.Conv drop-in (same param names/shapes/init/dtype rules) that routes
    through spmd_conv.conv_dk_fixed when the active mesh is in the regime
    where the stock SPMD conv kernel-gradient is mis-reduced (see
    ops/spmd_conv.py).  Instantiated with name="Conv_0" so checkpoints and
    the torch-import name map are unchanged."""
    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    padding: Tuple[Tuple[int, int], ...]
    kernel_dilation: Tuple[int, ...] = None
    lhs_dilation: Tuple[int, ...] = None
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        parts = tuple(x) if isinstance(x, (tuple, list)) else None
        cin = sum(p.shape[-1] for p in parts) if parts else x.shape[-1]
        kshape = tuple(self.kernel_size) + (cin, self.features)
        kernel = self.param("kernel", he_fan_out, kshape, jnp.float32)
        nsp = len(self.kernel_size)
        ld = tuple(self.lhs_dilation or (1,) * nsp)
        rd = tuple(self.kernel_dilation or (1,) * nsp)
        k = kernel.astype(self.dtype)

        def conv(xi, ki):
            if spmd_conv.dk_fix_needed():
                return spmd_conv.conv_dk_fixed(xi, ki, tuple(self.strides),
                                               tuple(self.padding), ld, rd)
            return jax.lax.conv_general_dilated(
                xi, ki, window_strides=self.strides, padding=self.padding,
                lhs_dilation=ld, rhs_dilation=rd,
                dimension_numbers=spmd_conv._dn(nsp))

        if parts is not None:
            # split-kernel execution of conv(concat(parts)): the kernel is
            # ONE parameter of the concatenated shape (checkpoints
            # unchanged) sliced per input, partial convs summed — the
            # concatenated activation tensor is never materialised in HBM
            y = None
            off = 0
            for p_in in parts:
                ci = p_in.shape[-1]
                ksl = jax.lax.slice_in_dim(k, off, off + ci, axis=nsp)
                off += ci
                yd = conv(p_in.astype(self.dtype), ksl)
                y = yd if y is None else y + yd
        elif nsp == 3 and _CONV3D_IMPL.get() == "shift2d" \
                and tuple(self.strides) == (1, 1, 1) \
                and ld == (1, 1, 1) and rd == (1, 1, 1) \
                and not spmd_conv.dk_fix_needed():
            y = _conv3d_shift2d(x.astype(self.dtype), k,
                                tuple(self.padding))
        else:
            y = conv(x.astype(self.dtype), k)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _conv3d_shift2d(x, k, padding):
    """3D conv (NDHWC, stride 1) as kernel-depth 2D convs over S-shifted
    slices, S folded into batch.  Identical math to the stock Conv3D
    lowering; the MXU instead sees `ks` plain (B*S, H, W, Cin)x(kh,kw,Cin,F)
    convolutions — the layout the hardware is best at."""
    (ps0, ps1), ph, pw = padding
    B, S, H, W, C = x.shape
    ks = k.shape[0]
    xp = jnp.pad(x, ((0, 0), (ps0, ps1), (0, 0), (0, 0), (0, 0)))
    s_out = xp.shape[1] - ks + 1
    y = None
    for ds in range(ks):
        xs = jax.lax.slice_in_dim(xp, ds, ds + s_out, axis=1)
        yd = jax.lax.conv_general_dilated(
            xs.reshape(B * s_out, H, W, C), k[ds], (1, 1), (ph, pw),
            dimension_numbers=spmd_conv._dn(2))
        y = yd if y is None else y + yd
    return y.reshape(B, s_out, H, W, k.shape[-1])


class FoldedBatchNorm(nn.Module):
    """Drop-in BatchNorm with the affine folded into the activation dtype.

    flax's nn.BatchNorm promotes the activations to f32 to apply the
    f32-stat affine — at bf16 that is a full f32 round trip of every
    normalised tensor (measured: one f32[8,20,32,5,216] convert pair per
    Conv3dUnit of the stage-0 cost regulariser, ~2-3 ms/fwd of pure HBM
    glue at the flagship shape).  Here (mean, var, scale, bias) fold into
    per-channel mul/ofs in f32 (tiny), which are cast ONCE to the
    activation dtype so the normalisation is a bf16 fused-multiply-add XLA
    folds into the producing conv's epilogue.

    Variable names/shapes are identical to nn.BatchNorm (params
    scale/bias, batch_stats mean/var; instantiated with name="BatchNorm_0")
    so checkpoints and the torch-import name map are unaffected; stat
    updates use the same biased-variance, `m*ra + (1-m)*new` convention.
    Batch statistics are means over all non-channel axes, so under
    jit+GSPMD they are global-batch stats (SyncBN) exactly like before.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, *, use_running_average: bool):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axes)
            var = xf.var(axes)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        ofs = bias - mean * mul
        return x * mul.astype(x.dtype) + ofs.astype(x.dtype)


class ConvUnit(nn.Module):
    """Conv2d + optional BatchNorm/GroupNorm + ReLU/LeakyReLU
    (reference Conv2dUnit, submodule.py:15-49)."""
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    relu: bool = True
    lrelu: bool = False
    bn: bool = True
    gn: bool = False
    gn_group: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        k = _pair(self.kernel_size)
        p = _pair(self.padding)
        x = PConv(self.features, k, strides=_pair(self.stride),
                  padding=((p[0], p[0]), (p[1], p[1])),
                  kernel_dilation=_pair(self.dilation),
                  use_bias=not (self.bn or self.gn),
                  dtype=self.dtype, name="Conv_0")(x)
        norm = _make_norm(self.bn, self.gn, self.gn_group, self.dtype)
        if norm is not None:
            x = norm(x, use_running_average=not train)
        if self.relu:
            x = nn.relu(x)
        if self.lrelu:
            x = nn.leaky_relu(x, negative_slope=0.1)
        return x


class DeconvUnit(nn.Module):
    """ConvTranspose2d + BN + ReLU (reference Deconv2dUnit,
    submodule.py:52-87). With kernel 3 / stride 3 / VALID padding the output
    is exactly 3x the input, matching torch ConvTranspose2d(k=3, s=3, p=0)."""
    features: int
    kernel_size: int = 3
    stride: int = 3
    relu: bool = True
    bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        k, s = _pair(self.kernel_size), _pair(self.stride)
        # ConvTranspose == conv with lhs_dilation=strides and the transpose
        # padding rule (kernel NOT flipped, HWIO — lax.conv_transpose
        # semantics, which flax nn.ConvTranspose wraps)
        x = PConv(self.features, k, strides=(1, 1),
                  padding=tuple(spmd_conv.conv_transpose_padding(ki, si,
                                                                 "VALID")
                                for ki, si in zip(k, s)),
                  kernel_dilation=(1, 1), lhs_dilation=s,
                  use_bias=not self.bn, dtype=self.dtype,
                  name="ConvTranspose_0")(x)
        norm = _make_norm(self.bn, False, 0, self.dtype)
        if norm is not None:
            x = norm(x, use_running_average=not train)
        if self.relu:
            x = nn.relu(x)
        return x


class Conv3dUnit(nn.Module):
    """Conv3d + BN + ReLU over (S,H,W) volumes, NDHWC
    (reference Conv3dUnit, submodule.py:90-123)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    relu: bool = True
    bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        p = self.padding
        x = PConv(self.features, _pair(self.kernel_size, 3),
                  strides=_pair(self.stride, 3),
                  padding=((p, p),) * 3, use_bias=not self.bn,
                  dtype=self.dtype, name="Conv_0")(x)
        norm = _make_norm(self.bn, False, 0, self.dtype)
        if norm is not None:
            x = norm(x, use_running_average=not train)
        if self.relu:
            x = nn.relu(x)
        return x


def unfold_nonoverlap(x: jax.Array, k: int) -> jax.Array:
    """F.unfold(kernel=k, stride=k) on NHWC -> (B, H/k, W/k, C*k*k) with
    torch's channel-major patch ordering (c*k*k + ki*k + kj)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // k, k, W // k, k, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # B, H/k, W/k, C, ki, kj
    return x.reshape(B, H // k, W // k, C * k * k)


def unfold3x3_replicate(x: jax.Array) -> jax.Array:
    """3x3 stride-1 neighbourhoods with replication padding on (B,H,W):
    returns (B,H,W,9) ordered (ki*3+kj) — the reference's
    F.unfold(ReplicationPad2d(1)(disp)) (submodule.py:584)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
    H, W = x.shape[1], x.shape[2]
    return jnp.stack([xp[:, i:i + H, j:j + W]
                      for i in range(3) for j in range(3)], axis=-1)


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """(B,H,W,C) -> (B,H/r,W/r,r*r*C), channel index (i*r + j)*C + c.

    TPU layout trick: full-resolution low-channel tensors (C=8 at stage 3)
    waste ~16x HBM bandwidth on 128-lane padding; their s2d form (C=72 at 1/3
    res) is near-optimally laid out. Inverse: depth_to_space."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // r, W // r, r * r * C)


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """Inverse of space_to_depth."""
    B, h, w, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, h, w, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, h * r, w * r, c)


def s2d_to_rows(x_s2d: jax.Array, r: int) -> jax.Array:
    """s2d features (B,h,w,r*r*C) -> rows-form (B, H=h*r, C, W=w*r).

    Rows-form is the native layout of the Pallas matching/warp kernels
    (W on lanes, C on sublanes).  Going there straight from the extractor's
    s2d output is ONE transpose; the naive route (depth_to_space to NHWC,
    then a per-kernel NHWC->NCW transpose) costs two passes over a tensor
    whose C=8 minor dim is 16x lane-padded — measured ~6 ms/call at the
    flagship shape."""
    B, h, w, RC = x_s2d.shape
    C = RC // (r * r)
    x = x_s2d.reshape(B, h, w, r, r, C)        # (B,h,w,i,j,C)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # (B,h,i,C,w,j)
    return x.reshape(B, h * r, C, w * r)


def rows_to_s2d(x_rows: jax.Array, r: int) -> jax.Array:
    """Inverse of s2d_to_rows: (B,H,C,W) -> (B,H/r,W/r,r*r*C)."""
    B, H, C, W = x_rows.shape
    x = x_rows.reshape(B, H // r, r, C, W // r, r)   # (B,h,i,C,w,j)
    x = x.transpose(0, 1, 4, 2, 5, 3)                # (B,h,w,i,j,C)
    return x.reshape(B, H // r, W // r, r * r * C)


def plane_to_s2d(m: jax.Array, r: int) -> jax.Array:
    """Planar map (B,H,W) -> s2d plane (B,H/r,W/r,r*r), channel i*r+j."""
    return space_to_depth(m[..., None], r)


def s2d_to_plane(p: jax.Array, r: int) -> jax.Array:
    """Inverse of plane_to_s2d: (B,h,w,r*r) -> (B,h*r,w*r)."""
    return depth_to_space(p, r)[..., 0]


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """torch F.pixel_shuffle on NHWC: (B,H,W,r*r) -> (B,H*r,W*r,1), channel
    c = i*r+j lands at output offset (i, j)."""
    B, H, W, C = x.shape
    assert C == r * r
    x = x.reshape(B, H, W, r, r)
    x = x.transpose(0, 1, 3, 2, 4)             # B, H, i, W, j
    return x.reshape(B, H * r, W * r, 1)
