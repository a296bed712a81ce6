"""Exact space-to-depth repacking of faithful (reference-form) weights.

The faithful DecNet parameterisation mirrors the reference checkpoint layout
(modules/submodule.py): its full-resolution stage runs C=8 NHWC convs at
540x972, which on TPU waste ~16x HBM bandwidth on 128-lane padding (see
layers.space_to_depth).  The s2d model variant runs the same stage at 1/3
resolution with 9x the channels — and its module structure (heads
SoftAttentionS2D / RefinementS2D / DetailHeadS2D, the extractor's s2d decoder
twin) is the *exact packed twin* of the faithful graph:

  - a full-res 3x3 conv, dilation d, equals a 1/3-res 3x3 conv over the s2d
    form with a block-structured (9*Cin, 9*Cout) kernel and dilation
    d/3 (d in {3,6,9}: phase-diagonal) or 1 (d == 1: general phase mixing);
  - a stride-3 3x3 conv from full res equals a stride-1 3x3 conv on the s2d
    form (the +1 tap row is all zeros);
  - a k=3 / s=3 transpose conv (non-overlapping) equals a 1x1 conv to
    9*Cout channels in s2d space;
  - BatchNorm / bias are per-channel, so their vectors tile 9x over the
    (phase)*C + c channel layout.

This module builds the s2d variant's parameter pytree FROM a faithful
pytree such that the s2d execution is numerically identical (up to conv
summation order) at inference.  That makes the checkpoint-compatible
configuration run at the s2d variant's throughput: layout is not semantics.

Training is out of scope: packed BatchNorm would collect per-(phase,channel)
batch statistics, which is not the faithful training semantics.  Repack is an
inference/eval/serving transform (bench.py faithful variant, cli/eval,
cli/demo) — verified end-to-end by tests/test_repack.py.

Reference geometry being repacked: Conv2dUnit stacks of
modules/submodule.py:15-49, Deconv2dBlock :162-179 (extractor full-res
block), GenerateSparseMask :347-372, SoftAttention :593-604, Refinement
:666-762 (stage-3 dilations 3/6/9 -> packed 1/2/3), DynamicUpsampling
:566-589 (1/3-res already; only the unfold channel order changes).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------- kernels

def packed_geometry(d: int, r: int):
    """(packed kernel extent E, packed dilation pd) of a full-res 3-tap
    conv with dilation d over the r-packed grid: taps at {-d,0,d} land on
    packed offsets {-ceil(d/r)..ceil(d/r)}; when d is a multiple of r they
    stay phase-diagonal and compress to a 3-tap conv with dilation d/r."""
    if d > 1 and d % r == 0:
        return 3, d // r
    return 2 * ((d + r - 1) // r) + 1, 1


def pack_conv3x3(K: np.ndarray, r: int, dilation: int = 1,
                 in_perm: Optional[np.ndarray] = None) -> np.ndarray:
    """Full-res 3x3 conv kernel (3,3,Cin,Cout), dilation d, SAME padding ->
    packed s2d kernel (E,E,r*r*Cin,r*r*Cout) to be applied with dilation pd
    and padding pd*(E-1)//2, where (E, pd) = packed_geometry(d, r).
    Channel layout is interleaved: index (i*r + j)*C + c
    (== layers.space_to_depth).  `in_perm` maps the *provided* input channel
    k to the interleaved index in_perm[k] (for graphs that concatenate
    per-tensor s2d blocks instead of s2d-ing the concat)."""
    kh, kw, Cin, Cout = K.shape
    assert (kh, kw) == (3, 3)
    d = dilation
    E, pd = packed_geometry(d, r)
    c0 = (E - 1) // 2   # centre slot
    KP = np.zeros((E, E, r * r * Cin, r * r * Cout), K.dtype)
    for io in range(r):
        for jo in range(r):
            for ty in range(3):
                for tx in range(3):
                    qy, ii = divmod(io + (ty - 1) * d, r)
                    qx, jj = divmod(jo + (tx - 1) * d, r)
                    assert qy % pd == 0 and qx % pd == 0
                    KP[qy // pd + c0, qx // pd + c0,
                       (ii * r + jj) * Cin:(ii * r + jj + 1) * Cin,
                       (io * r + jo) * Cout:(io * r + jo + 1) * Cout] \
                        = K[ty, tx]
    if in_perm is not None:
        # provided input channel k carries interleaved channel in_perm[k]
        KP = KP[:, :, in_perm, :]
    return KP


def pack_conv3x3_stride(K: np.ndarray, r: int) -> np.ndarray:
    """Full-res 3x3 stride-r conv (padding 1) -> stride-1 3x3 conv on the s2d
    form, (3,3,r*r*Cin,Cout); output is NOT phase-expanded (it downsamples)."""
    kh, kw, Cin, Cout = K.shape
    assert (kh, kw) == (3, 3)
    KP = np.zeros((3, 3, r * r * Cin, Cout), K.dtype)
    for ty in range(3):
        for tx in range(3):
            qy, ii = divmod(ty - 1, r)
            qx, jj = divmod(tx - 1, r)
            KP[qy + 1, qx + 1,
               (ii * r + jj) * Cin:(ii * r + jj + 1) * Cin, :] = K[ty, tx]
    return KP


def pack_conv1x1(K: np.ndarray, r: int) -> np.ndarray:
    """1x1 conv -> phase-diagonal 1x1 conv, (1,1,r*r*Cin,r*r*Cout)."""
    _, _, Cin, Cout = K.shape
    KP = np.zeros((1, 1, r * r * Cin, r * r * Cout), K.dtype)
    for p in range(r * r):
        KP[0, 0, p * Cin:(p + 1) * Cin, p * Cout:(p + 1) * Cout] = K[0, 0]
    return KP


def deconv_to_1x1(K: np.ndarray, r: int) -> np.ndarray:
    """k=r / s=r transpose-conv kernel (r,r,Cin,Cout) (layers.DeconvUnit:
    conv_general_dilated with lhs_dilation=r and transpose padding, which
    correlates, so output phase (i,j) sees kernel tap (r-1-i, r-1-j)) ->
    1x1 conv (1,1,Cin,r*r*Cout) emitting the s2d form of the upsampled map
    (non-overlapping taps)."""
    kh, kw, Cin, Cout = K.shape
    assert (kh, kw) == (r, r)
    KP = np.zeros((1, 1, Cin, r * r * Cout), K.dtype)
    for i in range(r):
        for j in range(r):
            KP[0, 0, :, (i * r + j) * Cout:(i * r + j + 1) * Cout] = \
                K[r - 1 - i, r - 1 - j]
    return KP


def tile_vec(v: np.ndarray, r: int) -> np.ndarray:
    """Per-channel vector (C,) -> (r*r*C,) over the (phase)*C + c layout."""
    return np.tile(v, r * r)


def concat_blocks_perm(channels: Sequence[int], r: int) -> np.ndarray:
    """Perm for graphs providing concat([s2d(x1), s2d(x2), ...]) (per-tensor
    blocks) to a kernel packed for s2d(concat([x1, x2, ...])) (interleaved).
    Returns in_perm with in_perm[provided_idx] = interleaved_idx."""
    Ctot = int(np.sum(channels))
    perm = np.zeros(r * r * Ctot, np.int64)
    base = 0
    off = 0
    for C in channels:
        for p in range(r * r):
            for c in range(C):
                perm[base + p * C + c] = p * Ctot + off + c
        base += r * r * C
        off += C
    return perm


def unfold_to_s2d_perm(C: int, r: int, lead: int = 0) -> np.ndarray:
    """Perm for DynamicUpsampling w0: the faithful graph feeds
    concat([disp(lead ch), unfold_nonoverlap(fea)]) with torch channel-major
    patch order (c*r*r + p); the s2d graph feeds concat([disp, s2d(fea)])
    with order (p*C + c).  Returns in_perm[provided] = faithful index."""
    perm = np.arange(lead + r * r * C, dtype=np.int64)
    for p in range(r * r):
        for c in range(C):
            perm[lead + p * C + c] = lead + c * r * r + p
    return perm


# ---------------------------------------------------------------- tree ops

def _get(tree: Dict, path: Sequence[str]):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree: Dict, path: Sequence[str], value):
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def _del(tree: Dict, path: Sequence[str]):
    for k in path[:-1]:
        tree = tree[k]
    del tree[path[-1]]


def _to_np(tree):
    return {k: _to_np(v) if isinstance(v, dict) else np.asarray(v)
            for k, v in tree.items()}


class _Repacker:
    """Transforms one faithful variables pytree into the s2d twin's."""

    def __init__(self, variables, r: int):
        self.r = r
        self.params = _to_np(variables["params"])
        self.stats = _to_np(variables.get("batch_stats", {}))

    # each helper edits self.params/self.stats in place -------------------

    def _unit(self, path: List[str], conv="Conv_0"):
        p = _get(self.params, path)
        s = None
        try:
            s = _get(self.stats, path)
        except KeyError:
            pass
        return p, s

    def conv_unit(self, path: List[str], kind: str, dilation: int = 1,
                  in_perm: Optional[np.ndarray] = None,
                  rename: Optional[List[str]] = None,
                  src_conv: str = "Conv_0"):
        """Repack one ConvUnit/DeconvUnit in place (or move it to `rename`).
        kind: one of pack33 | pack33_stride | pack11 | deconv11 | perm_only."""
        r = self.r
        p, s = self._unit(path)
        conv = p[src_conv]
        K = conv["kernel"]
        if kind == "pack33":
            K2 = pack_conv3x3(K, r, dilation, in_perm)
        elif kind == "pack33_stride":
            K2 = pack_conv3x3_stride(K, r)
        elif kind == "pack11":
            K2 = pack_conv1x1(K, r)
        elif kind == "deconv11":
            K2 = deconv_to_1x1(K, r)
        elif kind == "perm_only":
            K2 = K[:, :, in_perm, :]
        else:
            raise ValueError(kind)
        out = {"Conv_0": {"kernel": K2}}
        expand_out = kind in ("pack33", "pack11", "deconv11")
        if "bias" in conv:
            out["Conv_0"]["bias"] = tile_vec(conv["bias"], r) \
                if expand_out else conv["bias"]
        if "BatchNorm_0" in p:
            bn = p["BatchNorm_0"]
            out["BatchNorm_0"] = {
                k: (tile_vec(v, r) if expand_out else v)
                for k, v in bn.items()}
        dst = rename or path
        _del(self.params, path)
        _set(self.params, dst, out)
        if s is not None and "BatchNorm_0" in s:
            st = {"BatchNorm_0": {
                k: (tile_vec(v, r) if expand_out else v)
                for k, v in s["BatchNorm_0"].items()}}
            _del(self.stats, path)
            _set(self.stats, dst, st)

    def result(self):
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out


def _repack_stage_heads(rp: "_Repacker", stage: int, C: int,
                        dils: Sequence[int]):
    """Repack one fine stage's heads (dyn_up/soft_att/refine/detail, list
    index stage-1) from faithful NHWC form onto the packed S2D twins.
    C = the stage's faithful channel count; dils = the stage's Refinement
    dilation schedule (Refinement._DILATIONS[stage])."""
    r = rp.r
    hid = stage - 1
    rp.conv_unit([f"dyn_up_{hid}", "w0"], "perm_only",
                 in_perm=unfold_to_s2d_perm(C, r, lead=1))
    sa = f"soft_att_{hid}"
    rp.conv_unit([sa, "c0"], "pack33",
                 in_perm=concat_blocks_perm([C, 1, 1, 1, 1], r))
    rp.conv_unit([sa, "c1"], "pack33")
    rp.conv_unit([sa, "c2"], "pack33")
    rf = f"refine_{hid}"
    d1, d2, d3 = dils
    rp.conv_unit([rf, "c0"], "pack33", dilation=d1,
                 in_perm=concat_blocks_perm([C, C, 1], r))
    rp.conv_unit([rf, "c1"], "pack33")
    rp.conv_unit([rf, "c2"], "pack33", dilation=d2)
    rp.conv_unit([rf, "c3"], "pack33")
    rp.conv_unit([rf, "c4"], "pack33", dilation=d3)
    rp.conv_unit([rf, "c5"], "pack33")
    rp.conv_unit([rf, "c6"], "pack33")
    dt = f"detail_{hid}"
    if dt in rp.params:
        rp.conv_unit([dt, "deconv0"], "deconv11",
                     src_conv="ConvTranspose_0")
        rp.conv_unit([dt, "deconv1"], "pack33")
        rp.conv_unit([dt, "sub0"], "pack33")
        rp.conv_unit([dt, "sub1"], "pack33")
        rp.conv_unit([dt, "head0"], "pack33")
        rp.conv_unit([dt, "head1"], "pack11")


def repack_faithful_to_s2d(variables, cfg, stages: int = 1) -> Dict:
    """Faithful (s2d_fine=False) DecNet variables -> the exact-equivalent
    variables for the s2d variant (s2d_fine=True, s2d_stages=`stages`) of
    the same ModelConfig.  stages=2 additionally packs the 1/3-res stage's
    heads (its NHWC C=3*base convs pay ~5x lane padding).  Inference-exact
    (tests/test_repack.py); not for training (packed BN would collect
    per-phase batch statistics)."""
    from decnet_tpu.nn.heads import Refinement
    assert getattr(cfg, "norm", "bn") == "bn", "repack assumes BatchNorm"
    r = int(cfg.down_scale)
    C = int(cfg.base_channels)
    ns = int(cfg.num_stage)
    last = ns - 1          # the full-res stage index
    rp = _Repacker(variables, r)
    fe = ["feature_extractor"]

    # extractor full-res level -> s2d twin (feature.py s2d_last branch)
    rp.conv_unit(fe + ["conv0_0"], "pack33")
    rp.conv_unit(fe + ["conv0_1"], "pack33")
    rp.conv_unit(fe + ["conv1_0"], "pack33_stride")
    rp.conv_unit(fe + ["trans0"], "pack11")
    rp.conv_unit(fe + ["deconv1", "deconv"], "deconv11",
                 rename=fe + ["deconv1_s2d"], src_conv="ConvTranspose_0")
    rp.conv_unit(fe + ["deconv1", "conv_0"], "pack33",
                 in_perm=concat_blocks_perm([C, C], r),
                 rename=fe + ["deconv1_c0"])
    rp.conv_unit(fe + ["deconv1", "conv_1"], "pack33",
                 rename=fe + ["deconv1_c1"])
    _del(rp.params, fe + ["deconv1"])
    try:
        _del(rp.stats, fe + ["deconv1"])
    except KeyError:
        pass

    _repack_stage_heads(rp, last, C, Refinement._DILATIONS[last])
    if stages >= 2:
        repack_stage2_heads(rp, cfg)
    return rp.result()


def repack_stage2_heads(rp: "_Repacker", cfg):
    """Pack the 1/3-res stage's heads in place (usable on a faithful tree,
    inside repack_faithful_to_s2d, OR on an s2d_stages=1 tree whose stage-2
    heads are still NHWC — the module parameters are identical).  The
    extractor needs no weight change: s2d_mid packing is a pure reshape."""
    from decnet_tpu.nn.heads import Refinement
    ns = int(cfg.num_stage)
    stage = ns - 2
    C = int(cfg.base_channels) * int(cfg.down_scale) ** (ns - 1 - stage)
    _repack_stage_heads(rp, stage, C, Refinement._DILATIONS[stage])


def s2d_exec(variables, cfg_model, stages: int = 1):
    """(model, variables) for the exact s2d execution of a checkpoint:
    same weights, same outputs (tests/test_repack.py), s2d throughput.

    - faithful cfg (s2d_fine=False): full repack (+ stage-2 when stages=2)
    - s2d cfg (s2d_fine=True, s2d_stages=1) with stages=2: packs only the
      stage-2 heads (they are faithful-form in that graph)"""
    from decnet_tpu.config import ModelConfig
    from decnet_tpu.models import get_model
    cfg_s = ModelConfig(**{**cfg_model.__dict__, "s2d_fine": True,
                           "s2d_stages": stages})
    if cfg_model.s2d_fine:
        assert getattr(cfg_model, "s2d_stages", 1) == 1 and stages == 2, \
            "s2d checkpoint: only the stage-2-packing upgrade applies"
        rp = _Repacker(variables, int(cfg_model.down_scale))
        repack_stage2_heads(rp, cfg_model)
        return get_model(cfg_model.arch, cfg_s), rp.result()
    return (get_model(cfg_model.arch, cfg_s),
            repack_faithful_to_s2d(variables, cfg_model, stages))


def repack_linear(variables, cfg_model, stages: int = 1):
    """jax-DIFFERENTIABLE twin of :func:`repack_faithful_to_s2d`.

    Every repack transform is a pure copy/tile/permutation of faithful
    weight entries (no arithmetic), i.e. the whole tree transform is one
    gather from the flattened faithful leaves.  Running the numpy repacker
    ONCE on unique-index arrays yields that gather map; the returned
    function applies it with jnp ops, so `jax.grad` flows through it
    exactly (the VJP of a gather is a scatter-add back onto the faithful
    parameters).

    This is what makes **training-mode repack** possible for configurations
    without live batch statistics (freeze_bn fine-tunes): train faithful
    -form parameters while executing the packed s2d graph — the faithful
    NHWC training tax disappears, and the optimizer state/checkpoint stay
    in the reference-compatible layout.  (Batch-stat training remains out
    of scope: a packed BN would collect per-phase statistics,
    repack.py:26-29.)

    Returns (s2d_model, apply_fn) where apply_fn(variables) -> s2d
    variables, differentiable.
    """
    import jax
    import jax.numpy as jnp
    from decnet_tpu.config import ModelConfig
    from decnet_tpu.models import get_model

    leaves, treedef = jax.tree_util.tree_flatten(variables)
    idx_leaves, off = [], 1          # 0 = structural zero
    for leaf in leaves:
        n = int(np.prod(np.shape(leaf))) or 1
        idx_leaves.append(np.arange(off, off + n,
                                    dtype=np.int64).reshape(np.shape(leaf)))
        off += n
    idx_tree = jax.tree_util.tree_unflatten(treedef, idx_leaves)
    out_idx = repack_faithful_to_s2d(idx_tree, cfg_model, stages=stages)
    out_leaves, out_def = jax.tree_util.tree_flatten(out_idx)
    out_leaves = [np.asarray(i) for i in out_leaves]

    def apply_fn(variables):
        flat = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32)]
            + [jnp.ravel(l).astype(jnp.float32)
               for l in jax.tree_util.tree_leaves(variables)])
        return jax.tree_util.tree_unflatten(
            out_def, [flat[jnp.asarray(i)] for i in out_leaves])

    cfg_s = ModelConfig(**{**cfg_model.__dict__, "s2d_fine": True,
                           "s2d_stages": stages})
    return get_model(cfg_model.arch, cfg_s), apply_fn
