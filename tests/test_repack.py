"""Exact s2d repacking of faithful weights (decnet_tpu/models/repack.py).

The s2d model variant's structure is the exact packed twin of the faithful
(reference-form, modules/submodule.py) graph; repack_faithful_to_s2d maps a
faithful variables pytree onto it so the s2d execution reproduces the
faithful numbers at inference.  These tests pin (a) the kernel-level packing
identities and (b) full-model forward equality, which is what lets bench.py /
eval / demo run reference checkpoints at s2d throughput."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from decnet_tpu.config import ModelConfig
from decnet_tpu.models import get_model
from decnet_tpu.models.repack import (pack_conv3x3, pack_conv3x3_stride,
                                      pack_conv1x1, deconv_to_1x1,
                                      concat_blocks_perm, unfold_to_s2d_perm,
                                      repack_faithful_to_s2d)
from decnet_tpu.nn.layers import space_to_depth, depth_to_space


def _conv(x, K, dilation=1, stride=1, padding=None):
    d = dilation
    p = padding if padding is not None else d
    return jax.lax.conv_general_dilated(
        x, K, window_strides=(stride, stride), padding=((p, p), (p, p)),
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("dilation", [1, 2, 3, 4, 6, 9])
def test_pack_conv3x3_matches_full_res(dilation):
    from decnet_tpu.models.repack import packed_geometry
    r, Cin, Cout = 3, 4, 5
    rng = np.random.RandomState(0)
    x = rng.randn(2, 18, 27, Cin).astype(np.float32)
    K = rng.randn(3, 3, Cin, Cout).astype(np.float32)
    y = _conv(jnp.asarray(x), jnp.asarray(K), dilation=dilation)
    KP = pack_conv3x3(K, r, dilation)
    E, pd = packed_geometry(dilation, r)
    assert KP.shape[:2] == (E, E)
    yp = _conv(space_to_depth(jnp.asarray(x), r), jnp.asarray(KP),
               dilation=pd, padding=pd * (E - 1) // 2)
    np.testing.assert_allclose(np.asarray(depth_to_space(yp, r)),
                               np.asarray(y), rtol=1e-5, atol=1e-5)


def test_pack_conv3x3_stride():
    r, Cin, Cout = 3, 4, 5
    rng = np.random.RandomState(1)
    x = rng.randn(2, 18, 27, Cin).astype(np.float32)
    K = rng.randn(3, 3, Cin, Cout).astype(np.float32)
    y = _conv(jnp.asarray(x), jnp.asarray(K), stride=r, padding=1)
    KP = pack_conv3x3_stride(K, r)
    yp = _conv(space_to_depth(jnp.asarray(x), r), jnp.asarray(KP), padding=1)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y),
                               rtol=1e-5, atol=1e-5)


def test_pack_conv1x1_and_deconv():
    r, Cin, Cout = 3, 4, 5
    rng = np.random.RandomState(2)
    x = rng.randn(2, 18, 27, Cin).astype(np.float32)
    K1 = rng.randn(1, 1, Cin, Cout).astype(np.float32)
    y = _conv(jnp.asarray(x), jnp.asarray(K1), padding=0)
    yp = _conv(space_to_depth(jnp.asarray(x), r),
               jnp.asarray(pack_conv1x1(K1, r)), padding=0)
    np.testing.assert_allclose(np.asarray(depth_to_space(yp, r)),
                               np.asarray(y), rtol=1e-5, atol=1e-5)

    # k=r/s=r transpose conv == 1x1 conv to the s2d form
    Kt = rng.randn(r, r, Cin, Cout).astype(np.float32)
    xs = rng.randn(2, 6, 9, Cin).astype(np.float32)
    from decnet_tpu.ops import spmd_conv
    pad = tuple(spmd_conv.conv_transpose_padding(r, r, "VALID")
                for _ in range(2))
    y = jax.lax.conv_general_dilated(
        jnp.asarray(xs), jnp.asarray(Kt), window_strides=(1, 1),
        padding=pad, lhs_dilation=(r, r),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yp = _conv(jnp.asarray(xs), jnp.asarray(deconv_to_1x1(Kt, r)), padding=0)
    np.testing.assert_allclose(np.asarray(depth_to_space(yp, r)),
                               np.asarray(y), rtol=1e-5, atol=1e-5)


def test_concat_blocks_perm_roundtrip():
    r = 3
    rng = np.random.RandomState(3)
    x1 = rng.randn(1, 9, 9, 4).astype(np.float32)
    x2 = rng.randn(1, 9, 9, 2).astype(np.float32)
    interleaved = space_to_depth(jnp.concatenate([jnp.asarray(x1),
                                                  jnp.asarray(x2)], -1), r)
    blocks = jnp.concatenate([space_to_depth(jnp.asarray(x1), r),
                              space_to_depth(jnp.asarray(x2), r)], -1)
    perm = concat_blocks_perm([4, 2], r)
    np.testing.assert_array_equal(np.asarray(interleaved)[..., perm]
                                  if False else
                                  np.asarray(interleaved)[:, :, :, perm],
                                  np.asarray(blocks))


def _rand_like(tree, rng):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.2),
        tree)


@pytest.mark.parametrize("use_detail,stages", [(False, 1), (True, 1),
                                               (False, 2), (True, 2)])
def test_full_model_repack_equality(use_detail, stages):
    """Faithful forward == s2d forward with repacked weights (inference)."""
    cfg_f = ModelConfig(max_disp=54, base_channels=4, num_stage=4,
                        down_scale=3, cost_func="cor", use_detail=use_detail,
                        thold=0.5, dtype="float32", matching_impl="xla",
                        s2d_fine=False)
    cfg_s = ModelConfig(**{**cfg_f.__dict__, "s2d_fine": True,
                           "s2d_stages": stages})
    mf = get_model("decnet", cfg_f)
    ms = get_model("decnet", cfg_s)
    rng = np.random.RandomState(0)
    B, H, W = 2, 54, 54
    left = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    masks = [jnp.asarray((rng.rand(B, H // s, W // s) < 0.5)
                         .astype(np.float32)) for s in (9, 3, 1)]
    rmasks = [jnp.asarray((rng.rand(B, H // s, W // s) < 0.5)
                          .astype(np.float32)) for s in (9, 3, 1)]

    vf = mf.init(jax.random.PRNGKey(0), left, right, masks, rmasks)
    # randomise every parameter and BN statistic so a wrong mapping cannot
    # hide behind zeros/ones initialisers
    prng = np.random.RandomState(7)
    vf = {"params": _rand_like(vf["params"], prng),
          "batch_stats": jax.tree_util.tree_map(
              lambda a: jnp.asarray(
                  np.abs(prng.randn(*a.shape)).astype(np.float32) + 0.5),
              vf["batch_stats"])}

    vs = repack_faithful_to_s2d(vf, cfg_f, stages=stages)

    # the repacked tree must be structurally identical to a fresh s2d init
    vs_ref = ms.init(jax.random.PRNGKey(1), left, right, masks, rmasks)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, vs_ref)
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, vs)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    assert ref_shapes == got_shapes

    of = mf.apply(vf, left, right, masks, rmasks, train=False)
    os_ = ms.apply(vs, left, right, masks, rmasks, train=False)
    for key in ("preds", "dense", "sparse", "fusion", "soft_mask"):
        for a, b in zip(of[key], os_[key]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)


def test_s2d_checkpoint_stage2_upgrade():
    """An s2d_stages=1 tree (stage-2 heads still NHWC) upgrades to the
    stage-2-packed graph via s2d_exec(stages=2) with identical outputs."""
    from decnet_tpu.models.repack import s2d_exec
    cfg1 = ModelConfig(max_disp=54, base_channels=4, num_stage=4,
                       down_scale=3, cost_func="cor", use_detail=False,
                       dtype="float32", matching_impl="xla",
                       s2d_fine=True, s2d_stages=1)
    m1 = get_model("decnet", cfg1)
    rng = np.random.RandomState(0)
    B, H, W = 1, 54, 54
    left = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    masks = [jnp.asarray((rng.rand(B, H // s, W // s) < 0.5)
                         .astype(np.float32)) for s in (9, 3, 1)]
    v1 = m1.init(jax.random.PRNGKey(0), left, right, masks, masks)
    prng = np.random.RandomState(9)
    v1 = {"params": _rand_like(v1["params"], prng),
          "batch_stats": jax.tree_util.tree_map(
              lambda a: jnp.asarray(
                  np.abs(prng.randn(*a.shape)).astype(np.float32) + 0.5),
              v1["batch_stats"])}
    m2, v2 = s2d_exec(v1, cfg1, stages=2)
    o1 = m1.apply(v1, left, right, masks, masks, train=False)
    o2 = m2.apply(v2, left, right, masks, masks, train=False)
    for a, b in zip(o1["preds"], o2["preds"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_repack_linear_matches_and_differentiates(rng):
    """repack_linear: the differentiable repack reproduces
    repack_faithful_to_s2d exactly, the packed forward matches the faithful
    forward, and gradients w.r.t. the FAITHFUL parameters taken through the
    packed graph match the faithful graph's gradients (training-mode
    repack for freeze_bn configurations — layout is not semantics, even
    for training)."""
    import jax
    import jax.numpy as jnp
    from decnet_tpu.config import ModelConfig
    from decnet_tpu.models import get_model
    from decnet_tpu.models.repack import (repack_faithful_to_s2d,
                                          repack_linear)

    cfg = ModelConfig(max_disp=27, base_channels=4, num_stage=4,
                      down_scale=3, use_detail=False, dtype="float32",
                      matching_impl="xla")
    model_f = get_model("decnet", cfg)
    B, H, W = 1, 54, 81
    left = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    right = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    masks = [jnp.asarray((rng.rand(B, H // s, W // s) < 0.4)
                         .astype(np.float32)) for s in (9, 3, 1)]
    gt = jnp.asarray((rng.rand(B, H, W) * 20).astype(np.float32))
    variables = model_f.init(jax.random.PRNGKey(0), left, right, masks,
                             masks)

    model_s, apply_fn = repack_linear(variables, cfg, stages=2)
    # the gather-map reproduction is exact
    ref = repack_faithful_to_s2d(variables, cfg, stages=2)
    got = apply_fn(variables)
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b))

    def loss_through(model, vs):
        out = model.apply(vs, left, right, masks, masks, train=False)
        return sum(jnp.abs(p - gt[:, ::gt.shape[1] // p.shape[1],
                                  ::gt.shape[2] // p.shape[2]]
                           / (gt.shape[1] // p.shape[1])).mean()
                   for p in out["preds"])

    def loss_faithful(params):
        return loss_through(model_f, {"params": params,
                                      "batch_stats":
                                      variables["batch_stats"]})

    def loss_packed(params):
        return loss_through(model_s, apply_fn(
            {"params": params, "batch_stats": variables["batch_stats"]}))

    lf, gf = jax.value_and_grad(loss_faithful)(variables["params"])
    lp, gp = jax.value_and_grad(loss_packed)(variables["params"])
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_p = jax.tree_util.tree_leaves(gp)
    assert len(flat_f) == len(flat_p)
    for a, b in zip(flat_f, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
