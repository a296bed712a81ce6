"""DecNet model: shape/finiteness goldens + loss/metric behaviour."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decnet_tpu.config import ModelConfig, LossConfig
from decnet_tpu.models import get_model
from decnet_tpu.train import loss as loss_lib
from decnet_tpu.train.metrics import epe_and_d1


def tiny_cfg(**kw):
    base = dict(max_disp=27, base_channels=4, num_stage=4, down_scale=3,
                use_detail=False, dtype="float32", matching_impl="xla")
    base.update(kw)
    return ModelConfig(**base)


def make_batch(rng, B=1, H=54, W=81, num_stage=4, scale=3):
    left = rng.rand(B, H, W, 3).astype(np.float32)
    right = rng.rand(B, H, W, 3).astype(np.float32)
    lmasks, rmasks = [], []
    for s in range(1, num_stage):
        h, w = H // scale ** (num_stage - 1 - s), W // scale ** (num_stage - 1 - s)
        lmasks.append((rng.rand(B, h, w) < 0.3).astype(np.float32))
        rmasks.append((rng.rand(B, h, w) < 0.3).astype(np.float32))
    return left, right, lmasks, rmasks


def test_forward_shapes_and_finiteness(rng):
    cfg = tiny_cfg()
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    out = model.apply(variables, left, right, lm, rm)
    assert len(out["preds"]) == 4
    shapes = [(1, 2, 3), (1, 6, 9), (1, 18, 27), (1, 54, 81)]
    for p, s in zip(out["preds"], shapes):
        assert p.shape == s
        assert np.isfinite(np.asarray(p)).all()
    assert len(out["sparse"]) == 3 and len(out["var"]) == 3
    for sm in out["soft_mask"]:
        a = np.asarray(sm)
        assert (a >= 0).all() and (a <= 1).all()


def test_forward_use_detail(rng):
    cfg = tiny_cfg(use_detail=True, thold=0.5)
    model = get_model("decnet", cfg)
    left, right, _, _ = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right)
    out = model.apply(variables, left, right)
    assert len(out["left_details"]) == 3
    assert out["preds"][-1].shape == (1, 54, 81)
    for m in out["masks_used"]:
        a = np.asarray(m)
        assert set(np.unique(a)).issubset({0.0, 1.0})


def test_forward_skip_stage(rng):
    cfg = tiny_cfg(skip_stage_id=2)
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    out = model.apply(variables, left, right, lm, rm)
    # stages >= 2 are plain upsampling: only one fine stage ran heads
    assert len(out["sparse"]) == 1
    assert out["preds"][-1].shape == (1, 54, 81)


def test_uploss_and_mask_loss(rng):
    cfg = tiny_cfg(use_detail=True, thold=0.5)
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right)
    out = model.apply(variables, left, right,
                      rngs={}, mutable=False, train=False)
    gt = (rng.rand(1, 54, 81) * 20).astype(np.float32)
    lcfg = LossConfig()
    total, logs = loss_lib.multi_stage_uploss(out, gt, lcfg, 4, 3, 27)
    assert np.isfinite(float(total))
    assert "stage3/pred" in logs
    mtotal, _ = loss_lib.detail_mask_loss(out, lm, rm, lcfg.weights)
    assert np.isfinite(float(mtotal))


def test_uploss_matches_torch_smoothl1_semantics(rng):
    torch = pytest.importorskip("torch")
    pred = rng.randn(2, 6, 8).astype(np.float32) * 3
    gt = (rng.rand(2, 6, 8) * 10).astype(np.float32)
    valid = (gt > 0) & (gt < 8.0)
    want = torch.nn.functional.smooth_l1_loss(
        torch.from_numpy(pred)[torch.from_numpy(valid)],
        torch.from_numpy(gt)[torch.from_numpy(valid)]).item()
    got = loss_lib.masked_mean(loss_lib.smooth_l1(jnp.asarray(pred),
                                                  jnp.asarray(gt)), valid)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_metrics_match_reference_semantics(rng):
    pred = (rng.rand(1, 8, 8) * 30).astype(np.float32)
    gt = (rng.rand(1, 8, 8) * 30).astype(np.float32)
    epe, d1 = epe_and_d1(jnp.asarray(pred), jnp.asarray(gt), 27.0)
    valid = (gt > 0) & (gt < 27)
    err = np.abs(pred - gt)[valid]
    np.testing.assert_allclose(float(epe), err.mean(), rtol=1e-5)
    ok = (err < 3) | (err < 0.05 * gt[valid])
    np.testing.assert_allclose(float(d1), 100 - ok.sum() / valid.sum() * 100,
                               rtol=1e-5)


def test_train_mode_updates_batch_stats(rng):
    cfg = tiny_cfg()
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    out, mutated = model.apply(variables, left, right, lm, rm, train=True,
                               mutable=["batch_stats"])
    assert "batch_stats" in mutated
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_forward_s2d_variant(rng):
    """Space-to-depth fine-stage variant: same output shapes/contract."""
    cfg = tiny_cfg(use_detail=True, thold=0.5, s2d_fine=True)
    model = get_model("decnet", cfg)
    left, right, _, _ = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right)
    out = model.apply(variables, left, right)
    shapes = [(1, 2, 3), (1, 6, 9), (1, 18, 27), (1, 54, 81)]
    for p, s in zip(out["preds"], shapes):
        assert p.shape == s
        assert np.isfinite(np.asarray(p)).all()
    assert out["sparse"][-1].shape == (1, 54, 81)
    assert out["soft_mask"][-1].shape == (1, 54, 81)
    assert out["left_details"][-1].shape == (1, 54, 81)


def test_s2d_train_step_decreases_loss(rng):
    from decnet_tpu.config import Config
    from decnet_tpu.train.state import create_train_state
    from decnet_tpu.train.step import make_train_step
    cfg = Config()
    cfg.model = tiny_cfg(use_detail=True, thold=0.5, s2d_fine=True)
    cfg.train.lr = 1e-3
    cfg.train.warmup_steps = 1
    cfg.train.total_steps = 100
    model = get_model("decnet", cfg.model)
    left, right, lm, rm = make_batch(rng, B=2)
    batch = {"left": left, "right": right,
             "gt": (rng.rand(2, 54, 81) * 20).astype(np.float32),
             "left_masks": lm, "right_masks": rm}
    variables = model.init(jax.random.PRNGKey(0), left, right)
    state = create_train_state(model, variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    losses = []
    for _ in range(6):
        state, logs = step(state, batch)
        losses.append(float(logs["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_folded_batchnorm_matches_flax(rng):
    """FoldedBatchNorm == nn.BatchNorm in both modes (values, stat updates,
    variable tree) — it only changes WHERE the affine is computed."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from decnet_tpu.nn.layers import FoldedBatchNorm

    x = jnp.asarray(rng.randn(4, 6, 5, 7).astype(np.float32) * 3 + 1)

    class Ours(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return FoldedBatchNorm(name="BatchNorm_0")(
                x, use_running_average=not train)

    class Flax(nn.Module):
        @nn.compact
        def __call__(self, x, train):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32,
                                param_dtype=jnp.float32)(x)

    v_o = Ours().init(jax.random.PRNGKey(0), x, True)
    v_f = Flax().init(jax.random.PRNGKey(0), x, True)
    # identical variable tree (names, shapes)
    fo = jax.tree_util.tree_flatten_with_path(v_o)[0]
    ff = jax.tree_util.tree_flatten_with_path(v_f)[0]
    assert [tuple(str(q) for q in p) for p, _ in fo] == \
        [tuple(str(q) for q in p) for p, _ in ff]

    # perturb params/stats so the affine is non-trivial
    def bump(v):
        return jax.tree_util.tree_map(
            lambda a: a + jnp.arange(a.size, dtype=a.dtype) / a.size, v)
    v_o, v_f = bump(v_o), bump(v_f)

    # train mode: output + updated stats match
    y_o, m_o = Ours().apply(v_o, x, True, mutable=["batch_stats"])
    y_f, m_f = Flax().apply(v_f, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_f),
                               rtol=2e-5, atol=2e-5)
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(m_o)[0],
            jax.tree_util.tree_flatten_with_path(m_f)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # eval mode
    y_o = Ours().apply(v_o, x, False)
    y_f = Flax().apply(v_f, x, False)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_f),
                               rtol=2e-5, atol=2e-5)

    # bf16 activations: affine stays in bf16 (no f32 output promotion)
    y_b = Ours().apply(v_o, x.astype(jnp.bfloat16), False)
    assert y_b.dtype == jnp.bfloat16


def test_forward_s2d_two_stages(rng):
    """s2d_stages=2: the 1/3-res stage's heads also run layout-native (1/9
    grid, 9x channels); output contract identical to the reference form."""
    cfg = tiny_cfg(use_detail=True, thold=0.5, s2d_fine=True, s2d_stages=2)
    model = get_model("decnet", cfg)
    left, right, _, _ = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right)
    out = model.apply(variables, left, right)
    shapes = [(1, 2, 3), (1, 6, 9), (1, 18, 27), (1, 54, 81)]
    for p, s in zip(out["preds"], shapes):
        assert p.shape == s
        assert np.isfinite(np.asarray(p)).all()
    # per-stage diagnostics stay in planar form at each stage's resolution
    # (index 1 = the 1/3-res stage, the one s2d_stages=2 newly converts)
    assert out["sparse"][1].shape == (1, 18, 27)
    assert out["sparse"][-1].shape == (1, 54, 81)
    assert out["soft_mask"][1].shape == (1, 18, 27)
    assert out["left_details"][1].shape == (1, 18, 27)
    assert out["masks_used"][1].shape == (1, 18, 27)


def test_s2d_two_stage_train_step(rng):
    """Gradients flow and the loss decreases with both trailing stages in
    s2d form (precomputed-mask mode, the training configuration)."""
    from decnet_tpu.config import Config
    from decnet_tpu.train.state import create_train_state
    from decnet_tpu.train.step import make_train_step
    cfg = Config()
    cfg.model = tiny_cfg(use_detail=False, s2d_fine=True, s2d_stages=2)
    cfg.train.lr = 1e-3
    cfg.train.warmup_steps = 1
    cfg.train.total_steps = 100
    model = get_model("decnet", cfg.model)
    left, right, lm, rm = make_batch(rng, B=2)
    batch = {"left": left, "right": right,
             "gt": (rng.rand(2, 54, 81) * 20).astype(np.float32),
             "left_masks": lm, "right_masks": rm}
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    state = create_train_state(model, variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    losses = []
    for _ in range(6):
        state, logs = step(state, batch)
        losses.append(float(logs["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_groupnorm_variant_no_train_eval_gap(rng):
    """norm="gn": no batch statistics anywhere — the train=True and
    train=False forwards are identical by construction (the BN train/eval
    gap root-cause ablation, docs/training.md)."""
    cfg = tiny_cfg(norm="gn")
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    # no batch_stats collection at all
    assert "batch_stats" not in variables
    out_eval = model.apply(variables, left, right, lm, rm, train=False)
    out_train, _ = model.apply(variables, left, right, lm, rm, train=True,
                               mutable=[])
    np.testing.assert_allclose(np.asarray(out_train["preds"][-1]),
                               np.asarray(out_eval["preds"][-1]),
                               rtol=1e-6, atol=1e-6)
    assert np.isfinite(np.asarray(out_eval["preds"][-1])).all()


def test_skip_stage_call_override(rng):
    """skip_stage_id is a runtime choice (reference CLI flag): a FULL param
    set applies with any eval-time skip, so checkpoints restore regardless
    of the huge-image escape hatch (round-4; demo.sh:5 semantics)."""
    cfg = tiny_cfg()          # skip_stage_id=4 -> full param template
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    out = model.apply(variables, left, right, lm, rm, skip_stage_id=2)
    assert len(out["sparse"]) == 1          # only stage 1 ran its heads
    assert out["preds"][-1].shape == (1, 54, 81)
    # and the override matches a ctor-configured skip on the shared params
    cfg2 = tiny_cfg(skip_stage_id=2)
    model2 = get_model("decnet", cfg2)
    out2 = model2.apply(variables, left, right, lm, rm)
    np.testing.assert_array_equal(np.asarray(out["preds"][-1]),
                                  np.asarray(out2["preds"][-1]))


def test_binarise_detail_quantile_density():
    """Quantile binarisation calibrates mask density by construction, no
    matter where the head's sigmoids saturate (r4: density 0.000 @ 0.9,
    ~1.0 @ 0.5 on the same checkpoint — the fixed-thold knife-edge)."""
    from decnet_tpu.models.decnet import binarise_detail, binarise_detail_pair
    rng = np.random.RandomState(0)
    # emulate a saturated head: everything crammed into [0.93, 0.99]
    det = (0.93 + 0.06 * rng.rand(2, 30, 45)).astype(np.float32)
    cfg = tiny_cfg(thold_mode="quantile", detail_density=0.25)
    m = np.asarray(binarise_detail(jnp.asarray(det), cfg))
    assert m.shape == det.shape and set(np.unique(m)).issubset({0.0, 1.0})
    assert abs(m.mean() - 0.25) < 0.02          # calibrated per image
    # fixed thold on the same map: degenerate (all-1 at 0.5, all-0 at 0.995)
    assert np.asarray(binarise_detail(
        jnp.asarray(det), tiny_cfg(thold=0.5))).mean() == 1.0

    # s2d plane form (B,h,w,s^2): quantile over all non-batch dims
    det4 = (0.93 + 0.06 * rng.rand(2, 10, 15, 9)).astype(np.float32)
    m4 = np.asarray(binarise_detail(jnp.asarray(det4), cfg))
    assert abs(m4.mean() - 0.25) < 0.02

    # pair mode shares one threshold: identical views -> identical masks,
    # and a view with weaker responses keeps FEWER pixels (not re-normed)
    ml, mr = binarise_detail_pair(jnp.asarray(det), jnp.asarray(det), cfg)
    assert (np.asarray(ml) == np.asarray(mr)).all()
    weaker = det - 0.03
    ml2, mr2 = binarise_detail_pair(jnp.asarray(det), jnp.asarray(weaker), cfg)
    assert np.asarray(mr2).mean() < np.asarray(ml2).mean()
    tot = (np.asarray(ml2).mean() + np.asarray(mr2).mean()) / 2
    assert abs(tot - 0.25) < 0.02               # pooled density calibrated


def test_forward_use_detail_quantile(rng):
    """Model forward in quantile mode: masks_used density tracks the target
    at every fine stage, in both NHWC and s2d forms."""
    for s2d in (False, True):
        cfg = tiny_cfg(use_detail=True, thold_mode="quantile",
                       detail_density=0.3, s2d_fine=s2d)
        model = get_model("decnet", cfg)
        left, right, _, _ = make_batch(rng)
        variables = model.init(jax.random.PRNGKey(0), left, right)
        out = model.apply(variables, left, right)
        for m in out["masks_used"]:
            a = np.asarray(m)
            assert set(np.unique(a)).issubset({0.0, 1.0})
            # pooled L+R density is exactly calibrated; each view is within
            # a loose band (tiny random maps -> coarse quantiles)
            assert 0.05 < a.mean() < 0.6, a.mean()


def test_execution_modes_are_equivalent(rng):
    """conv3d_impl=shift2d and split_concat=True are pure execution
    strategies: same parameter tree, numerically equivalent outputs (f32)."""
    left, right, lm, rm = make_batch(rng)
    base = tiny_cfg()
    model0 = get_model("decnet", base)
    variables = model0.init(jax.random.PRNGKey(0), left, right, lm, rm)
    ref = model0.apply(variables, left, right, lm, rm)["preds"]

    for kw in ({"conv3d_impl": "shift2d"}, {"split_concat": True},
               {"conv3d_impl": "shift2d", "split_concat": True}):
        cfg = tiny_cfg(**kw)
        model = get_model("decnet", cfg)
        # identical parameter tree: init must produce the same structure
        v2 = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
        assert jax.tree_util.tree_structure(v2) == \
            jax.tree_util.tree_structure(variables)
        out = model.apply(variables, left, right, lm, rm)["preds"]
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-4)


def test_execution_modes_equivalent_s2d(rng):
    """Same equivalence through the s2d serving form (the bench path)."""
    left, right, lm, rm = make_batch(rng)
    base = tiny_cfg(s2d_fine=True, s2d_stages=2)
    model0 = get_model("decnet", base)
    variables = model0.init(jax.random.PRNGKey(0), left, right, lm, rm)
    ref = model0.apply(variables, left, right, lm, rm)["preds"]
    cfg = tiny_cfg(s2d_fine=True, s2d_stages=2, conv3d_impl="shift2d",
                   split_concat=True)
    model = get_model("decnet", cfg)
    out = model.apply(variables, left, right, lm, rm)["preds"]
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-4)
