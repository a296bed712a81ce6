"""Loss dispatcher (reference loss.py:31-64) + the non-default loss types.

The reference's `Loss` module dispatches on loss_type; until round 3 only the
shipped default (multi_stage_regression_uploss) was reachable here.  These
tests pin the semantics of the alternates — upsample, chamfer,
LR-consistency, mask supervision with binary_thold — and that every type is
reachable end-to-end through make_train_step / the CLI config.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decnet_tpu.config import Config, LossConfig, ModelConfig
from decnet_tpu.train import loss as loss_lib


# ---------------------------------------------------------------------------
# upsample_loss (loss.py:362-395)
# ---------------------------------------------------------------------------

def test_upsample_loss_semantics(rng):
    """Every stage's prediction is value-scaled and upsampled to FULL res,
    then smooth-L1'd against the full-res gt over 0<gt<max_disp."""
    from decnet_tpu.ops.resize import interpolate
    B, H, W = 2, 18, 18
    gt = jnp.asarray((rng.rand(B, H, W) * 8).astype(np.float32))
    preds = [jnp.asarray(rng.rand(B, H // 9, W // 9).astype(np.float32)),
             jnp.asarray(rng.rand(B, H // 3, W // 3).astype(np.float32)),
             jnp.asarray(rng.rand(B, H, W).astype(np.float32))]
    cfg = LossConfig(weights=(1.0, 2.0, 3.0), down_func_name="bilinear")
    total, logs = loss_lib.upsample_loss({"preds": preds}, gt, cfg,
                                         num_stage=3, down_scale=3, max_disp=9)
    valid = (gt > 0) & (gt < 9)
    expect = 0.0
    for s, (p, down, w) in enumerate(zip(preds, (9, 3, 1), (1.0, 2.0, 3.0))):
        cur = p if down == 1 else interpolate(p * down, H, W, "bilinear")
        expect += w * loss_lib.masked_mean(loss_lib.smooth_l1(cur, gt), valid)
    np.testing.assert_allclose(float(total), float(expect), rtol=1e-6)
    assert set(logs) == {"stage0/up", "stage1/up", "stage2/up"}


# ---------------------------------------------------------------------------
# chamfer (loss.py:67-165)
# ---------------------------------------------------------------------------

def test_chamfer_error_picks_nearest_valid_in_cell():
    """Chamfer distance is the min over the r*r GT cell, gt==0 excluded."""
    gt = jnp.asarray(np.array([[[5.0, 0.0], [9.0, 7.0]]], np.float32))
    pred = jnp.asarray(np.array([[[6.0]]], np.float32))  # closest valid: 5 or 7
    err = loss_lib.chamfer_error(pred, gt, 2)
    np.testing.assert_allclose(float(err[0, 0, 0]), 1.0, atol=1e-3)


def test_chamfer_loss_zero_when_pred_matches():
    gt = jnp.asarray((np.arange(36, dtype=np.float32) % 7 + 1).reshape(1, 6, 6))
    pred = gt[:, ::3, ::3]  # exactly a member of each 3x3 cell
    l = loss_lib.chamfer_loss(pred, gt, 3)
    assert float(l) < 1e-3


def test_chamfer_loss_extra_mask_gates_pixels():
    gt = jnp.ones((1, 6, 6), jnp.float32) * 4.0
    pred = jnp.asarray(np.array([[[4.0, 50.0]]], np.float32)).reshape(1, 1, 2)
    pred = jnp.concatenate([pred, pred], axis=1)  # (1,2,2)
    mask_all = jnp.ones((1, 2, 2), jnp.float32)
    mask_good = jnp.asarray(np.array([[[1, 0], [1, 0]]], np.float32))
    l_all = loss_lib.chamfer_loss(pred, gt, 3, extra_mask=mask_all)
    l_good = loss_lib.chamfer_loss(pred, gt, 3, extra_mask=mask_good)
    assert float(l_good) < 1e-3 < float(l_all)


def test_multi_stage_chamfer_finite_and_logged(rng):
    B, H, W = 1, 27, 27
    gt = jnp.asarray((rng.rand(B, H, W) * 10 + 1).astype(np.float32))
    out = {
        "preds": [jnp.asarray(rng.rand(B, H // d, W // d).astype(np.float32))
                  for d in (9, 3, 1)],
        "dense": [jnp.asarray(rng.rand(B, H // d, W // d).astype(np.float32))
                  for d in (3, 1)],
        "sparse": [jnp.asarray(rng.rand(B, H // d, W // d).astype(np.float32))
                   for d in (3, 1)],
        "fusion": [jnp.asarray(rng.rand(B, H // d, W // d).astype(np.float32))
                   for d in (3, 1)],
        "masks_used": [jnp.asarray((rng.rand(B, H // d, W // d) < 0.5)
                                   .astype(np.float32)) for d in (3, 1)],
    }
    cfg = LossConfig(weights=(1.0, 1.0, 1.0))
    total, logs = loss_lib.multi_stage_chamfer(out, gt, cfg, num_stage=3,
                                               down_scale=3, max_disp=12)
    assert np.isfinite(float(total))
    assert "stage1/sparse" in logs and "stage2/fusion" in logs


# ---------------------------------------------------------------------------
# LR consistency (loss.py:398-424)
# ---------------------------------------------------------------------------

def test_lr_consistency_discriminates_disparity(rng):
    """With identical views, the photometric loss at the true disparity (0)
    is far below a wrong disparity.  (It is not exactly zero even at disp=0:
    the warp faithfully reproduces the reference's align_corners=False
    half-pixel offset, submodule.py:719-745 / ops/warp.py:56-72.)"""
    feats = {f"stage{s}": jnp.asarray(rng.rand(1, 6, 12, 4).astype(np.float32))
             for s in range(2)}
    preds = [jnp.zeros((1, 6, 12), jnp.float32)] * 2
    l0 = loss_lib.lr_consistency_loss(preds, feats, feats, (1.0, 1.0))
    preds_bad = [jnp.ones((1, 6, 12), jnp.float32) * 3.0] * 2
    l_bad = loss_lib.lr_consistency_loss(preds_bad, feats, feats, (1.0, 1.0))
    assert float(l0) < 0.5 * float(l_bad), (float(l0), float(l_bad))


# ---------------------------------------------------------------------------
# detail mask loss binary_thold eval mode (loss.py:343-345)
# ---------------------------------------------------------------------------

def test_detail_mask_loss_binary_thold(rng):
    m = (rng.rand(1, 9, 9) < 0.4).astype(np.float32)
    soft = jnp.asarray(np.where(m > 0, 0.8, 0.2).astype(np.float32))
    out = {"left_details": [soft], "right_details": [soft]}
    masks = [jnp.asarray(m)]
    # binarised at 0.5 the soft predictions become EXACTLY the target mask
    l_bin, _ = loss_lib.detail_mask_loss(out, masks, masks, (1.0,),
                                         binary_thold=0.5)
    l_soft, _ = loss_lib.detail_mask_loss(out, masks, masks, (1.0,))
    # focal loss of a perfect binary prediction ~ -log(1+eps) terms only
    assert float(l_bin) < float(l_soft)
    out_exact = {"left_details": [jnp.asarray(m)],
                 "right_details": [jnp.asarray(m)]}
    l_exact, _ = loss_lib.detail_mask_loss(out_exact, masks, masks, (1.0,))
    np.testing.assert_allclose(float(l_bin), float(l_exact), rtol=1e-6)


# ---------------------------------------------------------------------------
# dispatcher: every loss_type reachable through make_train_step
# ---------------------------------------------------------------------------

def _tiny_cfg(loss_type, use_detail):
    cfg = Config()
    cfg.model = ModelConfig(max_disp=27, base_channels=4, num_stage=4,
                            down_scale=3, use_detail=use_detail, thold=0.5,
                            dtype="float32", matching_impl="xla")
    cfg.loss.loss_type = loss_type
    cfg.train.batch_size = 1
    cfg.train.warmup_steps = 1
    return cfg


@pytest.mark.parametrize("loss_type,use_detail", [
    ("multi_stage_regression_uploss", False),
    ("chamfer", False),
    ("LR_consistency", False),
    ("multi_stage_regression_upsampleloss", False),
    ("multi_stage_regression_upmaskloss", True),
])
def test_train_step_dispatches_loss_type(rng, loss_type, use_detail):
    from decnet_tpu.models import get_model
    from decnet_tpu.train.state import create_train_state
    from decnet_tpu.train.step import make_train_step

    cfg = _tiny_cfg(loss_type, use_detail)
    B, H, W = 1, 54, 54
    mk = lambda h, w: (rng.rand(B, h, w) < 0.4).astype(np.float32)
    batch = {
        "left": rng.rand(B, H, W, 3).astype(np.float32),
        "right": rng.rand(B, H, W, 3).astype(np.float32),
        "gt": (rng.rand(B, H, W) * 20).astype(np.float32),
        "left_masks": [mk(H // 9, W // 9), mk(H // 3, W // 3), mk(H, W)],
        "right_masks": [mk(H // 9, W // 9), mk(H // 3, W // 3), mk(H, W)],
    }
    model = get_model("decnet", cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch["left"],
                           batch["right"], batch["left_masks"],
                           batch["right_masks"])
    state = create_train_state(model, variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    state, logs = step(state, batch)
    assert np.isfinite(float(logs["total"])), loss_type
    gnorm = float(logs["grad_norm"])
    assert np.isfinite(gnorm) and gnorm > 0, loss_type


def test_unknown_loss_type_rejected():
    from decnet_tpu.models import get_model
    from decnet_tpu.train.step import make_train_step
    cfg = _tiny_cfg("totally_bogus", False)
    with pytest.raises(AssertionError, match="No such loss"):
        make_train_step(get_model("decnet", cfg.model), cfg)


def test_loss_type_reachable_from_cli():
    """--set loss.loss_type=chamfer + loss.binary_thold parse through the
    config override path (the reference exposes loss_type as a CLI flag)."""
    cfg = Config().apply_overrides(["loss.loss_type=chamfer",
                                    "loss.binary_thold=0.5"])
    assert cfg.loss.loss_type == "chamfer"
    assert cfg.loss.binary_thold == 0.5
    cfg = cfg.apply_overrides(["loss.binary_thold=none"])
    assert cfg.loss.binary_thold is None
