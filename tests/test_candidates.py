"""Candidate availability, the matching temperature, and the candidate
fallback (round-4 sparse-branch fixes).

SpaMat/SpaVar skip right pixels with tar_mask == 0 (SM_kernel.cu:90-99); a
masked-in left pixel whose whole band is masked out outputs the eps-sentinel
1.0 (SM_kernel.cu:45,:100-124).  `candidate_availability` computes that bit
exactly; `cand_fallback` substitutes the dense branch there; `match_temp`
scales the matching scores (feature scaling — kernels unchanged).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decnet_tpu.config import ModelConfig, LossConfig
from decnet_tpu.models import get_model
from decnet_tpu.ops.matching import (candidate_availability, sparse_matching,
                                     sparse_matching_with_var)
from decnet_tpu.train import loss as loss_lib

from tests.test_model import tiny_cfg, make_batch


def brute_cand(tar_mask, max_disp):
    B, H, W = tar_mask.shape
    out = np.zeros((B, H, W), np.float32)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                for d in range(min(max_disp, x + 1)):
                    if tar_mask[b, y, x - d] != 0:
                        out[b, y, x] = 1.0
                        break
    return out


@pytest.mark.parametrize("max_disp", [1, 4, 9, 40])
def test_candidate_availability_matches_bruteforce(rng, max_disp):
    tm = (rng.rand(2, 5, 23) < 0.15).astype(np.float32)
    got = np.asarray(candidate_availability(jnp.asarray(tm), max_disp))
    np.testing.assert_array_equal(got, brute_cand(tm, max_disp))


def test_no_candidate_pixels_output_sentinel(rng):
    """cand == 0 at a masked-in left pixel <=> SpaMat outputs exactly 1.0."""
    B, H, W, C = 1, 4, 31, 5
    md = 8
    ref = rng.randn(B, H, W, C).astype(np.float32)
    tar = rng.randn(B, H, W, C).astype(np.float32)
    lm = (rng.rand(B, H, W) < 0.5).astype(np.float32)
    rm = (rng.rand(B, H, W) < 0.2).astype(np.float32)
    out = np.asarray(sparse_matching(ref, tar, lm, rm, md, "xla"))
    cand = np.asarray(candidate_availability(jnp.asarray(rm), md))
    refm = lm != 0
    assert (out[refm & (cand == 0)] == 1.0).all()
    # (a candidate-available pixel CAN also output exactly 1.0 — e.g. a
    # single candidate at d=1 — which is why the sentinel value alone cannot
    # identify no-candidate pixels and the explicit cand map is needed)


def test_match_temp_scales_scores(rng):
    """match_temp t == matching on t-scaled query features, and a sharper
    softmax concentrates the expectation toward the argmax candidate."""
    B, H, W, C = 1, 3, 40, 4
    md = 16
    ref = rng.randn(B, H, W, C).astype(np.float32)
    tar = rng.randn(B, H, W, C).astype(np.float32)
    lm = np.ones((B, H, W), np.float32)
    rm = np.ones((B, H, W), np.float32)
    out1, _ = sparse_matching_with_var(ref, tar, lm, rm, md, "xla")
    out8, _ = sparse_matching_with_var(ref * 8.0, tar, lm, rm, md, "xla")
    # brute-force argmax disparity
    best = np.zeros((B, H, W))
    bestc = np.full((B, H, W), -np.inf)
    for d in range(md):
        c = np.full((B, H, W), -np.inf)
        c[:, :, d:] = (ref[:, :, d:] * tar[:, :, : W - d if d else W]).sum(-1)
        upd = c > bestc
        best[upd] = d
        bestc[upd] = c[upd]
    # interior columns (full band): high temp must sit closer to argmax
    sl = np.s_[:, :, md:]
    d1 = np.abs(np.asarray(out1)[sl] - best[sl]).mean()
    d8 = np.abs(np.asarray(out8)[sl] - best[sl]).mean()
    assert d8 < d1


def test_learned_temp_param_and_gradient(rng):
    cfg = tiny_cfg(match_temp=2.0, match_temp_learned=True)
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    params = variables["params"]
    for i in range(3):
        assert f"match_logt_{i}" in params, sorted(params.keys())
        np.testing.assert_allclose(params[f"match_logt_{i}"], np.log(2.0),
                                   rtol=1e-6)

    def loss_fn(p):
        out = model.apply({**variables, "params": p}, left, right, lm, rm)
        return sum(jnp.sum(s ** 2) for s in out["sparse"])

    g = jax.grad(loss_fn)(params)
    assert any(float(jnp.abs(g[f"match_logt_{i}"])) > 0 for i in range(3))


def test_learned_temp_init_one_matches_baseline(rng):
    """temp learned but initialised at 1.0 => byte-identical forward (flax
    param RNG is path-keyed, so the extra scalar doesn't disturb inits)."""
    left, right, lm, rm = make_batch(rng)
    outs = []
    for kw in (dict(), dict(match_temp=1.0, match_temp_learned=True)):
        cfg = tiny_cfg(**kw)
        model = get_model("decnet", cfg)
        variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
        outs.append(model.apply(variables, left, right, lm, rm))
    np.testing.assert_array_equal(np.asarray(outs[0]["preds"][-1]),
                                  np.asarray(outs[1]["preds"][-1]))


@pytest.mark.parametrize("s2d", [False, True])
def test_cand_fallback_substitutes_dense(rng, s2d):
    cfg = tiny_cfg(cand_fallback=True, s2d_fine=s2d)
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    # sparse right masks so no-candidate pixels actually exist
    rm = [(np.random.RandomState(1).rand(*m.shape) < 0.05).astype(np.float32)
          for m in rm]
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    out = model.apply(variables, left, right, lm, rm)
    for i in range(len(out["sparse"])):
        sp = np.asarray(out["sparse"][i])
        de = np.asarray(out["dense"][i])
        cand = np.asarray(out["cand"][i])
        mask = np.asarray(out["masks_used"][i])
        sub = (mask != 0) & (cand == 0)
        assert sub.any()
        np.testing.assert_allclose(sp[sub], de[sub], rtol=1e-5, atol=1e-5)
        # where candidates exist the raw matching result is used
        keep = (mask != 0) & (cand == 1)
        raw = np.asarray(out["sparse_raw"][i])
        np.testing.assert_allclose(sp[keep], raw[keep], rtol=1e-5, atol=1e-5)


def test_uploss_cand_masking(rng):
    """sparse_cand_mask drops sentinel pixels from the sparse term's mean."""
    cfg = tiny_cfg()
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    rm = [(np.random.RandomState(1).rand(*m.shape) < 0.05).astype(np.float32)
          for m in rm]
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    out = model.apply(variables, left, right, lm, rm)
    gt = (np.random.RandomState(2).rand(1, 54, 81) * 20).astype(np.float32)
    l_on, logs_on = loss_lib.multi_stage_uploss(
        out, jnp.asarray(gt), LossConfig(sparse_cand_mask=True),
        cfg.num_stage, cfg.down_scale, cfg.max_disp)
    l_off, logs_off = loss_lib.multi_stage_uploss(
        out, jnp.asarray(gt), LossConfig(sparse_cand_mask=False),
        cfg.num_stage, cfg.down_scale, cfg.max_disp)
    assert np.isfinite(float(l_on)) and np.isfinite(float(l_off))
    # sentinel pixels (output 1.0 vs gt ~ U[0,20)) inflate the unmasked mean
    assert float(logs_on["stage3/sparse"]) != float(logs_off["stage3/sparse"])
