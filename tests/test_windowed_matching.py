"""Prior-windowed sparse matching (round-4): scan only |d - center| <= w.

Semantics: identical to the full-band op with out-of-window candidates
treated as tar_mask == 0 (incl. the eps/no-candidate sentinel).  The window
mechanism is the reference's adaptive-sampling idea (submodule.py:398-411)
applied to SpaMat, which always scans the full band (SM_kernel.cu:86-88).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decnet_tpu.config import LossConfig
from decnet_tpu.models import get_model
from decnet_tpu.ops.matching import (
    sparse_matching_with_var, sparse_matching_with_var_windowed,
    sparse_matching_with_var_rows_windowed, candidate_availability_windowed,
    EPS)
from tests.test_model import tiny_cfg, make_batch
from tests import oracles


def _rand(rng, B=1, H=3, W=40, C=4, md=16, dens=0.6):
    ref = rng.randn(B, H, W, C).astype(np.float32)
    tar = rng.randn(B, H, W, C).astype(np.float32)
    lm = (rng.rand(B, H, W) < dens).astype(np.float32)
    rm = (rng.rand(B, H, W) < dens).astype(np.float32)
    c = (rng.rand(B, H, W) * md).astype(np.float32)
    return ref, tar, lm, rm, c, md


def oracle_windowed(ref, tar, lm, rm, c, md, win):
    """Brute-force windowed SpaMat+SpaVar with reference eps semantics."""
    B, H, W, C = ref.shape
    out = np.zeros((B, H, W), np.float32)
    var = np.zeros((B, H, W), np.float32)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                if lm[b, y, x] == 0:
                    continue
                best = -np.inf
                cands = []
                for d in range(min(md, x + 1)):
                    if rm[b, y, x - d] == 0 or abs(d - c[b, y, x]) > win:
                        continue
                    s = float(ref[b, y, x] @ tar[b, y, x - d])
                    cands.append((d, s))
                    best = max(best, s)
                best = max(best, EPS)
                se = sed = sed2 = 0.0
                for d, s in cands:
                    e = np.exp(s - best)
                    se += e
                    sed += e * d
                    sed2 += e * d * d
                o = (EPS + sed) / (EPS + se)
                out[b, y, x] = o
                var[b, y, x] = (EPS + sed2 - 2 * o * sed + o * o * se) \
                    / (EPS + se)
    return out, var


@pytest.mark.parametrize("win", [2, 5])
def test_windowed_matches_oracle(rng, win):
    ref, tar, lm, rm, c, md = _rand(rng)
    o_out, o_var = oracle_windowed(ref, tar, lm, rm, c, md, win)
    out, var = sparse_matching_with_var_windowed(ref, tar, lm, rm, c, md,
                                                 win, "xla")
    np.testing.assert_allclose(np.asarray(out), o_out, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(var), o_var, rtol=2e-4, atol=2e-4)


def test_huge_window_equals_full_band(rng):
    ref, tar, lm, rm, c, md = _rand(rng)
    full_out, full_var = sparse_matching_with_var(ref, tar, lm, rm, md, "xla")
    w_out, w_var = sparse_matching_with_var_windowed(
        ref, tar, lm, rm, np.zeros_like(c), md, 10 * md, "xla")
    np.testing.assert_allclose(np.asarray(w_out), np.asarray(full_out),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w_var), np.asarray(full_var),
                               rtol=1e-5, atol=1e-5)


def test_windowed_output_bounded_by_window(rng):
    ref, tar, lm, rm, c, md = _rand(rng, dens=1.0)
    win = 3
    out, _ = sparse_matching_with_var_windowed(ref, tar, lm, rm, c, md, win,
                                               "xla")
    cand = np.asarray(candidate_availability_windowed(
        jnp.asarray(rm), md, jnp.asarray(c), win))
    sel = (lm != 0) & (cand > 0)
    assert sel.any()
    # a softmax expectation over the gated candidates cannot leave the window
    assert (np.abs(np.asarray(out) - c)[sel] <= win + 1e-4).all()


def test_windowed_cand_availability_bruteforce(rng):
    ref, tar, lm, rm, c, md = _rand(rng, dens=0.2)
    win = 3
    got = np.asarray(candidate_availability_windowed(
        jnp.asarray(rm), md, jnp.asarray(c), win))
    B, H, W = rm.shape
    for b in range(B):
        for y in range(H):
            for x in range(W):
                want = 0.0
                for d in range(min(md, x + 1)):
                    if abs(d - c[b, y, x]) <= win and rm[b, y, x - d]:
                        want = 1.0
                assert got[b, y, x] == want, (b, y, x)


def test_windowed_gradients_finite_diff(rng):
    ref, tar, lm, rm, c, md = _rand(rng, W=24, md=8)
    win = 3
    wgt = jnp.asarray(rng.rand(*lm.shape), jnp.float32)

    def f(r, t):
        out, _ = sparse_matching_with_var_windowed(r, t, lm, rm, c, md, win,
                                                   "xla")
        return jnp.sum(out * wgt)

    g_ref, g_tar = jax.grad(f, argnums=(0, 1))(jnp.asarray(ref),
                                               jnp.asarray(tar))
    eps = 1e-3
    for _ in range(6):
        b, y, x, ch = (rng.randint(s) for s in ref.shape)
        d = np.zeros_like(ref)
        d[b, y, x, ch] = eps
        num = (f(jnp.asarray(ref + d), jnp.asarray(tar))
               - f(jnp.asarray(ref - d), jnp.asarray(tar))) / (2 * eps)
        np.testing.assert_allclose(float(num), float(g_ref[b, y, x, ch]),
                                   rtol=2e-2, atol=2e-3)


def test_pallas_interpret_windowed_parity(rng):
    """Pallas (interpret mode on CPU) == XLA for the windowed fused op,
    forward and backward, NHWC and rows forms."""
    ref, tar, lm, rm, c, md = _rand(rng, H=4, W=33, C=5, md=9)
    win = 3

    def run(impl):
        def f(r, t):
            out, var = sparse_matching_with_var_windowed(
                r, t, lm, rm, c, md, win, impl)
            return jnp.sum(out ** 2), (out, var)
        (l, (out, var)), grads = jax.value_and_grad(f, argnums=(0, 1),
                                                    has_aux=True)(
            jnp.asarray(ref), jnp.asarray(tar))
        return out, var, grads

    o1, v1, g1 = run("xla")
    o2, v2, g2 = run("pallas")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2e-4,
                               atol=2e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-4)

    o3, _ = sparse_matching_with_var_rows_windowed(
        jnp.asarray(ref).transpose(0, 1, 3, 2),
        jnp.asarray(tar).transpose(0, 1, 3, 2), lm, rm, c, md, win,
        "pallas")
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o1), rtol=2e-5,
                               atol=2e-5)


@pytest.mark.parametrize("s2d", [False, True])
def test_model_with_match_window(rng, s2d):
    cfg = tiny_cfg(match_window=6, cand_fallback=True, s2d_fine=s2d)
    model = get_model("decnet", cfg)
    left, right, lm, rm = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), left, right, lm, rm)
    out = model.apply(variables, left, right, lm, rm)
    assert np.isfinite(np.asarray(out["preds"][-1])).all()
    # effective sparse stays within the (stage) window of dense wherever a
    # windowed candidate exists; elsewhere cand_fallback makes it dense
    for i in range(len(out["sparse"])):
        sp = np.asarray(out["sparse"][i])
        de = np.asarray(out["dense"][i])
        mask = np.asarray(out["masks_used"][i]) != 0
        cand = np.asarray(out["cand"][i]) > 0
        stage = i + 1
        down = cfg.down_scale ** (cfg.num_stage - 1 - stage)
        win = max(2, round(cfg.match_window / down))
        assert (np.abs(sp - de)[mask & cand] <= win + 1e-3).all()
        np.testing.assert_allclose(sp[mask & ~cand], de[mask & ~cand],
                                   rtol=1e-5, atol=1e-5)
