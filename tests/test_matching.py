"""sparse_matching / sparse_var vs numpy oracles + torch autograd cross-check."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decnet_tpu.ops import matching
from tests import oracles


def make_inputs(rng, B=2, H=5, W=23, C=6, density=0.6):
    ref = rng.randn(B, H, W, C).astype(np.float32)
    tar = rng.randn(B, H, W, C).astype(np.float32)
    ref_mask = (rng.rand(B, H, W) < density).astype(np.float32)
    tar_mask = (rng.rand(B, H, W) < density).astype(np.float32)
    return ref, tar, ref_mask, tar_mask


@pytest.mark.parametrize("max_disp", [1, 7, 16, 40])
def test_spamat_forward_matches_oracle(rng, max_disp):
    ref, tar, rm, tm = make_inputs(rng)
    want, want_ss, want_mc = oracles.sparse_matching_fwd(ref, tar, rm, tm, max_disp)
    got, got_ss, got_mc = jax.jit(
        lambda *a: matching._spamat_fwd_xla(*a, max_disp))(ref, tar, rm, tm)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_ss, want_ss, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_mc, want_mc, rtol=1e-5, atol=1e-5)


def test_spamat_no_valid_candidate_outputs_one(rng):
    # ref pixel active but every tar pixel masked -> out = eps/eps = 1 (CUDA).
    ref, tar, rm, _ = make_inputs(rng, B=1, H=1, W=8, C=3, density=1.0)
    tm = np.zeros((1, 1, 8), np.float32)
    out = matching.sparse_matching(ref, tar, rm, tm, 4, "xla")
    np.testing.assert_allclose(np.asarray(out), np.ones((1, 1, 8)), rtol=1e-6)


def test_spamat_masked_ref_outputs_zero(rng):
    ref, tar, _, tm = make_inputs(rng, density=1.0)
    rm = np.zeros(ref.shape[:3], np.float32)
    out = matching.sparse_matching(ref, tar, rm, tm, 8, "xla")
    assert np.all(np.asarray(out) == 0)


@pytest.mark.parametrize("max_disp", [5, 17])
def test_spamat_backward_matches_oracle(rng, max_disp):
    ref, tar, rm, tm = make_inputs(rng, B=1, H=3, W=19, C=4)
    out, ss, mc = oracles.sparse_matching_fwd(ref, tar, rm, tm, max_disp)
    g = rng.randn(*out.shape).astype(np.float32)
    want_gr, want_gt = oracles.sparse_matching_bwd(
        ref, tar, rm, tm, out, ss, mc, g, max_disp)

    f = lambda r, t: jnp.vdot(matching.sparse_matching(r, t, rm, tm, max_disp,
                                                       "xla"), g)
    got_gr, got_gt = jax.grad(f, argnums=(0, 1))(ref, tar)
    np.testing.assert_allclose(np.asarray(got_gr), want_gr, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gt), want_gt, rtol=2e-4, atol=1e-5)


def test_spamat_gradient_vs_finite_differences(rng):
    """The analytic CUDA-parity grad should match true FD grads of the eps-d
    forward closely when masks are dense (eps effects are tiny)."""
    max_disp = 6
    ref, tar, rm, tm = make_inputs(rng, B=1, H=2, W=10, C=3, density=1.0)
    f = lambda r: matching.sparse_matching(r, tar, rm, tm, max_disp, "xla").sum()
    g = jax.grad(f)(ref)
    eps = 1e-3
    for idx in [(0, 0, 3, 1), (0, 1, 7, 2), (0, 0, 9, 0)]:
        rp = ref.copy(); rp[idx] += eps
        rmn = ref.copy(); rmn[idx] -= eps
        fd = (f(rp) - f(rmn)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[idx], fd, rtol=5e-2, atol=1e-3)


@pytest.mark.parametrize("max_disp", [7, 21])
def test_spavar_forward_matches_oracle(rng, max_disp):
    ref, tar, rm, tm = make_inputs(rng)
    disp = (rng.rand(*rm.shape) * max_disp).astype(np.float32)
    want, _, _ = oracles.sparse_var_fwd(ref, tar, rm, tm, disp, max_disp)
    got = matching.sparse_var(ref, tar, rm, tm, disp, max_disp, "xla")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_spavar_disp_gradient_matches_oracle(rng):
    max_disp = 9
    ref, tar, rm, tm = make_inputs(rng, B=1, H=3, W=15, C=4)
    disp = (rng.rand(1, 3, 15) * max_disp).astype(np.float32)
    _, ss, mc = oracles.sparse_var_fwd(ref, tar, rm, tm, disp, max_disp)
    g = rng.randn(1, 3, 15).astype(np.float32)
    want = oracles.sparse_var_grad_disp(ref, tar, rm, tm, disp, ss, mc, g,
                                        max_disp)
    f = lambda d: jnp.vdot(matching.sparse_var(ref, tar, rm, tm, d, max_disp,
                                               "xla"), g)
    got = jax.grad(f)(disp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_spavar_feature_gradients_match_oracle(rng):
    """full_grad=True enables the latent ref/tar feature grads
    (SV_kernel.cu:142-271); the default keeps them zero (no_grad parity)."""
    max_disp = 9
    ref, tar, rm, tm = make_inputs(rng, B=1, H=3, W=15, C=4)
    disp = (rng.rand(1, 3, 15) * max_disp).astype(np.float32)
    out, ss, mc = oracles.sparse_var_fwd(ref, tar, rm, tm, disp, max_disp)
    g = rng.randn(1, 3, 15).astype(np.float32)
    want_gr, want_gt = oracles.sparse_var_bwd_feats(
        ref, tar, rm, tm, disp, out, ss, mc, g, max_disp)

    def f(r, t):
        return jnp.vdot(matching.sparse_var(r, t, rm, tm, disp, max_disp,
                                            "xla", True), g)
    got_gr, got_gt = jax.grad(f, argnums=(0, 1))(ref, tar)
    np.testing.assert_allclose(np.asarray(got_gr), want_gr, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gt), want_gt, rtol=2e-4,
                               atol=1e-5)
    # default (no_grad parity): feature grads exactly zero
    def f0(r, t):
        return jnp.vdot(matching.sparse_var(r, t, rm, tm, disp, max_disp,
                                            "xla"), g)
    z_gr, z_gt = jax.grad(f0, argnums=(0, 1))(ref, tar)
    assert float(jnp.abs(z_gr).max()) == 0.0
    assert float(jnp.abs(z_gt).max()) == 0.0


def test_spavar_full_grad_finite_differences(rng):
    """Central finite differences through the full_grad VJP (features)."""
    max_disp = 6
    ref, tar, rm, tm = make_inputs(rng, B=1, H=2, W=10, C=3, density=0.7)
    # scale features down so exp(cost) stays smooth for finite differences
    ref *= 0.3
    tar *= 0.3
    disp = (rng.rand(1, 2, 10) * max_disp).astype(np.float32)

    def f(r):
        return float(matching.sparse_var(jnp.asarray(r), tar, rm, tm, disp,
                                         max_disp, "xla", True).sum())
    g = jax.grad(lambda r: matching.sparse_var(r, tar, rm, tm, disp,
                                               max_disp, "xla", True).sum())(
        jnp.asarray(ref))
    eps = 1e-3
    for idx in [(0, 0, 3, 1), (0, 1, 7, 2), (0, 0, 9, 0)]:
        rp = ref.copy(); rp[idx] += eps
        rm_ = ref.copy(); rm_[idx] -= eps
        fd = (f(rp) - f(rm_)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), fd, rtol=5e-2, atol=1e-4)


def test_spamat_bf16_inputs(rng):
    ref, tar, rm, tm = make_inputs(rng, B=1, H=2, W=16, C=4)
    out32 = matching.sparse_matching(ref, tar, rm, tm, 8, "xla")
    out16 = matching.sparse_matching(ref.astype(jnp.bfloat16),
                                     tar.astype(jnp.bfloat16), rm, tm, 8, "xla")
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.1, atol=0.15)


def test_fused_matching_with_var_matches_separate(rng):
    from decnet_tpu.ops.matching import (sparse_matching, sparse_var,
                                         sparse_matching_with_var)
    ref, tar, rm, tm = make_inputs(rng, B=1, H=4, W=30, C=5)
    max_disp = 12
    out_sep = sparse_matching(ref, tar, rm, tm, max_disp, "xla")
    var_sep = sparse_var(ref, tar, rm, tm, out_sep, max_disp, "xla")
    out_f, var_f = sparse_matching_with_var(ref, tar, rm, tm, max_disp, "xla")
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_sep),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_sep),
                               rtol=1e-4, atol=1e-5)
    # gradients flow through the matching output like the unfused op
    f1 = lambda r: sparse_matching(r, tar, rm, tm, max_disp, "xla").sum()
    f2 = lambda r: sparse_matching_with_var(r, tar, rm, tm, max_disp,
                                            "xla")[0].sum()
    g1 = jax.grad(f1)(ref)
    g2 = jax.grad(f2)(ref)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-5,
                               atol=1e-6)
