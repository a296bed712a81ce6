"""Pallas spamat kernels vs numpy oracles (interpret mode on CPU; compiled on
TPU when DECNET_TEST_TPU=1)."""
import numpy as np
import jax
import pytest

from decnet_tpu.ops.pallas import spamat as k
from tests import oracles


def make_inputs(rng, B=1, H=3, W=40, C=8, density=0.5):
    ref = rng.randn(B, H, W, C).astype(np.float32)
    tar = rng.randn(B, H, W, C).astype(np.float32)
    rm = (rng.rand(B, H, W) < density).astype(np.float32)
    tm = (rng.rand(B, H, W) < density).astype(np.float32)
    return ref, tar, rm, tm


@pytest.mark.parametrize("max_disp,W", [(8, 40), (24, 130), (3, 16)])
def test_pallas_forward_matches_oracle(rng, max_disp, W):
    ref, tar, rm, tm = make_inputs(rng, W=W)
    want, want_ss, want_mc = oracles.sparse_matching_fwd(ref, tar, rm, tm,
                                                         max_disp)
    got, got_ss, got_mc = k.spamat_forward(ref, tar, rm, tm, max_disp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ss), want_ss, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mc), want_mc, rtol=1e-4,
                               atol=1e-5)


def test_pallas_forward_multi_tile(rng):
    """W spanning several 128-wide tiles with disparity crossing tiles."""
    ref, tar, rm, tm = make_inputs(rng, B=1, H=2, W=300, C=4, density=0.7)
    max_disp = 60
    want, _, _ = oracles.sparse_matching_fwd(ref, tar, rm, tm, max_disp)
    got, _, _ = k.spamat_forward(ref, tar, rm, tm, max_disp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_pallas_backward_matches_oracle(rng):
    max_disp = 10
    ref, tar, rm, tm = make_inputs(rng, B=1, H=2, W=50, C=4)
    out, ss, mc = oracles.sparse_matching_fwd(ref, tar, rm, tm, max_disp)
    g = rng.randn(*out.shape).astype(np.float32)
    want_gr, want_gt = oracles.sparse_matching_bwd(ref, tar, rm, tm, out, ss,
                                                   mc, g, max_disp)
    got_gr, got_gt = k.spamat_backward(ref, tar, rm, tm, out, ss, mc, g,
                                       max_disp)
    np.testing.assert_allclose(np.asarray(got_gr), want_gr, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gt), want_gt, rtol=2e-4,
                               atol=1e-5)


def test_pallas_spavar_matches_oracle(rng):
    max_disp = 12
    ref, tar, rm, tm = make_inputs(rng, W=64, C=4)
    disp = (rng.rand(*rm.shape) * max_disp).astype(np.float32)
    want, want_ss, want_mc = oracles.sparse_var_fwd(ref, tar, rm, tm, disp,
                                                    max_disp)
    got, got_ss, got_mc, _, _ = k.spavar_forward(ref, tar, rm, tm, disp,
                                                 max_disp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_ss), want_ss, rtol=1e-4,
                               atol=1e-5)


def test_pallas_matches_xla_impl(rng):
    """The two implementations must agree bit-for-bit-ish on random data."""
    from decnet_tpu.ops import matching
    max_disp = 16
    ref, tar, rm, tm = make_inputs(rng, B=2, H=4, W=96, C=8, density=0.6)
    p_out, p_ss, p_mc = k.spamat_forward(ref, tar, rm, tm, max_disp)
    x_out, x_ss, x_mc = matching._spamat_fwd_xla(ref, tar, rm, tm, max_disp)
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(x_out),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_ss), np.asarray(x_ss),
                               rtol=1e-5, atol=1e-6)


def test_pallas_tile_skip_clustered_masks(rng):
    """The kernels skip whole (rows x query-tile) programs whose ref-mask
    block is all zero (the TPU analog of SM_kernel.cu:32-33's per-thread
    early exit). Clustered masks leave most tiles empty; results must still
    match the oracle exactly, including the all-empty extreme."""
    max_disp = 20
    ref, tar, rm, tm = make_inputs(rng, B=1, H=2, W=300, C=4, density=0.7)
    # confine the query mask to the first few columns -> tiles 2..3 skip
    rm[:, :, 24:] = 0.0
    want, want_ss, want_mc = oracles.sparse_matching_fwd(ref, tar, rm, tm,
                                                         max_disp)
    got, got_ss, got_mc = k.spamat_forward(ref, tar, rm, tm, max_disp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_ss), want_ss, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_mc), want_mc, rtol=1e-4,
                               atol=1e-5)

    out, ss, mc = want, want_ss, want_mc
    g = rng.randn(*out.shape).astype(np.float32)
    want_gr, want_gt = oracles.sparse_matching_bwd(ref, tar, rm, tm, out, ss,
                                                   mc, g, max_disp)
    got_gr, got_gt = k.spamat_backward(ref, tar, rm, tm, out, ss, mc, g,
                                       max_disp)
    np.testing.assert_allclose(np.asarray(got_gr), want_gr, rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gt), want_gt, rtol=2e-4,
                               atol=1e-5)

    # all-empty masks: every tile skips; outputs are exactly zero
    zm = np.zeros_like(rm)
    z_out, z_ss, z_mc = k.spamat_forward(ref, tar, zm, tm, max_disp)
    assert np.all(np.asarray(z_out) == 0)
    assert np.all(np.asarray(z_ss) == 0)
    assert np.all(np.asarray(z_mc) == 0)


def test_pallas_backward_no_nan_with_large_features(rng):
    """Regression: at ref_mask==0 queries the stored max_cost is 0, so the
    dRef kernel's exp(s) can overflow; the gating must discard the inf before
    any multiply (inf*0 -> NaN was a real training blow-up)."""
    max_disp = 8
    ref, tar, rm, tm = make_inputs(rng, B=1, H=2, W=40, C=8, density=0.5)
    ref *= 12.0   # dot products ~ hundreds -> exp overflows where unclamped
    tar *= 12.0
    out, ss, mc = oracles.sparse_matching_fwd(ref, tar, rm, tm, max_disp)
    g = rng.randn(*out.shape).astype(np.float32)
    gr, gt = k.spamat_backward(ref, tar, rm, tm, out, ss, mc, g, max_disp)
    assert np.isfinite(np.asarray(gr)).all()
    assert np.isfinite(np.asarray(gt)).all()
    want_gr, want_gt = oracles.sparse_matching_bwd(ref, tar, rm, tm, out, ss,
                                                   mc, g, max_disp)
    np.testing.assert_allclose(np.asarray(gr), want_gr, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt), want_gt, rtol=5e-3, atol=1e-4)
