"""Pallas banded warp vs the XLA reference warp (torch-grid_sample parity)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decnet_tpu.ops.warp import warp_by_disparity
from decnet_tpu.ops.pallas.warp import warp_by_disparity_fast, NEG_MARGIN


@pytest.mark.parametrize("shape,max_disp", [((1, 6, 40, 4), 12),
                                            ((2, 9, 130, 8), 24)])
def test_fast_warp_matches_reference(rng, shape, max_disp):
    B, H, W, C = shape
    img = rng.randn(*shape).astype(np.float32)
    disp = (rng.rand(B, H, W) * max_disp * 0.9).astype(np.float32)
    want = np.asarray(warp_by_disparity(img, disp))
    got = np.asarray(warp_by_disparity_fast(img, disp, max_disp))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fast_warp_negative_disparity(rng):
    img = rng.randn(1, 4, 50, 3).astype(np.float32)
    disp = (rng.rand(1, 4, 50) * 20 - 10).astype(np.float32)  # in [-10, 10)
    want = np.asarray(warp_by_disparity(img, disp))
    got = np.asarray(warp_by_disparity_fast(img, disp, 16))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fast_warp_border_rows_halved(rng):
    """align_corners=False quirk: top/bottom rows interpolate with the zero
    border (weight 0.5) — parity with torch grid_sample."""
    img = np.ones((1, 5, 30, 2), np.float32)
    disp = np.zeros((1, 5, 30), np.float32)
    got = np.asarray(warp_by_disparity_fast(img, disp, 8))
    want = np.asarray(warp_by_disparity(img, disp))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert abs(got[0, 0, 15, 0] - 0.5) < 1e-4      # top row halved
    assert abs(got[0, 2, 15, 0] - 1.0) < 1e-4      # interior intact


def test_fast_warp_gradients_match_reference(rng):
    img = rng.randn(1, 4, 36, 3).astype(np.float32)
    disp = (rng.rand(1, 4, 36) * 8).astype(np.float32)

    def loss_ref(i, d):
        return (warp_by_disparity(i, d) ** 2).sum()

    def loss_fast(i, d):
        return (warp_by_disparity_fast(i, d, 12) ** 2).sum()

    gi_r, gd_r = jax.grad(loss_ref, argnums=(0, 1))(img, disp)
    gi_f, gd_f = jax.grad(loss_fast, argnums=(0, 1))(img, disp)
    np.testing.assert_allclose(np.asarray(gi_f), np.asarray(gi_r), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gd_f), np.asarray(gd_r), rtol=1e-3,
                               atol=1e-4)


def test_fast_warp_gradients_bf16(rng):
    """Regression: bf16 training path — the Pallas forward emits bf16 while
    the XLA reference VJP expects an f32 cotangent (round-2 TPU train-step
    crash); grads must come back finite and in the primal dtypes."""
    from decnet_tpu.ops.pallas.warp import warp_rows_fast
    img = rng.randn(1, 4, 36, 3).astype(np.float32)
    disp = (rng.rand(1, 4, 36) * 8).astype(np.float32)
    img16 = jnp.asarray(img, jnp.bfloat16)

    gi, gd = jax.grad(
        lambda i, d: (warp_by_disparity_fast(i, d, 12) ** 2).sum().astype(
            jnp.float32), argnums=(0, 1))(img16, disp)
    assert gi.dtype == jnp.bfloat16 and gd.dtype == jnp.float32
    assert np.isfinite(np.asarray(gi, np.float32)).all()
    gi_r = jax.grad(
        lambda i, d: (warp_by_disparity(i, d) ** 2).sum())(img, disp)
    np.testing.assert_allclose(np.asarray(gi, np.float32), np.asarray(gi_r),
                               rtol=0.1, atol=0.2)

    rows16 = img16.transpose(0, 1, 3, 2)
    gi2, gd2 = jax.grad(
        lambda i, d: (warp_rows_fast(i, d, 12) ** 2).sum().astype(
            jnp.float32), argnums=(0, 1))(rows16, disp)
    assert gi2.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(gi2.transpose(0, 1, 3, 2), np.float32),
        np.asarray(gi, np.float32), rtol=1e-2, atol=1e-2)
