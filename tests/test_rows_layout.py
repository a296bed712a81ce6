"""Rows-form layout path: s2d<->rows helpers, rows-form matching and warp.

Rows-form (B,H,C,W) is the Pallas kernels' native layout; the stage-3 s2d
pipeline converts the extractor's s2d output once instead of paying an NHWC
transpose at every kernel boundary.  These tests pin the layout algebra and
the rows-form APIs against their NHWC twins.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decnet_tpu.nn.layers import (space_to_depth, depth_to_space, s2d_to_rows,
                                  rows_to_s2d, plane_to_s2d, s2d_to_plane,
                                  pixel_shuffle)
from decnet_tpu.ops.matching import (sparse_matching_with_var,
                                     sparse_matching_with_var_rows)
from decnet_tpu.ops.warp import warp_by_disparity
from decnet_tpu.ops.pallas.warp import warp_rows_fast


def _nhwc_to_rows(x):
    return x.transpose(0, 1, 3, 2)


def test_s2d_to_rows_matches_depth_to_space(rng):
    x_s2d = jnp.asarray(rng.randn(2, 4, 5, 9 * 3).astype(np.float32))
    rows = s2d_to_rows(x_s2d, 3)                       # (B,H,C,W)
    full = depth_to_space(x_s2d, 3)                    # (B,H,W,C)
    np.testing.assert_array_equal(np.asarray(rows),
                                  np.asarray(_nhwc_to_rows(full)))


def test_rows_to_s2d_roundtrip(rng):
    x_s2d = jnp.asarray(rng.randn(1, 3, 4, 9 * 5).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(rows_to_s2d(s2d_to_rows(x_s2d, 3), 3)), np.asarray(x_s2d))


def test_plane_helpers_roundtrip_and_pixel_shuffle_convention(rng):
    m = jnp.asarray(rng.randn(2, 6, 9).astype(np.float32))
    p = plane_to_s2d(m, 3)
    assert p.shape == (2, 2, 3, 9)
    np.testing.assert_array_equal(np.asarray(s2d_to_plane(p, 3)),
                                  np.asarray(m))
    # pixel_shuffle channel->offset convention == s2d plane convention
    np.testing.assert_array_equal(
        np.asarray(pixel_shuffle(p, 3)[..., 0]), np.asarray(m))


def test_rows_matching_matches_nhwc(rng):
    B, H, W, C, D = 2, 5, 40, 6, 12
    ref = rng.randn(B, H, W, C).astype(np.float32)
    tar = rng.randn(B, H, W, C).astype(np.float32)
    lm = (rng.rand(B, H, W) < 0.4).astype(np.float32)
    rm = (rng.rand(B, H, W) < 0.6).astype(np.float32)
    want_out, want_var = sparse_matching_with_var(ref, tar, lm, rm, D)
    got_out, got_var = sparse_matching_with_var_rows(
        jnp.asarray(_nhwc_to_rows(ref)), jnp.asarray(_nhwc_to_rows(tar)),
        lm, rm, D)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(want_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(want_var),
                               rtol=1e-4, atol=1e-4)


def test_rows_matching_gradients_match_nhwc(rng):
    B, H, W, C, D = 1, 4, 30, 4, 8
    ref = rng.randn(B, H, W, C).astype(np.float32)
    tar = rng.randn(B, H, W, C).astype(np.float32)
    lm = (rng.rand(B, H, W) < 0.5).astype(np.float32)
    rm = (rng.rand(B, H, W) < 0.7).astype(np.float32)

    def f_nhwc(r, t):
        out, _ = sparse_matching_with_var(r, t, lm, rm, D)
        return jnp.sum(jnp.sin(out))

    def f_rows(r, t):
        out, _ = sparse_matching_with_var_rows(r, t, lm, rm, D)
        return jnp.sum(jnp.sin(out))

    gr, gt = jax.grad(f_nhwc, argnums=(0, 1))(jnp.asarray(ref),
                                              jnp.asarray(tar))
    grr, gtr = jax.grad(f_rows, argnums=(0, 1))(
        jnp.asarray(_nhwc_to_rows(ref)), jnp.asarray(_nhwc_to_rows(tar)))
    np.testing.assert_allclose(np.asarray(grr),
                               np.asarray(_nhwc_to_rows(np.asarray(gr))),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gtr),
                               np.asarray(_nhwc_to_rows(np.asarray(gt))),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape,max_disp", [((1, 6, 40, 4), 12),
                                            ((2, 9, 130, 8), 24)])
def test_warp_rows_matches_reference(rng, shape, max_disp):
    B, H, W, C = shape
    img = rng.randn(*shape).astype(np.float32)
    disp = (rng.rand(B, H, W) * max_disp * 0.9).astype(np.float32)
    want = np.asarray(warp_by_disparity(img, disp))
    got = np.asarray(warp_rows_fast(jnp.asarray(_nhwc_to_rows(img)),
                                    jnp.asarray(disp), max_disp))
    np.testing.assert_allclose(got, np.asarray(_nhwc_to_rows(want)),
                               rtol=1e-4, atol=1e-4)


def test_warp_rows_preserves_dtype(rng):
    img = rng.randn(1, 4, 40, 4).astype(np.float32)
    disp = (rng.rand(1, 4, 40) * 8).astype(np.float32)
    rows_bf16 = jnp.asarray(_nhwc_to_rows(img)).astype(jnp.bfloat16)
    out = warp_rows_fast(rows_bf16, jnp.asarray(disp), 8)
    assert out.dtype == jnp.bfloat16
