"""grid_sample / warp / resize parity vs numpy oracles and torch (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from decnet_tpu.ops import warp as warp_ops
from decnet_tpu.ops import resize as resize_ops
from decnet_tpu.ops import regression, cost_volume
from tests import oracles


def test_grid_sample_matches_oracle(rng):
    img = rng.randn(2, 6, 9, 3).astype(np.float32)
    grid = (rng.rand(2, 4, 5, 2) * 2.4 - 1.2).astype(np.float32)
    want = oracles.grid_sample_bilinear_zeros(img, grid)
    got = warp_ops.grid_sample_normalized(img, grid)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    torch = pytest.importorskip("torch")
    img = rng.randn(2, 5, 8, 3).astype(np.float32)
    grid = (rng.rand(2, 5, 8, 2) * 2.4 - 1.2).astype(np.float32)
    want = torch.nn.functional.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros",
        align_corners=False).permute(0, 2, 3, 1).numpy()
    got = warp_ops.grid_sample_normalized(img, grid)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_warp_by_disparity_matches_oracle(rng):
    img = rng.randn(1, 4, 12, 2).astype(np.float32)
    disp = (rng.rand(1, 4, 12) * 6).astype(np.float32)
    want = oracles.warp_by_disparity(img, disp)
    got = warp_ops.warp_by_disparity(img, disp)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("factor", [3, 9])
def test_interpolate_down_matches_torch(rng, mode, factor):
    torch = pytest.importorskip("torch")
    img = rng.randn(2, 27, 54, 3).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), scale_factor=1 / factor,
        mode=mode).permute(0, 2, 3, 1).numpy()
    got = resize_ops.interpolate(img, 27 // factor, 54 // factor, mode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_interpolate_up_matches_torch(rng, mode):
    torch = pytest.importorskip("torch")
    img = rng.randn(1, 6, 8, 2).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), scale_factor=3,
        mode=mode).permute(0, 2, 3, 1).numpy()
    got = resize_ops.interpolate(img, 18, 24, mode)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_disparity_regression_matches_oracle(rng):
    cost = rng.randn(2, 12, 4, 6).astype(np.float32)
    samples = np.broadcast_to(
        np.arange(12, dtype=np.float32)[None, :, None, None], cost.shape)
    want = oracles.disparity_regression(cost, samples)
    got = regression.disparity_regression(cost, jnp.asarray(samples))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_cost_volume_cor_matches_torch_reference_semantics(rng):
    """Replicate the torch pipeline (grid_sample warp + left zeroing + product)
    in-line and compare (reference submodule.py:479-562)."""
    torch = pytest.importorskip("torch")
    B, H, W, C, S = 1, 5, 11, 4, 6
    left = rng.randn(B, H, W, C).astype(np.float32)
    right = rng.randn(B, H, W, C).astype(np.float32)
    samples = np.broadcast_to(
        np.arange(S, dtype=np.float32)[None, :, None, None], (B, S, H, W)).copy()

    lt = torch.from_numpy(left).permute(0, 3, 1, 2)
    rt = torch.from_numpy(right).permute(0, 3, 1, 2)
    ds = torch.from_numpy(samples)
    ys, xs = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                            torch.arange(W, dtype=torch.float32))
    pos_x = xs.reshape(1, 1, H, W).repeat(B, S, 1, 1)
    pos_y = ys.reshape(1, 1, H, W).repeat(B, S, 1, 1)
    cx = (pos_x - ds) / ((W - 1.0) / 2.0) - 1.0
    cy = pos_y / ((H - 1.0) / 2.0) - 1.0
    grid = torch.stack([cx, cy], dim=4)
    rvol = torch.nn.functional.grid_sample(
        rt, grid.view(B, S * H, W, 2), mode="bilinear",
        padding_mode="zeros", align_corners=False).view(B, C, S, H, W)
    lvol = lt.unsqueeze(2).repeat(1, 1, S, 1, 1)
    lvol = lvol.transpose(0, 1).contiguous()
    lvol[:, pos_x < ds] = 0
    lvol = lvol.transpose(0, 1)
    want = (lvol * rvol).permute(0, 2, 3, 4, 1).numpy()

    got = cost_volume.build_cost_volume(left, right, jnp.asarray(samples), "cor")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cost_func", ["cor", "cat", "ssd"])
def test_cost_volume_uniform_matches_gather_path(rng, cost_func):
    """The stage-0 static-matmul volume (build_cost_volume_uniform) must equal
    the general gather-based path on the uniform hypothesis set."""
    B, H, W, C, S = 2, 7, 13, 5, 6
    left = rng.randn(B, H, W, C).astype(np.float32)
    right = rng.randn(B, H, W, C).astype(np.float32)
    samples = np.broadcast_to(
        np.arange(S, dtype=np.float32)[None, :, None, None],
        (B, S, H, W)).copy()
    want = cost_volume.build_cost_volume(left, right, jnp.asarray(samples),
                                         cost_func)
    got = cost_volume.build_cost_volume_uniform(left, right, S, cost_func)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_warp_volume_uniform_matches_vmap_gather(rng):
    B, H, W, C, S = 1, 20, 36, 3, 8
    img = rng.randn(B, H, W, C).astype(np.float32)
    samples = np.broadcast_to(
        np.arange(S, dtype=np.float32)[None, :, None, None],
        (B, S, H, W)).copy()
    want = warp_ops.warp_volume_by_disparity(img, jnp.asarray(samples))
    got = warp_ops.warp_volume_uniform(img, S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
