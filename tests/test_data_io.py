"""IO, detail-mask pipelines (cv2 / C++ / JAX) and their mutual consistency."""
import os

import numpy as np
import pytest

from decnet_tpu.data import io as dio
from decnet_tpu.data import masks as dmasks
from decnet_tpu.data import native


def test_pfm_roundtrip(tmp_path, rng):
    d = (rng.rand(17, 23).astype(np.float32) * 100)
    p = str(tmp_path / "d.pfm")
    dio.write_pfm(p, d)
    back, scale = dio.read_pfm(p)
    np.testing.assert_allclose(back, d, rtol=1e-6)


def test_pfm_native_decode(tmp_path, rng):
    if not native.available():
        pytest.skip("native lib not built")
    d = (rng.rand(11, 13).astype(np.float32) * 50)
    p = str(tmp_path / "d.pfm")
    dio.write_pfm(p, d)
    with open(p, "rb") as f:
        got = native.decode_pfm(f.read())
    np.testing.assert_allclose(got, d, rtol=1e-6)


def test_submission_png_roundtrip(tmp_path, rng):
    disp = (rng.rand(30, 40) * 200).astype(np.float32)
    p = str(tmp_path / "sub.png")
    dio.write_submission_png(p, disp, ori_h=27, ori_w=36)
    back = dio.read_disparity_png(p)
    np.testing.assert_allclose(back, np.round(disp[-27:, -36:] * 256) / 256,
                               atol=1 / 256.0)


def test_pad_to_multiple():
    img = np.ones((50, 70, 3), np.float32)
    out = dio.pad_to_multiple(img, 27)
    assert out.shape == (54, 81, 3)
    assert (out[-50:, -70:] == 1).all() and out[0, 0, 0] == 0


def test_calib_ndisp(tmp_path):
    p = str(tmp_path / "calib.txt")
    with open(p, "w") as f:
        f.write("cam0=...\nndisp=260\n")
    assert dio.read_calib_ndisp(p) == 270  # ceil(260/27)*27


def test_detail_masks_shapes(rng):
    img = rng.rand(54, 81, 3).astype(np.float32)
    ms = dmasks.detail_masks_np(img, scale=3, levels=3, thold=0.3)
    assert [m.shape for m in ms] == [(6, 9), (18, 27), (54, 81)]
    for m in ms:
        assert set(np.unique(m)).issubset({0.0, 1.0})


def test_native_masks_close_to_cv2(rng):
    """C++ and cv2 pipelines agree except at a small band of threshold-
    boundary pixels (different fixed/float arithmetic in resize/blur)."""
    if not native.available():
        pytest.skip("native lib not built")
    img = rng.rand(54, 81, 3).astype(np.float32)
    got = native.detail_masks(img, 3, 3, 0.3)
    cv2 = pytest.importorskip("cv2")
    ref = []
    data = img.copy()
    for _ in range(3):
        down = cv2.resize(cv2.GaussianBlur(data, (3, 3), 1),
                          (data.shape[1] // 3, data.shape[0] // 3))
        up = cv2.GaussianBlur(
            cv2.resize(down, (data.shape[1], data.shape[0])), (5, 5), 1)
        r = np.abs(data - up).sum(axis=2)
        norm = (r - r.min()) / max(r.max() - r.min(), 1e-12)
        ref.append((norm >= 0.3).astype(np.float32))
        data = down
    ref = ref[::-1]
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        agree = (g == r).mean()
        assert agree > 0.98, f"native/cv2 mask agreement {agree}"


def test_jax_masks_close_to_numpy(rng):
    from decnet_tpu.ops.detail import detail_masks as jmasks
    img = rng.rand(1, 54, 81, 3).astype(np.float32)
    got = jmasks(img, 3, 3, 0.3)
    want = dmasks.detail_masks_np(img[0], 3, 3, 0.3)
    for g, w in zip(got, want):
        agree = (np.asarray(g)[0] == w).mean()
        assert agree > 0.97, f"jax/np mask agreement {agree}"


def test_normalize_image():
    img = np.ones((4, 4, 3), np.float32) * 0.5
    out = dio.normalize_image(img)
    np.testing.assert_allclose(out[0, 0],
                               (0.5 - dio.IMAGENET_MEAN) / dio.IMAGENET_STD,
                               rtol=1e-6)
