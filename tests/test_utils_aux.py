"""Auxiliary subsystems: occlusion, viz, profiling, wavelet masks, config."""
import os

import numpy as np
import jax.numpy as jnp
import pytest


def test_occlusion_matches_reference_loop(rng):
    from decnet_tpu.ops.occlusion import occlusion_mask
    disp = (rng.rand(2, 4, 30) * 10).astype(np.float32)
    # reference loop (utils/utils.py:195-205)
    B, H, W = disp.shape
    xs = np.arange(W)[None, None, :]
    shift = xs - disp
    min_shift = np.zeros_like(shift)
    min_col = np.ones((B, H)) * W
    for col in range(W - 1, -1, -1):
        min_col = np.where(min_col > shift[..., col], shift[..., col], min_col)
        min_shift[..., col] = min_col
    want = (shift > min_shift) | (shift <= 0)
    got = np.asarray(occlusion_mask(jnp.asarray(disp)))
    np.testing.assert_array_equal(got, want)


def _wavelet_masks_oracle(img, levels, target=0.85):
    """numpy transliteration of utils/Wavelet.py:66-117: per level, Haar
    analysis of the running LL, max |HF| band, per-image min-max normalise,
    adaptive decile threshold search (first t in 0.1..1.0 with
    frac(norm <= t) >= 0.85), mask = norm >= t."""
    gray = img.mean(axis=-1)
    haar = {"lh": np.array([[0.5, 0.5], [-0.5, -0.5]], np.float32),
            "hl": np.array([[0.5, -0.5], [0.5, -0.5]], np.float32),
            "hh": np.array([[0.5, -0.5], [-0.5, 0.5]], np.float32)}
    out = []
    for _ in range(levels):
        B, H, W = gray.shape
        x = gray.reshape(B, H // 2, 2, W // 2, 2)
        e = np.max([np.abs(np.einsum("bhiwj,ij->bhw", x, k))
                    for k in haar.values()], axis=0)
        gray = x.mean(axis=(2, 4))
        masks = []
        for im in e:
            norm = (im - im.min()) / max(im.max() - im.min(), 1e-12)
            for interval in np.arange(0, 1, 0.1):       # Wavelet.py:96
                if (norm <= interval + 0.1).mean() >= target:
                    masks.append((norm >= interval + 0.1).astype(np.float32))
                    break
        out.append(np.stack(masks))
    return out[::-1]


def test_wavelet_masks_match_reference_transliteration(rng):
    from decnet_tpu.ops.detail import wavelet_detail_masks
    img = rng.rand(2, 64, 96, 3).astype(np.float32)
    # add structure so energy distributions differ per image/level
    img[0, 10:30, 20:60] *= 0.1
    img[1, :, ::7] = 1.0
    ms = wavelet_detail_masks(jnp.asarray(img), levels=3)
    assert [m.shape for m in ms] == [(2, 8, 12), (2, 16, 24), (2, 32, 48)]
    want = _wavelet_masks_oracle(img, levels=3)
    for got, ref in zip(ms, want):
        np.testing.assert_array_equal(np.asarray(got), ref)
    for m in ms:  # adaptive threshold keeps density <= 1 - target
        assert float(np.asarray(m).mean()) <= 0.15 + 1e-6


def test_show_imgs_saves_file(tmp_path, rng):
    from decnet_tpu.utils.viz import show_imgs, save_disparity_png, error_map
    disp = rng.rand(20, 30).astype(np.float32) * 50
    img = rng.rand(20, 30, 3).astype(np.float32)
    p = show_imgs([(disp, "disp"), (img, "left"),
                   (error_map(disp, disp + 1, 60), "err", "coolwarm")],
                  save_path=str(tmp_path / "grid.png"))
    assert os.path.exists(p)
    save_disparity_png(str(tmp_path / "d.png"), disp)
    assert os.path.exists(tmp_path / "d.png")


def test_show_dist_saves_file(tmp_path, rng):
    from decnet_tpu.utils.viz import show_dist, disparity_histogram
    disp = rng.rand(20, 30).astype(np.float32) * 50
    x, y = disparity_histogram(disp, max_disp=60)
    assert x.shape == y.shape and y.sum() == (disp > 0).sum()
    p = show_dist([(x, y, "hist"),
                   {"x": x, "y": y, "title": "with points",
                    "points": (x[:3], y[:3])}],
                  save_path=str(tmp_path / "dist.png"))
    assert os.path.exists(p)


def test_timer_reports(rng):
    from decnet_tpu.utils.profiling import Timer
    t = Timer()
    x = jnp.ones((8, 8))
    for _ in range(3):
        t.timed("matmul", lambda: x @ x)
    s = t.summary()
    assert "matmul" in s and s["matmul"] >= 0
    assert "matmul" in t.report()


def test_config_roundtrip_and_overrides(tmp_path):
    from decnet_tpu.config import Config
    cfg = Config()
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    cfg2 = Config.load(p)
    assert cfg2.model.max_disp == cfg.model.max_disp
    cfg3 = cfg2.apply_overrides(["model.max_disp=189", "train.lr=0.01",
                                 "model.use_detail=false"])
    assert cfg3.model.max_disp == 189
    assert cfg3.train.lr == 0.01
    assert cfg3.model.use_detail is False
    with pytest.raises(KeyError):
        cfg2.apply_overrides(["model.nonexistent=1"])


def test_adaptive_disp_samples_properties(rng):
    from decnet_tpu.ops.regression import adaptive_disp_samples
    disp = (rng.rand(1, 9, 9) * 20).astype(np.float32)
    s = np.asarray(adaptive_disp_samples(jnp.asarray(disp), 24, 1.0, 8, 3))
    assert s.shape == (1, 8, 9, 9)
    assert (np.diff(s, axis=1) >= -1e-5).all()      # monotone samples
    assert s.min() >= 0 and s.max() <= 24
    # range covers at least samp_num*step (padded) unless clamped at borders
    rng_width = s[:, -1] - s[:, 0]
    assert (rng_width >= 0).all()


def test_sidecar_lenient_load_and_cli_precedence(tmp_path):
    """Checkpoint config sidecars: unknown keys from newer revisions are
    skipped (not KeyError), and explicit CLI flags / --set model.* overrides
    win over the sidecar instead of being silently discarded (ADVICE r4)."""
    import argparse
    import json
    from decnet_tpu.config import Config
    from decnet_tpu.cli.common import add_config_args, build_config, \
        apply_checkpoint_sidecar

    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    side = Config()
    side.model.thold = 0.5
    side.model.match_window = 7
    side.model.max_disp = 189
    d = side.to_dict()
    d["model"]["from_the_future"] = 42      # newer-revision key
    with open(ckpt / "config.json", "w") as f:
        json.dump(d, f)

    # lenient load skips the unknown key; strict load raises
    cfg = Config.load(str(ckpt / "config.json"), lenient=True)
    assert cfg.model.match_window == 7
    with pytest.raises(KeyError):
        Config.load(str(ckpt / "config.json"))

    p = argparse.ArgumentParser()
    add_config_args(p)
    args = p.parse_args(["--resume", str(ckpt), "--thold", "0.8",
                         "--set", "model.match_window=3"])
    cfg = build_config(args)
    cfg = apply_checkpoint_sidecar(cfg, args)
    assert cfg.model.thold == 0.8           # CLI flag wins over sidecar
    assert cfg.model.match_window == 3      # --set model.* wins over sidecar
    assert cfg.model.max_disp == 216        # runtime knob: CLI/default value

    # no CLI intent: sidecar architecture is adopted wholesale
    args2 = p.parse_args(["--resume", str(ckpt)])
    cfg2 = apply_checkpoint_sidecar(build_config(args2), args2)
    assert cfg2.model.thold == 0.5 and cfg2.model.match_window == 7
