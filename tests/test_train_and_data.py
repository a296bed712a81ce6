"""Train step, datasets (synthetic fixtures), loader, checkpointing."""
import os
import pickle

import numpy as np
import jax
import pytest

from decnet_tpu.config import Config, ModelConfig


def tiny_config():
    cfg = Config()
    cfg.model = ModelConfig(max_disp=27, base_channels=4, num_stage=4,
                            down_scale=3, use_detail=True, thold=0.5,
                            dtype="float32", matching_impl="xla")
    cfg.train.batch_size = 2
    cfg.train.total_steps = 10
    return cfg


def make_batch(rng, B=2, H=54, W=54):
    mk = lambda h, w: (rng.rand(B, h, w) < 0.4).astype(np.float32)
    return {
        "left": rng.rand(B, H, W, 3).astype(np.float32),
        "right": rng.rand(B, H, W, 3).astype(np.float32),
        "gt": (rng.rand(B, H, W) * 20).astype(np.float32),
        "left_masks": [mk(H // 9, W // 9), mk(H // 3, W // 3), mk(H, W)],
        "right_masks": [mk(H // 9, W // 9), mk(H // 3, W // 3), mk(H, W)],
    }


def test_train_step_decreases_loss(rng):
    from decnet_tpu.models import get_model
    from decnet_tpu.train.state import create_train_state
    from decnet_tpu.train.step import make_train_step

    cfg = tiny_config()
    cfg.train.lr = 1e-3
    cfg.train.warmup_steps = 1
    model = get_model("decnet", cfg.model)
    batch = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), batch["left"],
                           batch["right"])
    state = create_train_state(model, variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    losses = []
    for _ in range(8):
        state, logs = step(state, batch)
        losses.append(float(logs["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_checkpoint_roundtrip(tmp_path, rng):
    from decnet_tpu.models import get_model
    from decnet_tpu.train.state import create_train_state
    from decnet_tpu.train.checkpoint import CheckpointManager

    cfg = tiny_config()
    model = get_model("decnet", cfg.model)
    batch = make_batch(rng, B=1)
    variables = model.init(jax.random.PRNGKey(0), batch["left"],
                           batch["right"])
    state = create_train_state(model, variables, cfg.train)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(3, state)
    state2 = create_train_state(model, variables, cfg.train)
    state2 = mgr.restore(state2)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _write_sceneflow_fixture(root, n=3, h=54, w=81, with_masks=False):
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    rng = np.random.RandomState(7)
    for i in range(n):
        pack = np.concatenate([
            rng.randint(0, 255, (h, w, 6)).astype(np.float32),
            (rng.rand(h, w, 1) * 30).astype(np.float32)], axis=-1)
        np.save(os.path.join(root, "train", f"{i:04d}.npy"), pack)
    if with_masks:
        mdir = os.path.join(root, "train_mask")
        os.makedirs(mdir, exist_ok=True)
        for i in range(n):
            masks = []
            for side in range(2):
                for lvl in range(3):
                    s = 3 ** lvl
                    masks.append((rng.rand(h // s, w // s) < 0.3
                                  ).astype(np.float32))
            with open(os.path.join(mdir, f"{i:04d}"), "wb") as f:
                pickle.dump(masks, f)


def test_sceneflow_dataset_computed_masks(tmp_path):
    from decnet_tpu.data.datasets import get_dataset
    _write_sceneflow_fixture(str(tmp_path))
    ds = get_dataset("sceneflow", str(tmp_path), split="train",
                     is_training=False)
    s = ds[0]
    assert s["left"].shape == (54, 81, 3)
    assert s["gt"].shape == (54, 81)
    assert [m.shape for m in s["left_masks"]] == [(6, 9), (18, 27), (54, 81)]
    assert s["n_disp"] == 192


def test_sceneflow_dataset_precomputed_masks_and_crop(tmp_path):
    from decnet_tpu.data.datasets import get_dataset
    _write_sceneflow_fixture(str(tmp_path), h=81, w=108, with_masks=True)
    ds = get_dataset("sceneflow", str(tmp_path), split="train",
                     is_training=True, img_size=(54, 81),
                     mask_source="precomputed")
    s = ds[0]
    assert s["left"].shape == (54, 81, 3)
    assert [m.shape for m in s["left_masks"]] == [(6, 9), (18, 27), (54, 81)]
    # crops must keep masks binary
    for m in s["left_masks"]:
        assert set(np.unique(m)).issubset({0.0, 1.0})


def test_middlebury_dataset(tmp_path):
    from decnet_tpu.data.datasets import get_dataset
    os.makedirs(tmp_path / "eval_F")
    rng = np.random.RandomState(3)
    d = {"ndisp": 70, "im0": rng.randint(0, 255, (60, 90, 3)).astype(np.float32),
         "im1": rng.randint(0, 255, (60, 90, 3)).astype(np.float32),
         "disparity": (rng.rand(60, 90) * 60).astype(np.float32),
         "disparity_right": (rng.rand(60, 90) * 60).astype(np.float32)}
    with open(tmp_path / "eval_F" / "scene1.pkl", "wb") as f:
        pickle.dump(d, f)
    ds = get_dataset("middlebury", str(tmp_path), split="eval_F")
    s = ds[0]
    assert s["n_disp"] == 70
    assert s["left"].shape == (81, 108, 3)  # padded to x27
    assert s["ori_h"] == 60 and s["ori_w"] == 90


def test_middlebury_split_zoo_and_quality_filter(tmp_path):
    """Reference directory layout (MiddleburyMask.py:33-76) + the training
    name-suffix quality filter > 0.88 (:81-90)."""
    from decnet_tpu.data.datasets import get_dataset
    base = tmp_path / "MiddEval3Q_processed" / "trainingQ"
    os.makedirs(base)
    rng = np.random.RandomState(3)
    d = {"ndisp": 70,
         "im0": rng.randint(0, 255, (60, 90, 3)).astype(np.float32),
         "im1": rng.randint(0, 255, (60, 90, 3)).astype(np.float32),
         "disparity": (rng.rand(60, 90) * 60).astype(np.float32)}
    for name in ("good-0.95.pkl", "bad-0.50.pkl", "plain.pkl",
                 "sceneperfect.pkl"):
        with open(base / name, "wb") as f:
            pickle.dump(d, f)
    # eval: all four files, mapped through the zoo directory
    ds = get_dataset("middlebury", str(tmp_path), split="eval_Q")
    assert len(ds) == 4 and not ds.is_training
    assert ds[0]["n_disp"] == 70
    # train: score > 0.88 kept; non-numeric kept unless 'perfect' in name
    ds = get_dataset("middlebury", str(tmp_path), split="train_Q",
                     img_size=(54, 81))
    kept = sorted(os.path.basename(p) for p in ds.files)
    assert kept == ["good-0.95.pkl", "plain.pkl"]


def test_middlebury_train_pads_small_images_to_target(tmp_path):
    """Training pad-or-crop (MiddleburyMask.py:178-193): images smaller than
    the crop target are zero-padded at the TOP and LEFT."""
    from decnet_tpu.data.datasets import get_dataset
    os.makedirs(tmp_path / "train_custom")
    rng = np.random.RandomState(5)
    d = {"ndisp": 30,
         "im0": rng.randint(1, 255, (30, 40, 3)).astype(np.float32),
         "im1": rng.randint(1, 255, (30, 40, 3)).astype(np.float32),
         "disparity": (rng.rand(30, 40) * 20 + 1).astype(np.float32)}
    with open(tmp_path / "train_custom" / "tiny.pkl", "wb") as f:
        pickle.dump(d, f)
    ds = get_dataset("middlebury", str(tmp_path), split="train_custom",
                     img_size=(54, 81), is_training=True,
                     augment_cfg={"glare": False})
    s = ds[0]
    assert s["left"].shape == (54, 81, 3)
    # original 30x40 pads to 54x54 (x27), then to the 54x81 target: the
    # left-most 81-54=27 columns and top rows are zero-padded
    assert (s["gt"][:, :27] == 0).all()
    assert (s["gt"][-30:, -40:] > 0).any()
    assert [m.shape for m in s["left_masks"]] == [(6, 9), (18, 27), (54, 81)]


class _FakeRng:
    """Deterministic stand-in for RandomState: binomial/rand return scripted
    values, everything else delegates to a real RandomState."""
    def __init__(self, binomials, rands):
        self._b = list(binomials)
        self._r = list(rands)
        self._real = np.random.RandomState(0)

    def binomial(self, n, p):
        return self._b.pop(0)

    def rand(self, *shape):
        if not shape:
            return self._r.pop(0)
        return self._real.rand(*shape)

    def __getattr__(self, k):
        return getattr(self._real, k)


def test_kitti_object_mask_and_aug_schedule(tmp_path):
    """KITTI15Mask.py:140-162 parity: double glare (p=.8 then p=.5), mean-
    colour occlusion p=.5, and the 8th-channel object-mask GT multiply
    p=.3."""
    from decnet_tpu.data.datasets import get_dataset
    os.makedirs(tmp_path / "train")
    rng = np.random.RandomState(7)
    h, w = 54, 81
    pack = np.zeros((h, w, 8), np.float32)
    pack[..., 0:3] = rng.randint(0, 200, (h, w, 3))
    pack[..., 3:6] = rng.randint(0, 200, (h, w, 3))
    pack[..., 6] = rng.rand(h, w) * 20 + 1
    pack[..., 7] = (rng.rand(h, w) < 0.5)       # object mask
    np.save(tmp_path / "train" / "0000.npy", pack)

    ds = get_dataset("kitti15", str(tmp_path), split="train",
                     is_training=True, img_size=(h, w),
                     augment_cfg={"glare": False, "occlusion": False,
                                  "photometric": False})
    # scripted draws: rand()=0.1 < 0.3 -> obj multiply fires
    ds.rng = _FakeRng(binomials=[], rands=[0.1])
    s = ds[0]
    zeroed = pack[..., 7] == 0
    assert (s["gt"][zeroed] == 0).all()
    assert (s["gt"][~zeroed] > 0).any()

    # rand()=0.9 >= 0.3 -> GT untouched
    ds.rng = _FakeRng(binomials=[], rands=[0.9])
    s = ds[0]
    np.testing.assert_allclose(s["gt"], pack[..., 6], rtol=1e-6)

    # full aug schedule order: binomial draws are glare(p=.8), glare(p=.5),
    # occlusion(p=.5); then the obj-mask rand
    ds2 = get_dataset("kitti15", str(tmp_path), split="train",
                      is_training=True, img_size=(h, w))
    ds2.rng = _FakeRng(binomials=[1, 0, 1], rands=[0.9])
    s2 = ds2[0]
    assert s2["left"].shape == (h, w, 3)

    # eval split zeroes rows < 130 (here the whole 54-row image)
    ds3 = get_dataset("kitti15", str(tmp_path), split="train_eval",
                      is_training=False, img_size=(h, w))
    assert (ds3[0]["gt"] == 0).all()


def test_loader_batching_and_order(tmp_path):
    from decnet_tpu.data.datasets import get_dataset
    from decnet_tpu.data.loader import DataLoader
    _write_sceneflow_fixture(str(tmp_path), n=5)
    ds = get_dataset("sceneflow", str(tmp_path), split="train",
                     is_training=False)
    loader = DataLoader(ds, batch_size=2, num_workers=3)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["left"].shape == (2, 54, 81, 3)
    assert batches[0]["left_masks"][0].shape == (2, 6, 9)
    assert batches[-1]["left"].shape[0] == 1
    # deterministic order without shuffle
    assert batches[0]["name"] == ["0000", "0001"]


def test_augmentations(rng):
    from decnet_tpu.data import augment
    left = rng.rand(54, 81, 3).astype(np.float32) * 255
    right = rng.rand(54, 81, 3).astype(np.float32) * 255
    r = np.random.RandomState(0)
    l2, r2 = augment.add_parallax_glare(left, right, r)
    assert l2.shape == left.shape and (l2 >= left - 1e-3).all()
    r3 = augment.random_occlusion_patch(right, r)
    assert (r3 != right).any()
    # KITTI15Mask.py:150-157 geometry: patch is a centred 2sh x 2sw mean-
    # colour rectangle; everything outside one bounding box is untouched
    diff_rows = np.where((r3 != right).any(axis=(1, 2)))[0]
    assert diff_rows.size > 0 and np.all(np.diff(diff_rows) == 1)
    l4, r4 = augment.random_photometric(left, right, r)
    assert l4.shape == left.shape
    gl = (rng.rand(54, 81) * 20).astype(np.float32)
    gr = (rng.rand(54, 81) * 20).astype(np.float32)
    nl, nr, ng = augment.horizontal_flip_stereo(left, right, gl, gr)
    np.testing.assert_array_equal(nl, right[:, ::-1])
    np.testing.assert_array_equal(ng, gr[:, ::-1])


def test_pca_lighting_noise(rng):
    from decnet_tpu.data import augment
    img = rng.rand(27, 36, 3).astype(np.float32) * 200 + 20
    r = np.random.RandomState(3)
    out = augment.pca_lighting_noise(img, r)
    # per-channel constant shift (away from clipping)
    shift = out - img
    for c in range(3):
        assert np.ptp(shift[..., c]) < 1e-3
    assert (shift != 0).any()
    np.testing.assert_array_equal(augment.pca_lighting_noise(img, r, 0.0), img)


def test_anisotropic_diffusion_matches_reference_formula(rng):
    """Oracle transcription of utils/utils.py:393-441: gradients computed once
    from the input, reused every iteration."""
    from decnet_tpu.data.masks import anisotropic_diffusion
    img = (rng.rand(13, 17) * 255).astype(np.float32)
    lamda, sigma, iters = 0.1, 15.0, 4

    def gauss(x):
        return np.exp(-(x ** 2) / sigma ** 2)

    lg = (np.column_stack((img, img[:, -1])) -
          np.column_stack((img[:, 0], img)))[:, :-1]
    rg = (np.column_stack((img[:, 0], img)) -
          np.column_stack((img, img[:, -1])))[:, 1:]
    tg = (np.vstack((img, img[-1:])) - np.vstack((img[:1], img)))[:-1]
    bg = (np.vstack((img[:1], img)) - np.vstack((img, img[-1:])))[1:]
    expect = img.copy()
    for _ in range(iters):
        expect = expect + lamda * (lg * gauss(lg) + rg * gauss(rg) +
                                   tg * gauss(tg) + bg * gauss(bg))
    got = anisotropic_diffusion(img, iterations=iters, lamda=lamda,
                                sigma=sigma)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(
        anisotropic_diffusion(img, iterations=0), img)
    # Edge-awareness property of the reference formula: the Gaussian weight
    # exp(-grad²/σ²) kills the update at strong edges (grad 200, σ 15), while
    # low-contrast texture changes freely. (NB the reference's update has the
    # sign of (center - neighbour) — an edge-aware sharpen, not a blur — and
    # freezes the gradients at the input; both quirks kept for parity.)
    edge = np.zeros((20, 20), np.float32)
    edge[:, 10:] = 200.0
    noisy = edge + rng.randn(20, 20).astype(np.float32) * 3
    sm = anisotropic_diffusion(noisy, iterations=1)
    edge_cols = np.abs(sm - noisy)[:, 9:11]
    flat_cols = np.abs(sm - noisy)[:, [0, 1, 18, 19]]
    assert edge_cols.mean() < flat_cols.mean()
    assert abs(float(sm[:, 10].mean() - sm[:, 9].mean())) > 150


def test_device_synth_batch_shapes_and_geometry(rng):
    """On-device synthetic generator (data/device_synth.py): shapes match the
    loader contract, masks sit on the stage grids, and left(x) photometrically
    matches right(x - gt(x)) to within bilinear-sampling error."""
    import jax
    import jax.numpy as jnp
    from decnet_tpu.data.device_synth import make_device_batch

    b = make_device_batch(jax.random.PRNGKey(3), batch=2, h=54, w=81,
                          max_disp=27, dtype=jnp.float32)
    assert b["left"].shape == (2, 54, 81, 3)
    assert b["right"].shape == (2, 54, 81, 3)
    assert b["gt"].shape == (2, 54, 81)
    assert [m.shape[1:] for m in b["left_masks"]] == \
        [(6, 9), (18, 27), (54, 81)]
    gt = np.asarray(b["gt"])
    assert 0 < gt.min() and gt.max() <= 27.0

    l = np.asarray(b["left"])
    r = np.asarray(b["right"])
    src = np.arange(81)[None, None, :] - gt
    x0 = np.clip(np.floor(src).astype(int), 0, 79)
    fx = (src - x0)[..., None]
    g0 = np.take_along_axis(r, x0[..., None], axis=2)
    g1 = np.take_along_axis(r, (x0 + 1)[..., None], axis=2)
    warped = g0 * (1 - fx) + g1 * fx
    err = np.abs(warped - l).mean(axis=-1)
    valid = (src > 0) & (src < 80)
    # median error well below image std => geometry is consistent (the
    # floor is bilinear-interpolation blur of the per-pixel noise texture,
    # not geometric error)
    assert np.percentile(err[valid], 50) < 0.4 * l.std()
    # ...and warping with a WRONG disparity must be much worse: the match
    # is disparity-specific, not just photometric smoothness
    src_bad = src - 4.0
    xb = np.clip(np.floor(src_bad).astype(int), 0, 79)
    fb = (src_bad - xb)[..., None]
    wb = (np.take_along_axis(r, xb[..., None], axis=2) * (1 - fb)
          + np.take_along_axis(r, (xb + 1)[..., None], axis=2) * fb)
    err_bad = np.abs(wb - l).mean(axis=-1)
    assert np.percentile(err_bad[valid], 50) > \
        2.0 * np.percentile(err[valid], 50)

    # determinism: same key -> same batch; different key -> different
    b2 = make_device_batch(jax.random.PRNGKey(3), batch=2, h=54, w=81,
                           max_disp=27, dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(b2["gt"]), gt)
    b3 = make_device_batch(jax.random.PRNGKey(4), batch=2, h=54, w=81,
                           max_disp=27, dtype=jnp.float32)
    assert np.abs(np.asarray(b3["gt"]) - gt).max() > 1.0


def test_device_synth_mask_symmetry_and_candidates(rng):
    """Left/right detail masks must be comparably dense and correspond:
    SpaMat skips tar_mask==0 pixels (SM_kernel.cu:90-99), so a right mask
    much sparser than the left starves the sparse branch of candidates.
    Round-3 regression: the un-textured trailing band + the left view being
    a continuous function of x made right-mask density ~40x lower; surface-
    attached texture offsets fixed both (data/device_synth.py)."""
    import jax
    import jax.numpy as jnp
    from decnet_tpu.data.device_synth import make_device_batch

    b = make_device_batch(jax.random.PRNGKey(11), batch=2, h=162, w=243,
                          max_disp=108, dtype=jnp.float32)
    gt = np.asarray(b["gt"])
    for lm_a, rm_a in zip(b["left_masks"], b["right_masks"]):
        lmd = float(np.asarray(lm_a).mean())
        rmd = float(np.asarray(rm_a).mean())
        assert rmd > 0.4 * lmd, (lmd, rmd)
        assert lmd > 0.05, lmd
    # exact-correspondence availability: the true match of a left detail
    # pixel is itself a right detail pixel (within +-1 px) most of the time
    lm = np.asarray(b["left_masks"][-1]) > 0
    rm = np.asarray(b["right_masks"][-1]) > 0
    W = lm.shape[2]
    xs = np.arange(W)[None, None, :]
    src = np.clip(np.round(xs - gt).astype(int), 0, W - 1)
    hit = np.zeros_like(lm)
    for d in (-1, 0, 1):
        hit |= np.take_along_axis(rm, np.clip(src + d, 0, W - 1), axis=2)
    valid = np.broadcast_to((xs - gt) >= 0, lm.shape)
    assert hit[lm & valid].mean() > 0.5


def test_device_synth_stream_resume(rng):
    """device_batch_stream(start_step=N) regenerates the same batch N."""
    import jax.numpy as jnp
    from decnet_tpu.data.device_synth import device_batch_stream

    kw = dict(batch=1, h=27, w=27, max_disp=9, dtype=jnp.float32)
    s0 = device_batch_stream(7, **kw)
    batches = [next(s0) for _ in range(3)]
    s2 = device_batch_stream(7, start_step=2, **kw)
    np.testing.assert_array_equal(np.asarray(next(s2)["gt"]),
                                  np.asarray(batches[2]["gt"]))
    # val stream is disjoint from train
    sv = device_batch_stream(7, val=True, **kw)
    assert np.abs(np.asarray(next(sv)["gt"])
                  - np.asarray(batches[0]["gt"])).max() > 1.0


def test_sparse_term_scale_default_is_reference_parity(rng):
    """sparse_term_scale=1 reproduces the reference coefficient exactly;
    scale k multiplies only the sparse term (loss.py:226-239)."""
    import jax.numpy as jnp
    from decnet_tpu.config import LossConfig
    from decnet_tpu.train.loss import multi_stage_uploss

    B, H, W = 1, 27, 27
    gt = jnp.asarray(rng.rand(B, H, W).astype(np.float32) * 8 + 1)
    out = {
        "preds": [jnp.asarray(rng.rand(B, H // 9, W // 9) * 3),
                  jnp.asarray(rng.rand(B, H // 3, W // 3) * 3),
                  jnp.asarray(rng.rand(B, H, W) * 3)],
        "dense": [jnp.asarray(rng.rand(B, H // 3, W // 3) * 3),
                  jnp.asarray(rng.rand(B, H, W) * 3)],
        "sparse": [jnp.asarray(rng.rand(B, H // 3, W // 3) * 3),
                   jnp.asarray(rng.rand(B, H, W) * 3)],
        "fusion": [jnp.asarray(rng.rand(B, H // 3, W // 3) * 3),
                   jnp.asarray(rng.rand(B, H, W) * 3)],
        "masks_used": [jnp.ones((B, H // 3, W // 3)), jnp.ones((B, H, W))],
    }
    cfg1 = LossConfig(weights=(1.0, 1.0, 1.0))
    cfgk = LossConfig(weights=(1.0, 1.0, 1.0), sparse_term_scale=5.0)
    t1, logs1 = multi_stage_uploss(out, gt, cfg1, 3, 3, 9)
    tk, logsk = multi_stage_uploss(out, gt, cfgk, 3, 3, 9)
    # scaling only adds (k-1) * sum_s w_s * coeff_s * sparse_l_s
    expect = float(t1) + 4.0 * sum(
        0.2 / (10.0 + 3.75 * s) * float(logs1[f"stage{s}/sparse"])
        for s in (1, 2))
    np.testing.assert_allclose(float(tk), expect, rtol=1e-5)


def test_checkpoint_restore_partial_warm_start(tmp_path, rng):
    """Warm-start (CheckpointManager.restore_partial): params whose path and
    shape match are loaded, extra modules keep their fresh init, and the
    step/optimizer stay at zero — the use_detail fine-tune path."""
    import jax
    import jax.numpy as jnp
    from decnet_tpu.config import Config
    from decnet_tpu.cli.common import init_model_and_state
    from decnet_tpu.train.checkpoint import CheckpointManager

    cfg = Config()
    cfg.model.max_disp = 27
    cfg.model.base_channels = 4
    cfg.model.use_detail = False
    cfg.model.dtype = "float32"
    cfg.model.matching_impl = "xla"

    _, state, _ = init_model_and_state(cfg, None)
    # perturb so restored values are distinguishable from a fresh init
    state = state.replace(
        params=jax.tree_util.tree_map(lambda x: x + 1.0, state.params),
        step=777)
    src = CheckpointManager(str(tmp_path / "src"), keep=1)
    src.save(777, state)

    cfg2 = Config()
    cfg2.model.max_disp = 27
    cfg2.model.base_channels = 4
    cfg2.model.use_detail = True    # adds detail-head params
    cfg2.model.dtype = "float32"
    cfg2.model.matching_impl = "xla"
    _, fresh, _ = init_model_and_state(cfg2, None)
    merged = src.restore_partial(fresh)

    assert int(merged.step) == 0    # optimizer/step untouched
    flat_saved = {tuple(str(p) for p in path): v for path, v in
                  jax.tree_util.tree_flatten_with_path(state.params)[0]}
    flat_merged = dict(
        jax.tree_util.tree_flatten_with_path(merged.params)[0])
    hits = extra = 0
    for path, v in flat_merged.items():
        key = tuple(str(p) for p in path)
        if key in flat_saved and np.shape(flat_saved[key]) == np.shape(v):
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(flat_saved[key]))
            hits += 1
        else:
            extra += 1
    assert hits > 10            # the shared trunk restored
    assert extra > 0            # the detail heads exist and stayed fresh


def test_freeze_bn_train_step_keeps_stats_and_learns(rng):
    """freeze_bn=True: the train step normalises with (and never mutates)
    the running BN statistics, while params still receive gradients."""
    import jax
    import jax.numpy as jnp
    from decnet_tpu.config import Config
    from decnet_tpu.cli.common import init_model_and_state
    from decnet_tpu.train.step import make_train_step

    cfg = Config()
    cfg.model.max_disp = 27
    cfg.model.base_channels = 4
    cfg.model.use_detail = False
    cfg.model.dtype = "float32"
    cfg.model.matching_impl = "xla"
    cfg.train.freeze_bn = True
    cfg.train.lr_schedule = "constant"   # cosine warmup gives lr=0 at step 0
    _, state, _ = init_model_and_state(cfg, None)

    B, H, W = 2, 54, 54
    r = np.random.RandomState(0)
    batch = {
        "left": jnp.asarray(r.rand(B, H, W, 3), jnp.float32),
        "right": jnp.asarray(r.rand(B, H, W, 3), jnp.float32),
        "gt": jnp.asarray(r.rand(B, H, W) * 20, jnp.float32),
        "left_masks": [jnp.ones((B, H // s, W // s)) for s in (9, 3, 1)],
        "right_masks": [jnp.ones((B, H // s, W // s)) for s in (9, 3, 1)],
    }
    from decnet_tpu.models import get_model
    step = make_train_step(get_model("decnet", cfg.model), cfg, donate=False)
    state2, logs = step(state, batch)
    assert np.isfinite(float(logs["total"]))
    # batch_stats bit-identical (frozen)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(state.batch_stats)[0],
            jax.tree_util.tree_flatten_with_path(state2.batch_stats)[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # params moved
    moved = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for (_, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(state2.params)[0]))
    assert moved


def test_host_and_device_synthetic_distributions_match(rng):
    """The numpy synthetic generator and the on-device one draw from the
    same scene distribution (models trained on one must transfer to the
    other): image/disparity moments and detail-mask densities agree."""
    import jax
    import jax.numpy as jnp
    from decnet_tpu.data.synthetic import make_pair
    from decnet_tpu.data.device_synth import make_device_batch
    from decnet_tpu.ops.detail import detail_masks

    h, w, D = 54, 81, 27
    host = [make_pair(np.random.RandomState(i), h, w, D) for i in range(8)]
    dev = make_device_batch(jax.random.PRNGKey(0), batch=8, h=h, w=w,
                            max_disp=D, dtype=jnp.float32)

    h_img = np.stack([p["left"] for p in host])
    d_img = np.asarray(dev["left"])
    # device images are ImageNet-normalised; undo for comparison
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    d_img = (d_img * std + mean) * 255.0
    assert abs(h_img.mean() - d_img.mean()) < 12.0
    assert abs(h_img.std() - d_img.std()) < 12.0

    h_gt = np.stack([p["gt"] for p in host])
    d_gt = np.asarray(dev["gt"])
    assert abs(h_gt.mean() - d_gt.mean()) < 3.0
    assert abs(h_gt.std() - d_gt.std()) < 3.0

    # full-res detail-mask density (drives the sparse branch) agrees
    h_m = np.asarray(detail_masks(jnp.asarray(h_img / 255.0), 3, 3, 0.3)[-1])
    d_m = np.asarray(dev["left_masks"][-1])
    assert abs(h_m.mean() - d_m.mean()) < 0.05


def test_device_synth_stressor_variant(rng):
    """Adversarial stressor stream (device_synth._stressor_scene): geometry
    is exact, thin bars carry large disparity offsets that mean-pooling to
    1/27 destroys (the lost-detail set is non-trivial), bars are detail-
    masked in BOTH views with candidates available, and the background is
    repetitive (strong periodic autocorrelation along x)."""
    import jax
    import jax.numpy as jnp
    from decnet_tpu.data.device_synth import make_device_batch

    b = make_device_batch(jax.random.PRNGKey(5), batch=2, h=162, w=243,
                          max_disp=108, dtype=jnp.float32,
                          variant="stressor")
    gt = np.asarray(b["gt"])
    assert np.isfinite(gt).all() and 0 < gt.min() and gt.max() <= 108.0

    # geometry: left(x) matches right(x - gt) (same check as the default
    # stream), and a wrong disparity is much worse
    l, r = np.asarray(b["left"]), np.asarray(b["right"])
    W = 243
    src = np.arange(W)[None, None, :] - gt
    x0 = np.clip(np.floor(src).astype(int), 0, W - 2)
    fx = (src - x0)[..., None]
    warped = (np.take_along_axis(r, x0[..., None], axis=2) * (1 - fx)
              + np.take_along_axis(r, (x0 + 1)[..., None], axis=2) * fx)
    err = np.abs(warped - l).mean(axis=-1)
    valid = (src > 0) & (src < W - 1)
    assert np.percentile(err[valid], 50) < 0.4 * l.std()

    # the lost-detail set: mean-pool 27 + bicubic-up cannot represent the
    # bars -> a few percent of pixels are wrong by > 9 px in the coarse view
    from decnet_tpu.ops.resize import interpolate
    H = 162
    coarse = gt.reshape(2, H // 27, 27, W // 27, 27).mean(axis=(2, 4))
    up = np.asarray(interpolate(jnp.asarray(coarse), H, W, "bicubic"))
    ld = np.abs(gt - up) > 9.0
    assert 0.005 < ld.mean() < 0.2, ld.mean()

    # bars are masked details in both views and have candidates: at
    # lost-detail masked pixels the true match (+-1) is a right mask pixel
    lm = np.asarray(b["left_masks"][-1]) > 0
    rm = np.asarray(b["right_masks"][-1]) > 0
    # low density is the point: the masks select (mostly) the thin bars,
    # the locally-smooth periodic background stays below threshold
    assert 0.008 < lm.mean() < 0.6 and 0.008 < rm.mean() < 0.6
    xs = np.arange(W)[None, None, :]
    srci = np.clip(np.round(xs - gt).astype(int), 0, W - 1)
    hit = np.zeros_like(lm)
    for d in (-1, 0, 1):
        hit |= np.take_along_axis(rm, np.clip(srci + d, 0, W - 1), axis=2)
    sel = lm & ld & ((xs - gt) >= 0)
    assert sel.any()
    assert hit[sel].mean() > 0.5, hit[sel].mean()

    # background repetitiveness: autocorrelation of background rows at the
    # sinusoid period ~24 px is high (shift by 24 ~ shift by 0)
    bg_rows = l[0, :, :, 0] * (np.asarray(up[0]) < 40)[:, :]  # mostly bg rows
    row = l[0, np.argmin(ld[0].sum(axis=1))]        # row with fewest bars
    g = row[:, 0] - row[:, 0].mean()
    ac = np.correlate(g, g, "full")[len(g) - 1:]
    assert ac[24] > 0.5 * ac[0], ac[24] / ac[0]


def test_right_view_disparity_zbuffer(rng):
    """_right_view_disparity: thin foreground surfaces appear in the right
    view at x - d (the r3/r4 fixed-point renderer missed them entirely),
    occlusion resolves to the nearest surface, and smooth background keeps
    the sub-pixel fixed-point solution."""
    import jax.numpy as jnp
    from decnet_tpu.data.device_synth import _right_view_disparity

    W = 64
    disp = np.full((1, 2, W), 5.0, np.float32)
    disp[0, :, 40:43] = 25.0            # 3-px bar at x=40..42, d=25
    xs = np.broadcast_to(np.arange(W, dtype=np.float32)[None, None, :],
                         disp.shape)
    d_r = np.asarray(_right_view_disparity(jnp.asarray(disp),
                                           jnp.asarray(xs), W))
    # bar projects to u = 40-25 .. 42-25 = 15..17 and WINS over background
    assert (d_r[0, :, 15:18] == 25.0).all(), d_r[0, 0, 13:20]
    # background elsewhere keeps its value (incl. the disocclusion band
    # right of the bar's projection, where background is what's visible)
    assert np.allclose(d_r[0, :, :15], 5.0)
    assert np.allclose(d_r[0, :, 18:35], 5.0)
    assert np.allclose(d_r[0, :, 45:], 5.0)


def test_committed_snapshot_restores():
    """The durable params+batch_stats snapshots committed under runs/ckpt_*
    restore through the normal CLI path (VERDICT r4 missing #4: reports
    must be regenerable from the repo alone).  Uses the flagship export's
    own config sidecar; only tree structure/shapes are checked (full
    numeric evals are the chip-side report scripts)."""
    import argparse
    import jax
    from decnet_tpu.cli.common import add_config_args, build_config, \
        apply_checkpoint_sidecar, init_model_and_state

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "runs", "ckpt_flagship")
    if not os.path.exists(os.path.join(root, "params.npz")):
        pytest.skip("no committed snapshot in this checkout")
    p = argparse.ArgumentParser()
    add_config_args(p)
    args = p.parse_args(["--resume", root])
    cfg = apply_checkpoint_sidecar(build_config(args), args)
    model, state, _ = init_model_and_state(cfg, root, for_training=False)
    n = sum(int(np.prod(np.shape(x)))
            for x in jax.tree_util.tree_leaves(state.params))
    assert n > 1e6                      # a real model, fully populated
    assert int(state.step) > 0          # meta.json step restored
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves[:5])
