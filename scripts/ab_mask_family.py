"""A/B the two detail-mask families on a trained checkpoint: the reference's
Gaussian-residual pyramid (utils/utils.py:483-534) vs the paper's wavelet
detection (utils/Wavelet.py:66-123, shipped broken upstream; reachable here
via data.mask_source="wavelet").

For each val batch: rebuild the [0,1] images from the normalised stream,
compute (a) Gaussian masks at thold, (b) wavelet masks at target 0.85, and
(c) a density-matched Gaussian (per-image residual quantile set to the
wavelet density) so the comparison is at equal mask budget.  Forward the
model under each mask set and report final EPE/D1 + density + the
mask-pixel dense/sparse/fusion breakdown.

  python scripts/ab_mask_family.py --ckpt /tmp/r4_s2d_v3 --s2d \
      [--h 540 --w 972 --max_disp 216 --batches 8] [--json out.json]
"""
import sys, os, argparse, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    for _v in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
        os.environ.pop(_v, None)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from decnet_tpu.config import Config
from decnet_tpu.train.metrics import epe_and_d1
from decnet_tpu.data.device_synth import device_batch_stream
from decnet_tpu.data.io import IMAGENET_MEAN, IMAGENET_STD
from decnet_tpu.data import masks as dmasks
from decnet_tpu.cli.common import init_model_and_state

p = argparse.ArgumentParser()
p.add_argument("--ckpt", required=True)
p.add_argument("--batches", type=int, default=8)
p.add_argument("--h", type=int, default=540)
p.add_argument("--w", type=int, default=972)
p.add_argument("--max_disp", type=int, default=216)
p.add_argument("--batch", type=int, default=4)
p.add_argument("--s2d", action="store_true")
p.add_argument("--thold", type=float, default=0.3)
p.add_argument("--json", type=str, default=None)
p.add_argument("--seed", type=int, default=53)
p.add_argument("--wavelet_target", type=float, default=0.85,
               help="adaptive-threshold coverage target for the "
                    "wavelet_pair arm (reference Wavelet.py:96-106 uses "
                    "0.85; lower = denser masks = more candidates)")
p.add_argument("--tar_dilate", type=int, default=1,
               help="wavelet_pair target-view dilation in wavelet cells")
args = p.parse_args()

sidecar = os.path.join(args.ckpt, "config.json")
if os.path.exists(sidecar):
    cfg = Config.load(sidecar)
    print(f"model config from {sidecar}")
else:
    cfg = Config()
    cfg.model.s2d_fine = args.s2d
assert not cfg.model.use_detail, \
    "mask-family A/B needs a use_detail=0 checkpoint (fed masks must be used)"
cfg.model.max_disp = args.max_disp
# bf16 on TPU; f32 on CPU (emulated bf16 is several times slower there and
# the A/B is a relative comparison)
cfg.model.dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
model, state, _ = init_model_and_state(cfg, args.ckpt)
variables = {"params": state.params, "batch_stats": state.batch_stats}
print(f"checkpoint step {int(state.step)}")

import functools


@jax.jit
def fwd(batch, lmasks, rmasks):
    return model.apply(variables, batch["left"], batch["right"],
                       lmasks, rmasks, train=False)

stream = device_batch_stream(args.seed, val=True, batch=args.batch,
                             h=args.h, w=args.w, max_disp=args.max_disp,
                             dtype=jnp.bfloat16)

MEAN = np.asarray(IMAGENET_MEAN, np.float32).reshape(1, 1, 1, 3)
STD = np.asarray(IMAGENET_STD, np.float32).reshape(1, 1, 1, 3)


def denorm(x):
    return np.clip(np.asarray(x, np.float32) * STD + MEAN, 0.0, 1.0)


def gaussian_quantile_masks(img01, densities):
    """Per-image Gaussian-residual masks with thresholds set to match the
    given per-level densities (density-matched A/B arm)."""
    import cv2
    data = img01.astype(np.float32)
    residuals = []
    for _ in range(3):
        down = dmasks._gaussian_down(data, 3)
        up = dmasks._gaussian_up(down, 3)
        if up.shape != data.shape:
            up = cv2.resize(up, (data.shape[1], data.shape[0]))
        residuals.append(np.abs(data - up).sum(axis=2))
        data = down
    out = []
    for r, d in zip(residuals, densities[::-1]):   # residuals fine->coarse
        th = np.quantile(r, 1.0 - d) if 0 < d < 1 else r.max() + 1
        out.append((r >= th).astype(np.float32))
    return out[::-1]


def batch_masks(imgs01, maker):
    per = [maker(imgs01[i]) for i in range(imgs01.shape[0])]
    return [jnp.asarray(np.stack([p[l] for p in per])) for l in range(3)]


arms = {}
def add(arm, key, val):
    arms.setdefault(arm, {}).setdefault(key, []).append(float(val))

for bi in range(args.batches):
    batch = next(stream)
    gt = batch["gt"]
    left01, right01 = denorm(batch["left"]), denorm(batch["right"])

    wav_l = batch_masks(left01, lambda im: dmasks.wavelet_detail_masks_np(im))
    wav_r = batch_masks(right01, lambda im: dmasks.wavelet_detail_masks_np(im))
    # pair-consistent variant: normalisation + threshold shared across the
    # stereo pair (VERDICT r4 weak #4 fix) — the pipeline default for
    # mask_source="wavelet" since round 5
    wp = [dmasks.wavelet_pair_masks_np(left01[i], right01[i],
                                       target=args.wavelet_target,
                                       tar_dilate_cells=args.tar_dilate)
          for i in range(left01.shape[0])]
    wavp_l = [jnp.asarray(np.stack([p[0][l] for p in wp])) for l in range(3)]
    wavp_r = [jnp.asarray(np.stack([p[1][l] for p in wp])) for l in range(3)]
    gau_l = batch_masks(left01, lambda im: dmasks.detail_masks_np(
        im, 3, 3, args.thold))
    gau_r = batch_masks(right01, lambda im: dmasks.detail_masks_np(
        im, 3, 3, args.thold))
    wdens = [float(np.asarray(m).mean()) for m in wav_l]
    gq_l = batch_masks(left01, lambda im: gaussian_quantile_masks(im, wdens))
    gq_r = batch_masks(right01, lambda im: gaussian_quantile_masks(im, wdens))

    for arm, (lm, rm) in {
            "gaussian": (gau_l, gau_r), "wavelet": (wav_l, wav_r),
            "wavelet_pair": (wavp_l, wavp_r),
            "gaussian_density_matched": (gq_l, gq_r)}.items():
        out = fwd(batch, lm, rm)
        epe, d1 = epe_and_d1(out["preds"][-1], gt, args.max_disp)
        add(arm, "final_epe", epe)
        add(arm, "final_d1", d1)
        add(arm, "density", float(np.asarray(lm[-1]).mean()))
        m = lm[-1] > 0
        valid = (gt > 0) & (gt < args.max_disp) & m
        v = valid.astype(jnp.float32)
        for k in ("dense", "sparse", "fusion"):
            err = jnp.abs(out[k][-1].astype(jnp.float32) - gt)
            add(arm, f"mask_{k}_epe",
                (err * v).sum() / jnp.maximum(v.sum(), 1.0))
        if out.get("cand"):
            cand = out["cand"][-1] > 0
            vc = (valid & cand).astype(jnp.float32)
            err = jnp.abs(out["sparse"][-1].astype(jnp.float32) - gt)
            add(arm, "mask_sparse_cand_epe",
                (err * vc).sum() / jnp.maximum(vc.sum(), 1.0))
            add(arm, "cand_avail",
                (cand.astype(jnp.float32) * v).sum()
                / jnp.maximum(v.sum(), 1.0))
    print(f"batch {bi + 1}/{args.batches} done")

report = {"step": int(state.step), "batches": args.batches,
          "shape": [args.h, args.w, args.max_disp]}
for arm, metrics in arms.items():
    report[arm] = {k: round(float(np.mean(v)), 4) for k, v in metrics.items()}
print(json.dumps(report, indent=2))
if args.json:
    with open(args.json, "w") as f:
        json.dump(report, f, indent=2)
