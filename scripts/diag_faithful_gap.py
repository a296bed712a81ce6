"""Diagnose the train/eval EPE gap of the faithful synthetic run
(/tmp/run_faithful: train stage3/pred smooth-L1 ~0.6 but eval EPE ~11).

Isolates three hypotheses on the step-7500 checkpoint:
  (a) BN running stats: same eval batch, train=False (running stats) vs
      train=True (batch stats);
  (b) train/val distribution shift: EPE on a TRAIN batch with train=False;
  (c) stage decomposition: per-stage EPE + dense/sparse/fusion breakdown.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
from decnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax.numpy as jnp
from decnet_tpu.config import Config
from decnet_tpu.train.metrics import epe_and_d1
from decnet_tpu.data import get_dataset
from decnet_tpu.data.loader import DataLoader
from decnet_tpu.cli.common import init_model_and_state

cfg = Config()
cfg.model.max_disp = 108
cfg.model.use_detail = False
cfg.model.dtype = "bfloat16"
cfg.model.matching_impl = "xla"
cfg.train.crop_h, cfg.train.crop_w = 162, 243
cfg.train.batch_size = 4

model, state, mgr = init_model_and_state(cfg, "/tmp/run_faithful")
print("restored step", int(state.step), flush=True)

def get_batch(split, is_training):
    ds = get_dataset("synthetic", "", split=split, is_training=is_training,
                     mask_source="compute", img_size=(162, 243), scale=3,
                     levels=3, length=512 if split == "train" else 64)
    loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=True)
    batch = next(iter(loader))
    for k in ("name", "ori_h", "ori_w", "n_disp"):
        batch.pop(k, None)
    return batch

variables = {"params": state.params, "batch_stats": state.batch_stats}

@jax.jit
def fwd_eval(batch):
    return model.apply(variables, batch["left"], batch["right"],
                       batch.get("left_masks"), batch.get("right_masks"),
                       train=False)

@jax.jit
def fwd_train(batch):
    out, _ = model.apply(variables, batch["left"], batch["right"],
                         batch.get("left_masks"), batch.get("right_masks"),
                         train=True, mutable=["batch_stats"])
    return out

def report(tag, out, gt):
    for i, p in enumerate(out["preds"]):
        scale = gt.shape[1] // p.shape[1]
        g = gt[:, ::scale, ::scale] / scale if scale > 1 else gt
        epe, d1 = epe_and_d1(p, g, cfg.model.max_disp // max(scale, 1))
        print(f"{tag}: stage{i} EPE {float(epe):8.3f}  D1 {float(d1):6.2f}")
    for k in ("dense", "fusion", "sparse"):
        if out.get(k):
            p = out[k][-1]
            epe, _ = epe_and_d1(p, gt, cfg.model.max_disp)
            print(f"{tag}: final {k:7s} EPE {float(epe):8.3f}")
    if out.get("masks_used"):
        m = out["masks_used"][-1]
        print(f"{tag}: final mask density {float(m.mean()):.4f}")
    print(flush=True)

val_batch = get_batch("val", False)
train_batch = get_batch("train", True)

report("VAL  train=False", fwd_eval(val_batch), val_batch["gt"])
report("VAL  train=True ", fwd_train(val_batch), val_batch["gt"])
report("TRAIN train=False", fwd_eval(train_batch), train_batch["gt"])
report("TRAIN train=True ", fwd_train(train_batch), train_batch["gt"])

# GT sanity: disparity stats of each split
for tag, b in (("val", val_batch), ("train", train_batch)):
    gt = np.asarray(b["gt"])
    valid = gt[(gt > 0) & (gt < 108)]
    print(f"{tag} gt: mean {valid.mean():.2f} max {valid.max():.1f} "
          f"valid {100 * ((gt > 0) & (gt < 108)).mean():.1f}% "
          f"mask density {float(np.mean(np.asarray(b['left_masks'][-1]))):.3f}")
