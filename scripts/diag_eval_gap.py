"""Diagnose the train/eval EPE gap of the synthetic run: same batch, same
weights, EPE with train=False (running BN stats) vs train=True (batch stats),
plus per-stage prediction EPE."""
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
from decnet_tpu.models import get_model
from decnet_tpu.train.state import create_train_state
from decnet_tpu.train.checkpoint import CheckpointManager
from decnet_tpu.train.metrics import epe_and_d1
from decnet_tpu.data import get_dataset
from decnet_tpu.data.loader import DataLoader

cfg = Config()
cfg.model.max_disp = 108
cfg.model.base_channels = 8
cfg.model.use_detail = True
cfg.model.thold = 0.9
cfg.model.dtype = "bfloat16"
cfg.model.matching_impl = "auto"
cfg.train.crop_h, cfg.train.crop_w = 162, 243
cfg.train.batch_size = 4

from decnet_tpu.cli.common import init_model_and_state
model, state, mgr = init_model_and_state(cfg, "/tmp/ckpt_long")
print("restored step", int(state.step))

ds = get_dataset("synthetic", "", split="val", is_training=False,
                 mask_source="compute", img_size=(162, 243), scale=3, levels=3)
loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=True)
batch = next(iter(loader))
for k in ("name", "ori_h", "ori_w", "n_disp"):
    batch.pop(k, None)

variables = {"params": state.params, "batch_stats": state.batch_stats}
out_eval = model.apply(variables, batch["left"], batch["right"],
                       batch.get("left_masks"), batch.get("right_masks"),
                       train=False)
out_train, _ = model.apply(variables, batch["left"], batch["right"],
                           batch.get("left_masks"), batch.get("right_masks"),
                           train=True, mutable=["batch_stats"])
gt = batch["gt"]
for name, out in (("eval (running stats)", out_eval),
                  ("train (batch stats)", out_train)):
    for i, p in enumerate(out["preds"]):
        scale = gt.shape[1] // p.shape[1]
        g = gt[:, ::scale, ::scale] / scale if scale > 1 else gt
        epe, d1 = epe_and_d1(p, g, cfg.model.max_disp // scale)
        print(f"{name}: stage{i} EPE {float(epe):8.3f}  D1 {float(d1):6.2f}")
    # fusion/dense/sparse breakdown at the finest stage
    for k in ("dense", "fusion", "sparse"):
        p = out[k][-1]
        epe, _ = epe_and_d1(p, gt, cfg.model.max_disp)
        print(f"{name}: final {k:7s} EPE {float(epe):8.3f}")
    m = out["masks_used"][-1]
    print(f"{name}: final mask density {float(m.mean()):.4f}")
