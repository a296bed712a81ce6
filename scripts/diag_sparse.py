"""Probe the sparse-matching branch on the trained faithful checkpoint:
per-stage SpaMat output stats vs downsampled GT at mask pixels, plus the
variance map. Answers why stage*/sparse losses sit at ~30 forever."""
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

ds = get_dataset("synthetic", "", split="train", is_training=True,
                 mask_source="compute", img_size=(162, 243), scale=3,
                 levels=3, length=512)
loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=True)
batch = next(iter(loader))
for k in ("name", "ori_h", "ori_w", "n_disp"):
    batch.pop(k, None)

variables = {"params": state.params, "batch_stats": state.batch_stats}
out, _ = model.apply(variables, batch["left"], batch["right"],
                     batch.get("left_masks"), batch.get("right_masks"),
                     train=True, mutable=["batch_stats"])

gt = np.asarray(batch["gt"])
print("gt full-res: mean %.2f" % gt[gt > 0].mean())
for i, sp in enumerate(out["sparse"]):
    sp = np.asarray(sp, np.float32)
    stage = i + 1
    scale = gt.shape[1] // sp.shape[1]
    g = gt[:, ::scale, ::scale] / scale if scale > 1 else gt
    m = np.asarray(batch["left_masks"][i], np.float32)
    mm = m > 0
    err = np.abs(sp - g)[mm]
    print(f"stage{stage}: sparse shape {sp.shape} scale {scale} "
          f"pred[mask] mean {sp[mm].mean():.2f} std {sp[mm].std():.2f} "
          f"gt[mask] mean {g[mm].mean():.2f}  EPE@mask {err.mean():.2f} "
          f"corr {np.corrcoef(sp[mm], g[mm])[0, 1]:.3f}")
for i, v in enumerate(out.get("var", [])):
    v = np.asarray(v, np.float32)
    print(f"stage{i+1}: var mean {v.mean():.2f} p50 {np.percentile(v, 50):.2f}")
for i, d in enumerate(out["dense"]):
    d = np.asarray(d, np.float32)
    scale = gt.shape[1] // d.shape[1]
    g = gt[:, ::scale, ::scale] / scale if scale > 1 else gt
    print(f"stage{i+1}: dense mean {d.mean():.2f} gt {g.mean():.2f} "
          f"EPE {np.abs(d - g).mean():.2f}")
