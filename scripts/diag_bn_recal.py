"""Is the faithful-run eval gap a stale-running-stats problem?

Recalibrate batch_stats by running N train=True forwards on frozen params
(fresh train batches), then re-eval train=False on the same train batch.
If recalibrated running stats close the gap -> stats were lagging/stale;
if not -> the network genuinely depends on per-batch statistics.
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

ds = get_dataset("synthetic", "", split="train", is_training=True,
                 mask_source="compute", img_size=(162, 243), scale=3,
                 levels=3, length=512)
loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=True,
                    shuffle=True, seed=123)

@jax.jit
def recal_step(stats, batch):
    _, mut = model.apply({"params": state.params, "batch_stats": stats},
                         batch["left"], batch["right"],
                         batch.get("left_masks"), batch.get("right_masks"),
                         train=True, mutable=["batch_stats"])
    return mut["batch_stats"]

@jax.jit
def fwd_eval(stats, batch):
    return model.apply({"params": state.params, "batch_stats": stats},
                       batch["left"], batch["right"],
                       batch.get("left_masks"), batch.get("right_masks"),
                       train=False)

def clean(b):
    for k in ("name", "ori_h", "ori_w", "n_disp"):
        b.pop(k, None)
    return b

it = iter(loader)
probe = clean(next(it))

def report(tag, stats):
    out = fwd_eval(stats, probe)
    gt = probe["gt"]
    line = []
    for i, p in enumerate(out["preds"]):
        scale = gt.shape[1] // p.shape[1]
        g = gt[:, ::scale, ::scale] / scale if scale > 1 else gt
        epe, _ = epe_and_d1(p, g, cfg.model.max_disp // max(scale, 1))
        line.append(f"s{i} {float(epe):.3f}")
    print(f"{tag}: " + "  ".join(line), flush=True)

report("orig stats      ", state.batch_stats)
stats = state.batch_stats
n = 0
for batch in it:
    stats = recal_step(stats, clean(batch))
    n += 1
    if n in (10, 30, 60):
        report(f"recal {n:3d} steps", stats)
    if n >= 60:
        break
