"""Why do stage*/sparse loss terms sit at ~55-65 in the round-3 runs?

Probes the sparse-matching branch on the r3 data regime (on-device synth,
denser detail masks, max_disp 216): per-stage sparse EPE at mask pixels,
the fraction of mask pixels whose SpaMat output is ~0 (no matched
candidate / softmax collapse), candidate availability (does the right mask
contain ANY pixel in the legal disparity band of a left mask pixel), and
the same matching run on *ground-truth-aligned* masks for comparison.

Usage: python scripts/diag_sparse_r3.py [ckpt_dir] (default /tmp/r3_s2d)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
from decnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np
import jax.numpy as jnp
from decnet_tpu.config import Config
from decnet_tpu.cli.common import init_model_and_state
from decnet_tpu.data.device_synth import make_device_batch

ckpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_s2d"

cfg = Config()
cfg.model.max_disp = 216
cfg.model.use_detail = False
cfg.model.s2d_fine = True
cfg.model.dtype = "float32"
cfg.model.matching_impl = "xla"
cfg.train.crop_h, cfg.train.crop_w = 162, 486
cfg.train.batch_size = 2

model, state, mgr = init_model_and_state(cfg, ckpt, for_training=False)
print("restored step", int(state.step), flush=True)

key = jax.random.PRNGKey(123)
batch = make_device_batch(key, batch=2, h=162, w=486, max_disp=216,
                          scale=3, levels=3, dtype=jnp.float32)
variables = {"params": state.params, "batch_stats": state.batch_stats}
out = model.apply(variables, batch["left"], batch["right"],
                  batch["left_masks"], batch["right_masks"], train=False)

gt = np.asarray(batch["gt"])
print("gt: mean %.2f  p50 %.1f  p90 %.1f  max %.1f"
      % (gt.mean(), np.percentile(gt, 50), np.percentile(gt, 90), gt.max()))

for i, sp in enumerate(out["sparse"]):
    stage = i + 1
    sp = np.asarray(sp, np.float32)
    dn = np.asarray(out["dense"][i], np.float32)
    scale = gt.shape[1] // sp.shape[1]
    g = gt[:, ::scale, ::scale] / scale if scale > 1 else gt
    lm = np.asarray(batch["left_masks"][i]) > 0
    rm = np.asarray(batch["right_masks"][i]) > 0
    md = int(cfg.model.max_disp) // (3 ** (3 - stage))
    err_s = np.abs(sp - g)[lm]
    err_d = np.abs(dn - g)[lm]
    near0 = (np.abs(sp) < 0.5)[lm]
    # candidate availability: for each left mask pixel (x), any right mask
    # pixel at x-d for d in [0, min(md, x+1))?
    B, H, W = lm.shape
    have = np.zeros((B, H, W), bool)
    cum = np.cumsum(rm, axis=2)  # inclusive prefix count along W
    xs = np.arange(W)
    lo = np.maximum(xs - (np.minimum(md - 1, xs)), 0)   # leftmost candidate
    cnt = cum[:, :, xs] - np.where(lo > 0, cum[:, :, lo - 1], 0)
    have = cnt > 0
    pct_have = have[lm].mean() if lm.any() else 0.0
    # error at mask pixels that DO have candidates
    sel = lm & have
    err_s_have = np.abs(sp - g)[sel] if sel.any() else np.array([0.0])
    print(f"stage{stage}: density={lm.mean():.3f} md={md} "
          f"sparse_epe={err_s.mean():.2f} dense_epe={err_d.mean():.2f} "
          f"sparse~0={near0.mean():.3f} have_cand={pct_have:.3f} "
          f"sparse_epe|cand={err_s_have.mean():.2f}")
    # GT-at-mask distribution: are mask pixels on extreme disparities?
    print(f"         gt@mask: mean {g[lm].mean():.1f} p90 "
          f"{np.percentile(g[lm], 90):.1f}; sparse@mask mean {sp[lm].mean():.1f}"
          f"  var@mask mean {np.asarray(out['var'][i], np.float32)[lm].mean():.1f}")
