"""A/B the execution modes of the flagship model on the real chip.

Measures stereo pairs/s (chained inputs + scalar readback, CLAUDE.md timing
rules) for:
  s2d1          s2d_stages=1 graph (the trained flagship's native form)
  s2d2          the same weights upgraded via the exact stage-2 repack
  faithful1     faithful weights, full-res repack (stages=1)
  faithful2     faithful weights, full repack incl. stage-2 heads
  faithful_nhwc faithful weights executed in reference NHWC form

All five produce identical outputs per tests/test_repack.py; the deltas are
pure layout cost.  Run AFTER training frees the chip.
"""
import sys, os, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np
ensure_tpu()
from decnet_tpu.config import ModelConfig
from decnet_tpu.models import get_model
from decnet_tpu.models.repack import s2d_exec
from decnet_tpu.data.synthetic import make_pair
from decnet_tpu.data.masks import stereo_pair_masks

H, W, B = 540, 972, 4
rng = np.random.RandomState(0)
lefts, rights, lmasks, rmasks = [], [], [], []
for _ in range(B):
    pair = make_pair(rng, H, W, max_disp=192)
    lf = pair["left"].astype(np.float32) / 255.0
    rt = pair["right"].astype(np.float32) / 255.0
    lm, rm = stereo_pair_masks(lf, rt, scale=3, levels=3, thold=0.3)
    lefts.append(lf); rights.append(rt); lmasks.append(lm); rmasks.append(rm)
left = jnp.asarray(np.stack(lefts))
right = jnp.asarray(np.stack(rights))
lms = [jnp.asarray(np.stack([m[i] for m in lmasks])) for i in range(3)]
rms = [jnp.asarray(np.stack([m[i] for m in rmasks])) for i in range(3)]
print("mask densities", [round(float(m.mean()), 3) for m in lms], flush=True)


def measure(model, variables):
    @jax.jit
    def forward(carry):
        pred = model.apply(variables, left + carry * 1e-12, right, lms, rms,
                           train=False)["preds"][-1]
        return pred.mean()
    carry = forward(jnp.float32(0)); jax.block_until_ready(carry)
    carry = forward(carry); jax.block_until_ready(carry)
    iters, best = 15, None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = forward(carry)
        final = float(carry)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    assert np.isfinite(final)
    return B * iters / best


def build(mode):
    base = dict(max_disp=216, base_channels=8, num_stage=4, down_scale=3,
                cost_func="cor", use_detail=False, dtype="bfloat16",
                matching_impl="auto")
    ih, iw = 54, 54
    init_masks = [jnp.zeros((1, ih // s, iw // s)) for s in (9, 3, 1)]
    if mode.startswith("s2d"):
        cfg1 = ModelConfig(**base, s2d_fine=True, s2d_stages=1)
        m = get_model("decnet", cfg1)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, ih, iw, 3)),
                   jnp.zeros((1, ih, iw, 3)), init_masks, init_masks)
        if mode == "s2d2":
            m, v = s2d_exec(v, cfg1, stages=2)
        return m, v
    cfg_f = ModelConfig(**base, s2d_fine=False)
    mf = get_model("decnet", cfg_f)
    v = mf.init(jax.random.PRNGKey(0), jnp.zeros((1, ih, iw, 3)),
                jnp.zeros((1, ih, iw, 3)), init_masks, init_masks)
    if mode == "faithful_nhwc":
        return mf, v
    return s2d_exec(v, cfg_f, stages=2 if mode == "faithful2" else 1)


out = {}
for mode in sys.argv[1:] or ("s2d1", "s2d2", "faithful1", "faithful2",
                             "faithful_nhwc"):
    m, v = build(mode)
    out[mode] = round(measure(m, v), 2)
    print(mode, out[mode], "pairs/s", flush=True)
print(json.dumps(out))
