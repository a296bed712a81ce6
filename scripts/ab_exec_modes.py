"""On-chip A/B of the round-5 execution strategies on the bench flagship:

  base        s2d_stages=2 serving form (BENCH_r04 configuration)
  split       + split_concat (head concats as PConv split-kernel tuples)
  shift2d     + conv3d_impl=shift2d (stage-0 3D convs as S-shifted 2D convs)
  both        + both

All four run the SAME parameters (execution strategy only; equality pinned
by tests/test_model.py::test_execution_modes_are_equivalent).  Prints
pairs/s per arm; run after training frees the chip:

  timeout 3600 python scripts/ab_exec_modes.py | tee runs/ab_exec_modes_r5.txt
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np

ensure_tpu()
assert jax.default_backend() == "tpu", "A/B is a chip measurement"

from decnet_tpu.config import ModelConfig
from decnet_tpu.models import get_model
from decnet_tpu.data.synthetic import make_pair
from decnet_tpu.data.masks import stereo_pair_masks

H, W, batch = 540, 972, 4
rng = np.random.RandomState(0)
lefts, rights, lmasks, rmasks = [], [], [], []
for _ in range(batch):
    pair = make_pair(rng, H, W, max_disp=192)
    lf = pair["left"].astype(np.float32) / 255.0
    rt = pair["right"].astype(np.float32) / 255.0
    lm, rm = stereo_pair_masks(lf, rt, scale=3, levels=3, thold=0.3)
    lefts.append(lf); rights.append(rt); lmasks.append(lm); rmasks.append(rm)
left = jnp.asarray(np.stack(lefts))
right = jnp.asarray(np.stack(rights))
left_masks = [jnp.asarray(np.stack([m[i] for m in lmasks])) for i in range(3)]
right_masks = [jnp.asarray(np.stack([m[i] for m in rmasks])) for i in range(3)]

ARMS = {
    "base": {},
    "split": {"split_concat": True},
    "shift2d": {"conv3d_impl": "shift2d"},
    "both": {"split_concat": True, "conv3d_impl": "shift2d"},
}

variables = None
results = {}
finals = {}
for name, kw in ARMS.items():
    cfg = ModelConfig(max_disp=216, base_channels=8, num_stage=4,
                      down_scale=3, cost_func="cor", use_detail=False,
                      s2d_fine=True, s2d_stages=2, dtype="bfloat16",
                      matching_impl="auto", **kw)
    model = get_model("decnet", cfg)
    if variables is None:
        ih = iw = 54
        init_masks = [jnp.zeros((1, ih // s, iw // s)) for s in (9, 3, 1)]
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, ih, iw, 3)),
                               jnp.zeros((1, ih, iw, 3)),
                               init_masks, init_masks)

    @jax.jit
    def forward(carry):
        pred = model.apply(variables, left + carry * 1e-12, right,
                           left_masks, right_masks, train=False)["preds"][-1]
        return pred.mean()

    carry = forward(jnp.float32(0)); jax.block_until_ready(carry)
    carry = forward(carry); jax.block_until_ready(carry)
    iters = 15
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = forward(carry)
        final = float(carry)           # scalar readback = the real fence
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    assert np.isfinite(final)
    finals[name] = final
    results[name] = round(batch * iters / best, 2)
    print(f"{name:8s} {results[name]:8.2f} pairs/s   (final {final:.6f})",
          flush=True)

# identical outputs across arms (bf16: small tolerance)
ref = finals["base"]
for name, f in finals.items():
    assert abs(f - ref) < 1e-2 * max(1.0, abs(ref)), (name, f, ref)
print(json.dumps(results))
