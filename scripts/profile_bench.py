"""XProf op-level breakdown of the exact bench.py configuration (precomputed
masks, s2d flagship, batch 4)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
import glob, json, collections
import numpy as np, jax, jax.numpy as jnp
ensure_tpu()
from decnet_tpu.config import ModelConfig
from decnet_tpu.models import get_model
from decnet_tpu.data.synthetic import make_pair
from decnet_tpu.data.masks import stereo_pair_masks

cfg = ModelConfig(max_disp=216, base_channels=8, num_stage=4, down_scale=3,
                  cost_func="cor", use_detail=False,
                  dtype="bfloat16", matching_impl="auto", s2d_fine=True)
model = get_model("decnet", cfg)
rng = np.random.RandomState(0)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
H, W = 540, 972
lefts, rights, lmasks, rmasks = [], [], [], []
for _ in range(B):
    pair = make_pair(rng, H, W, max_disp=192)
    lf = pair["left"].astype(np.float32) / 255.0
    rt = pair["right"].astype(np.float32) / 255.0
    lm, rm = stereo_pair_masks(lf, rt)
    lefts.append(lf); rights.append(rt); lmasks.append(lm); rmasks.append(rm)
left = jnp.asarray(np.stack(lefts))
right = jnp.asarray(np.stack(rights))
left_masks = [jnp.asarray(np.stack([m[i] for m in lmasks])) for i in range(3)]
right_masks = [jnp.asarray(np.stack([m[i] for m in rmasks])) for i in range(3)]

ih = iw = 54
init_masks = [jnp.zeros((1, ih // s, iw // s)) for s in (9, 3, 1)]
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, ih, iw, 3)),
                       jnp.zeros((1, ih, iw, 3)), init_masks, init_masks)


@jax.jit
def f(c):
    out = model.apply(variables, left + c * 1e-12, right,
                      left_masks, right_masks, train=False)
    return out["preds"][-1].mean()


c = f(jnp.float32(0)); float(c)
c = f(c); float(c)
logdir = "/tmp/bench_trace"; os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for _ in range(3):
        c = f(c)
    print("carry", float(c))
xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
from xprof.convert import raw_to_tool_data as rtd
data, _ = rtd.xspace_to_tool_data(xs, "framework_op_stats", {})
tbl = json.loads(data)[0]
cols = [cc["id"] for cc in tbl["cols"]]
ii = {cc: i for i, cc in enumerate(cols)}
rows = [[cc.get("v") for cc in r["c"]] for r in tbl["rows"]]
dev = [r for r in rows if r[ii["host_or_device"]] == "Device"]
tot = sum(float(r[ii["total_self_time"]]) for r in dev)
print(f"total device self time per call: {tot/3/1000:.2f} ms")
dev.sort(key=lambda r: -float(r[ii["total_self_time"]]))
for r in dev[:22]:
    print(f"{r[ii['operation']][:70]:70s} "
          f"{float(r[ii['total_self_time']])/3000:7.2f} ms "
          f"{str(r[ii['bound_by']]):>8s}")
agg = collections.Counter()
for r in dev:
    agg[r[ii["type"]]] += float(r[ii["total_self_time"]]) / 3000
print({k: round(v, 1) for k, v in agg.most_common(10)})
