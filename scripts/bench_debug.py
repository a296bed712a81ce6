import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
import time, numpy as np, jax, jax.numpy as jnp
ensure_tpu()
from decnet_tpu.config import ModelConfig
from decnet_tpu.models import get_model
cfg = ModelConfig(max_disp=216, base_channels=8, num_stage=4, down_scale=3,
                  cost_func="cor", use_detail=True, thold=0.9,
                  dtype="bfloat16", matching_impl="auto")
model = get_model("decnet", cfg)
rng = np.random.RandomState(0)
B,H,W=2,540,972
img = jnp.asarray(rng.rand(B,H,W,3), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,54,54,3)), jnp.zeros((1,54,54,3)))

def chain(name, f, iters=15):
    c = f(jnp.float32(0)); jax.block_until_ready(c)
    c = f(c); jax.block_until_ready(c)
    t0=time.perf_counter()
    for _ in range(iters): c = f(c)
    jax.block_until_ready(c); v=float(np.asarray(c).ravel()[0])
    print(f"{name:34s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms  ({v:.3g})", flush=True)

@jax.jit
def f_meanonly(c):
    out = model.apply(variables, img + c*1e-12, img, train=False)
    return out["preds"][-1].mean()
chain("mean-only return", f_meanonly)

@jax.jit
def f_predtuple(c):
    pred = model.apply(variables, img + c*1e-12, img, train=False)["preds"][-1]
    return pred, pred.mean()
def g(c):
    p, m = f_predtuple(c)
    return m
chain("pred+mean tuple return", g)
