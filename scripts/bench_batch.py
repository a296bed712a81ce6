"""Sweep batch size and weights-passing style for the flagship bench config."""
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
                  dtype="bfloat16", matching_impl="auto", s2d_fine=True)
model = get_model("decnet", cfg)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 54, 54, 3)),
                       jnp.zeros((1, 54, 54, 3)))
rng = np.random.RandomState(0)
H, W = 540, 972


def chain(name, f, B, iters=15):
    c = f(jnp.float32(0)); jax.block_until_ready(c)
    c = f(c); jax.block_until_ready(c)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            c = f(c)
        v = float(c)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} {best*1000:9.2f} ms/call -> {B/best:6.1f} pairs/s"
          f" ({v:.3g})", flush=True)


for B in (2, 4, 8):
    img = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)

    @jax.jit
    def f_closure(c, img=img):
        out = model.apply(variables, img + c * 1e-12, img, train=False)
        return out["preds"][-1].mean()

    chain(f"closure B={B}", f_closure, B)

    @jax.jit
    def f_args(v, c, img=img):
        out = model.apply(v, img + c * 1e-12, img, train=False)
        return out["preds"][-1].mean()

    import functools
    chain(f"args    B={B}", functools.partial(f_args, variables), B)
