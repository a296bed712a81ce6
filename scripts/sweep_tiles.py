"""(tw, rb) tile sweep for the CW-layout moments and hwarp kernels at the
stage-3 (full-res C=8, D=216) shape — the most expensive kernel calls in the
model. Band overlap per tile is (tw + D-1)/tw, so larger tw does less
redundant work; rb trades grid parallelism for per-program size."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
import time
import numpy as np, jax, jax.numpy as jnp
ensure_tpu()
from decnet_tpu.ops.pallas import spamat
from decnet_tpu.ops.pallas.warp import _hwarp_rows

B, H, W, C = 4, 540, 972, 8
D = 216
R = B * H
rng = np.random.RandomState(0)
ref = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
tar = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
msk = jnp.asarray((rng.rand(B, H, W) < 0.3), jnp.float32)
feat_rows = jnp.asarray(rng.randn(B, H, C, W), jnp.bfloat16)
disp = jnp.asarray(rng.rand(B, H, W) * (D - 1), jnp.float32)


def timeit(name, fn, carry0, iters=20):
    g = jax.jit(fn)
    try:
        c = g(carry0); jax.block_until_ready(c)
    except Exception as e:  # noqa: BLE001
        print(f"{name:40s} FAIL {str(e)[:90]}", flush=True)
        return None
    c = g(c); jax.block_until_ready(c)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            c = g(c)
        v = float(c)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    print(f"{name:40s} {best*1e3:8.3f} ms  ({v:.4g})", flush=True)
    return best


print("== moments (CW layout, stage3 shape) ==", flush=True)
for tw in (128, 256, 512):
    for rb in (8, 16, 32):
        def f(carry, tw=tw, rb=rb):
            r = ref + carry.astype(jnp.bfloat16) * 0
            m, se, sed, sed2 = spamat.moments(r, tar, msk, msk, D,
                                              tw=tw, rb=rb)
            return sed.mean() + se.mean()
        timeit(f"moments tw={tw} rb={rb}", f, jnp.float32(0))

print("== hwarp (CW layout, stage3 shape) ==", flush=True)
for tw in (128, 256, 512):
    for rb in (8, 16, 32):
        def f(carry, tw=tw, rb=rb):
            ff = feat_rows + carry.astype(jnp.bfloat16) * 0
            o = _hwarp_rows(ff, disp, D, tw=tw, rb=rb)
            return o.astype(jnp.float32).mean()
        timeit(f"hwarp tw={tw} rb={rb}", f, jnp.float32(0))
