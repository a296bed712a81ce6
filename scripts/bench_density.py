"""Throughput of the fused matching moments vs detail-mask density — shows
the mask-aware tile skip (cost ~ density, like the reference CUDA kernel).
Masks are spatially clustered (blurred-noise threshold), as real detail masks
are; uniformly random masks would leave no tile empty."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
import time
import numpy as np, jax, jax.numpy as jnp
ensure_tpu()
from decnet_tpu.ops.pallas import spamat

B, H, W, C = 4, 540, 972, 8
D = 216
rng = np.random.RandomState(0)
ref = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
tar = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)


def clustered_mask(density):
    """Blur white noise, threshold at the density quantile -> blobs."""
    import cv2
    f = rng.rand(B, H, W).astype(np.float32)
    for b in range(B):
        f[b] = cv2.GaussianBlur(f[b], (0, 0), 12)
    if density <= 0:
        return np.zeros_like(f)
    th = np.quantile(f, 1.0 - density)
    return (f >= th).astype(np.float32)


def timeit(fn, carry0, iters=20):
    g = jax.jit(fn)
    c = g(carry0); jax.block_until_ready(c)
    c = g(c); jax.block_until_ready(c)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            c = g(c)
        float(c)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


for density in (0.0, 0.05, 0.1, 0.2, 0.4, 0.8, 1.0):
    m = clustered_mask(density)
    msk = jnp.asarray(m)

    def f(carry, msk=msk):
        r = ref + carry.astype(jnp.bfloat16) * 0
        mm, se, sed, sed2 = spamat.moments(r, tar, msk, msk, D)
        return sed.mean() + se.mean()

    dt = timeit(f, jnp.float32(0))
    print(f"density {density:4.2f} (real {m.mean():4.2f}): "
          f"{dt*1e3:7.3f} ms", flush=True)
