"""Chained-dependency component benchmarks on the TPU.

Each component is timed with its input perturbed by the previous output so
the remote runtime can neither dedup nor run ahead (see CLAUDE.md on timing
hazards). Run exclusively:
    python scripts/bench_components.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()

import time
import numpy as np
import jax
import jax.numpy as jnp


def chain_bench(name, step_fn, x0, iters=20):
    """step_fn: scalar-carry -> scalar-carry (jitted); times serial chain."""
    c = step_fn(x0)
    jax.block_until_ready(c)
    c = step_fn(c)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = step_fn(c)
    jax.block_until_ready(c)
    val = float(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1000:9.2f} ms   (carry {val:.3g})", flush=True)
    return dt


def main():
    ensure_tpu()
    from decnet_tpu.config import ModelConfig
    from decnet_tpu.models import get_model
    from decnet_tpu.nn.feature import FeatureExtractor
    from decnet_tpu.nn.heads import CostRegNet, DynamicUpsampling, Refinement
    from decnet_tpu.ops.cost_volume import build_cost_volume
    from decnet_tpu.ops.regression import (uniform_disp_samples,
                                           disparity_regression)
    from decnet_tpu.ops.pallas.spamat import moments
    from decnet_tpu.ops.warp import warp_by_disparity

    B, H, W, D = 2, 540, 972, 216
    rng = np.random.RandomState(0)
    cfg = ModelConfig(max_disp=D, base_channels=8, num_stage=4, down_scale=3,
                      cost_func="cor", use_detail=True, thold=0.9,
                      dtype="bfloat16", matching_impl="auto")
    model = get_model("decnet", cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 54, 54, 3)),
                           jnp.zeros((1, 54, 54, 3)))
    ext = FeatureExtractor(8, 4, 3, dtype=jnp.bfloat16)
    extvars = {"params": variables["params"]["feature_extractor"],
               "batch_stats": variables["batch_stats"]["feature_extractor"]}
    img = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)

    @jax.jit
    def f_ext(c):
        o = ext.apply(extvars, img + c * 1e-12, train=False)
        return sum(v.astype(jnp.float32).mean() for v in o.values())
    chain_bench("extractor (1 view)", f_ext, jnp.float32(0))

    lf0 = jnp.asarray(rng.rand(B, 20, 36, 216), jnp.bfloat16)
    rf0 = jnp.asarray(rng.rand(B, 20, 36, 216), jnp.bfloat16)
    crv = {"params": variables["params"]["cost_reg"],
           "batch_stats": variables["batch_stats"]["cost_reg"]}

    @jax.jit
    def f_stage0(c):
        lf = lf0 + c.astype(jnp.bfloat16) * 1e-6
        samples = uniform_disp_samples(D // 27, B, 20, 36)
        vol = build_cost_volume(lf, rf0, samples.astype(jnp.bfloat16), "cor")
        cost = CostRegNet(216, "cor", dtype=jnp.bfloat16).apply(
            crv, vol, train=False)
        return disparity_regression(cost, samples).mean()
    chain_bench("stage0 (vol+3Dconv+argmin)", f_stage0, jnp.float32(0))

    feat8 = jnp.asarray(rng.rand(B, H, W, 8), jnp.bfloat16)
    disp0 = jnp.asarray(rng.rand(B, H, W) * 50, jnp.float32)

    @jax.jit
    def f_warp(c):
        o = warp_by_disparity(feat8, disp0 + c * 1e-9)
        return o.astype(jnp.float32).mean()
    chain_bench("grid-sample warp full-res C8", f_warp, jnp.float32(0))

    for (h, w, ch, d, name) in [(60, 108, 72, 24, "moments 1/9 C72 D24"),
                                (180, 324, 24, 72, "moments 1/3 C24 D72"),
                                (540, 972, 8, 216, "moments 1/1 C8 D216")]:
        ref = jnp.asarray(rng.rand(B, h, w, ch), jnp.bfloat16)
        tar = jnp.asarray(rng.rand(B, h, w, ch), jnp.bfloat16)
        m1 = jnp.asarray((rng.rand(B, h, w) < 0.05).astype(np.float32))
        m2 = jnp.asarray((rng.rand(B, h, w) < 0.05).astype(np.float32))

        @jax.jit
        def f_mom(c, ref=ref, tar=tar, m1=m1, m2=m2, d=d):
            mm = moments(ref + c.astype(jnp.bfloat16) * 1e-6, tar, m1, m2, d)
            return mm[1].mean()
        chain_bench(name, f_mom, jnp.float32(0))

    # per-stage refinement head (the 7-conv full-res stack)
    rref = {"params": variables["params"]["refine_2"],
            "batch_stats": variables["batch_stats"]["refine_2"]}

    @jax.jit
    def f_refine(c):
        pred, _ = Refinement(8, stage_id=3, dtype=jnp.bfloat16).apply(
            rref, feat8, feat8, disp0 + c * 1e-9, train=False)
        return pred.mean()
    chain_bench("refinement stage3 full-res", f_refine, jnp.float32(0))

    @jax.jit
    def f_full(c):
        out = model.apply(variables, img + c * 1e-12, img, train=False)
        return out["preds"][-1].mean()
    chain_bench("FULL MODEL fwd", f_full, jnp.float32(0))


if __name__ == "__main__":
    main()
