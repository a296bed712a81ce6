"""Inspect the compiled HLO of moments_rows at the stage-3 flagship shape:
what is the expensive 'reshape' the profiler attributes ~4.6 ms to?"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()
import re
import numpy as np, jax, jax.numpy as jnp
ensure_tpu()
from decnet_tpu.ops.pallas.spamat import moments_rows

B, H, C, W, D = 4, 540, 8, 972, 216
ref = jnp.zeros((B, H, C, W), jnp.bfloat16)
tar = jnp.zeros((B, H, C, W), jnp.bfloat16)
lm = jnp.zeros((B, H, W), jnp.float32)
rm = jnp.zeros((B, H, W), jnp.float32)

lowered = jax.jit(moments_rows, static_argnames=("max_disp",)).lower(
    ref, tar, lm, rm, max_disp=D)
compiled = lowered.compile()
txt = compiled.as_text()
print("cost:", {k: v for k, v in compiled.cost_analysis().items()
                if k in ("flops", "bytes accessed")})
# print every fusion/reshape/copy/transpose line with large shapes
for line in txt.splitlines():
    ls = line.strip()
    if re.match(r"^%?(fusion|reshape|copy|transpose|bitcast|pad)", ls) or \
       " = " in ls and re.search(r"= (f32|bf16)\[[0-9,]{8,}\].*(reshape|copy|transpose|pad)\(", ls):
        if re.search(r"\[[0-9]{3,}", ls):
            print(ls[:220])
