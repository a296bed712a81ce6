"""Capture an XProf device trace of the flagship forward and print the
op-level time breakdown (framework_op_stats via xprof).

Run exclusively (single-tenant TPU):
    python scripts/profile_model.py [H W B max_disp]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from decnet_tpu.utils.cache import enable_compilation_cache, ensure_tpu
enable_compilation_cache()


def main():
    import glob
    import numpy as np
    import jax
    import jax.numpy as jnp
    from decnet_tpu.config import ModelConfig
    from decnet_tpu.models import get_model

    ensure_tpu()
    args = sys.argv[1:]
    H = int(args[0]) if args else 540
    W = int(args[1]) if len(args) > 1 else 972
    B = int(args[2]) if len(args) > 2 else 2
    D = int(args[3]) if len(args) > 3 else 216

    cfg = ModelConfig(max_disp=D, base_channels=8, num_stage=4, down_scale=3,
                      cost_func="cor", use_detail=True, thold=0.9,
                      dtype="bfloat16", matching_impl="auto")
    model = get_model("decnet", cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 54, 54, 3)),
                           jnp.zeros((1, 54, 54, 3)))

    @jax.jit
    def fwd(v, l, r, c):
        out = model.apply(v, l + c * 1e-12, r, train=False)["preds"][-1]
        return out, out.mean()

    rng = np.random.RandomState(0)
    left = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    right = jnp.asarray(rng.rand(B, H, W, 3), jnp.float32)
    carry = jnp.float32(0)
    out, carry = fwd(variables, left, right, carry)
    jax.block_until_ready(carry)
    out, carry = fwd(variables, left, right, carry)
    jax.block_until_ready(carry)

    logdir = "/tmp/decnet_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out, carry = fwd(variables, left, right, carry)
        jax.block_until_ready(carry)
    print("trace captured; carry =", float(carry))

    xspaces = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xspaces)
    if not xspaces:
        return
    from xprof.convert import raw_to_tool_data as rtd
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data, _ = rtd.xspace_to_tool_data(xspaces, tool, {})
            fn = f"/tmp/decnet_trace/{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(fn, mode) as f:
                f.write(data)
            print(tool, "->", fn, len(data))
        except Exception as e:
            print(tool, "failed:", e)


if __name__ == "__main__":
    main()
