"""Export a durable params+batch_stats snapshot from a full Orbax train
state (VERDICT r4 missing #4: every round-4 checkpoint lived only in /tmp).

The full train state is ~300-700 MB (optimizer moments dominate); the
inference-relevant part of this ~2M-param model is tens of MB, so it can be
git-committed.  Output directory layout:

    <out>/params.npz    flattened params+batch_stats pytree (f32)
    <out>/config.json   the training run's config sidecar (architecture)
    <out>/meta.json     {step, source}

`--resume <out>` then restores it anywhere (cli/common.py npz path), and
scripts/report_eval.py / the demo CLI accept it directly.

  python scripts/export_ckpt.py --ckpt /tmp/r4_s2d_win --out runs/ckpt_flagship
"""
import sys, os, argparse, json, shutil
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")   # pure host-side copy
for _v in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
    os.environ.pop(_v, None)

import numpy as np

from decnet_tpu.train.checkpoint import CheckpointManager, save_params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="Orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output snapshot dir")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    args = p.parse_args(argv)

    mgr = CheckpointManager(args.ckpt)
    step = args.step if args.step is not None else mgr.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoint in {args.ckpt}")
    raw = mgr._mgr.restore(step)        # as-saved tree, no template needed
    os.makedirs(args.out, exist_ok=True)
    save_params(os.path.join(args.out, "params.npz"),
                {"params": raw["params"], "batch_stats": raw["batch_stats"]})
    sidecar = os.path.join(args.ckpt, "config.json")
    if os.path.exists(sidecar):
        shutil.copy(sidecar, os.path.join(args.out, "config.json"))
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump({"step": int(step), "source": os.path.abspath(args.ckpt)},
                  f, indent=2)
    sz = os.path.getsize(os.path.join(args.out, "params.npz")) / 1e6
    n = sum(int(np.prod(np.shape(v))) for v in
            __import__("jax").tree_util.tree_leaves(raw["params"]))
    print(f"exported step {step}: {n/1e6:.2f}M params, {sz:.1f} MB -> "
          f"{args.out}")


if __name__ == "__main__":
    main()
