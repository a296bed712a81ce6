"""Training CLI — the piece the reference never shipped (README.md:6).

Jitted sharded train step (multi-stage uploss + optional detail-mask
supervision), Orbax checkpointing with resume, periodic eval, metric logging.

Usage:
  python -m decnet_tpu.cli.train --dataset sceneflow --root /data/sf \
      --train_split train [--config cfg.yaml] [--set train.lr=1e-3 ...]

Multi-host: launch one process per host with the same flags;
jax.distributed.initialize is called automatically when the cluster env is
present (--multihost 1 to force).
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from decnet_tpu.utils.cache import enable_compilation_cache
from decnet_tpu.cli.common import add_config_args, build_config, \
    init_model_and_state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--root", type=str, required=True)
    p.add_argument("--train_split", type=str, default="train")
    p.add_argument("--eval_split", type=str, default=None,
                   help="run EPE/D1 eval on this split every eval_every steps")
    p.add_argument("--eval_every", type=int, default=2000)
    p.add_argument("--eval_batches", type=int, default=16)
    p.add_argument("--ckpt_dir", type=str, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--multihost", type=int, default=0)
    p.add_argument("--mask_source", type=str, default="compute")
    p.add_argument("--dataset_length", type=int, default=None,
                   help="dataset length for synthetic data")
    p.add_argument("--init_from", type=str, default=None,
                   help="warm-start: partially load params/batch_stats from "
                        "another run's checkpoint dir (shape/path-matched; "
                        "optimizer and step start fresh)")
    args = p.parse_args(argv)

    enable_compilation_cache()
    import jax

    if args.multihost or "JAX_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()

    cfg = build_config(args)
    if args.ckpt_dir:
        cfg.train.ckpt_dir = args.ckpt_dir
    if args.steps:
        cfg.train.total_steps = args.steps

    # self-describing checkpoints: persist the full config next to the Orbax
    # steps so eval/report tooling rebuilds the exact architecture (norm,
    # s2d form, match_temp, ...) without re-specifying flags
    if jax.process_index() == 0:
        os.makedirs(cfg.train.ckpt_dir, exist_ok=True)
        cfg.save(os.path.join(cfg.train.ckpt_dir, "config.json"))

    from decnet_tpu.data import get_dataset
    from decnet_tpu.data.loader import DataLoader
    from decnet_tpu.parallel.mesh import make_mesh, shard_batch, replicated
    from decnet_tpu.train.checkpoint import CheckpointManager
    from decnet_tpu.train.step import make_train_step, make_eval_step

    model, state, mgr = init_model_and_state(cfg, cfg.train.ckpt_dir)
    if mgr is None:
        mgr = CheckpointManager(cfg.train.ckpt_dir, keep=cfg.train.keep_ckpts)
    if args.init_from and int(state.step) == 0:
        src = CheckpointManager(args.init_from, keep=1)
        state = src.restore_partial(state)

    mesh = make_mesh(cfg.mesh)
    state = jax.device_put(state, replicated(mesh))
    train_step = make_train_step(model, cfg)
    # Integrated BN-freeze tail (docs/training.md): past freeze_bn_after the
    # forward normalises with the fixed running stats (exactly as eval will)
    # while the weights keep training — one run, no separate fine-tune.
    freeze_after = getattr(cfg.train, "freeze_bn_after", 0)
    if getattr(cfg.train, "packed_exec", False):
        # training-mode repack: faithful-form params (reference-compatible
        # checkpoints, per-channel BN running stats) executed through the
        # packed s2d twin — valid exactly when BN is frozen, so this
        # replaces the freeze phase's step.  repack.py::repack_linear.
        assert not cfg.model.s2d_fine, "packed_exec is for faithful form"
        from decnet_tpu.models.repack import repack_linear
        model_s, rl = repack_linear(
            {"params": state.params, "batch_stats": state.batch_stats},
            cfg.model, stages=2)
        freeze_step = make_train_step(model_s, cfg, freeze_bn=True,
                                      apply_transform=rl)
        assert freeze_after > 0 or cfg.train.freeze_bn, \
            "packed_exec needs a freeze_bn phase to apply to"
        if cfg.train.freeze_bn:
            train_step = freeze_step
    else:
        freeze_step = (make_train_step(model, cfg, freeze_bn=True)
                       if freeze_after > 0 else None)

    # cfg.train.batch_size is the GLOBAL batch; each process loads only its
    # share and shard_batch assembles the global array from the local rows
    # (jax.make_array_from_process_local_data — no full-batch broadcast).
    nproc, pidx = jax.process_count(), jax.process_index()
    assert cfg.train.batch_size % nproc == 0, (
        f"global batch {cfg.train.batch_size} not divisible by "
        f"{nproc} processes")
    local_bs = cfg.train.batch_size // nproc

    eval_step = make_eval_step(model, cfg) if args.eval_split else None

    if cfg.data.on_device:
        # On-device synthetic stream: zero recurring host->device transfers
        # (works around the remote-client transfer leak, scripts/diag_leak.py)
        # and an infinite non-repeating dataset. Single-process only.
        assert args.dataset == "synthetic", "on_device data is synthetic-only"
        assert nproc == 1, "on_device data stream is single-process"
        from decnet_tpu.data.device_synth import device_batch_stream
        import jax.numpy as jnp
        gen_kw = dict(batch=cfg.train.batch_size, h=cfg.train.crop_h,
                      w=cfg.train.crop_w, max_disp=cfg.model.max_disp,
                      scale=cfg.model.down_scale,
                      levels=cfg.model.num_stage - 1,
                      thold=cfg.data.mask_thold,
                      dtype=jnp.bfloat16 if cfg.model.dtype == "bfloat16"
                      else jnp.float32,
                      variant=cfg.data.variant)
        loader = device_batch_stream(cfg.train.seed, mesh=mesh,
                                     start_step=int(state.step), **gen_kw)
        eval_batches = None
        if args.eval_split:
            val_stream = device_batch_stream(cfg.train.seed, val=True,
                                             mesh=mesh, **gen_kw)
            eval_batches = [next(val_stream)
                            for _ in range(args.eval_batches)]
    else:
        ds_kw = {}
        if args.dataset_length is not None:
            ds_kw["length"] = args.dataset_length
        ds = get_dataset(args.dataset, args.root, split=args.train_split,
                         is_training=True, mask_source=args.mask_source,
                         img_size=(cfg.train.crop_h, cfg.train.crop_w),
                         scale=cfg.model.down_scale,
                         levels=cfg.model.num_stage - 1, seed=cfg.train.seed,
                         **ds_kw)
        shard = (pidx, nproc) if nproc > 1 else None
        loader = DataLoader(ds, batch_size=local_bs, shuffle=True,
                            num_workers=cfg.data.num_workers, drop_last=True,
                            seed=cfg.train.seed, shard=shard)
        eval_batches = None
        if args.eval_split:
            eval_ds = get_dataset(args.dataset, args.root,
                                  split=args.eval_split, is_training=False,
                                  mask_source=args.mask_source,
                                  img_size=(cfg.train.crop_h,
                                            cfg.train.crop_w),
                                  scale=cfg.model.down_scale,
                                  levels=cfg.model.num_stage - 1)
            eval_loader = DataLoader(eval_ds, batch_size=local_bs,
                                     num_workers=cfg.data.num_workers,
                                     drop_last=True, shard=shard)
            eval_batches = []
            for bi, ebatch in enumerate(eval_loader):
                if bi >= args.eval_batches:
                    break
                for k in ("name", "ori_h", "ori_w", "n_disp"):
                    ebatch.pop(k, None)
                # transfer eval data ONCE at startup, not per eval round
                eval_batches.append(shard_batch(ebatch, mesh))

    def run_eval(state):
        ms = [eval_step(state, eb) for eb in eval_batches]
        return {k: float(np.mean([float(m[k]) for m in ms]))
                for k in ("epe", "d1", "epe_up0", "d1_up0")}

    step = int(state.step)
    t_log = time.perf_counter()
    print(f"training from step {step} to {cfg.train.total_steps} "
          f"(mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
          f"data={'on-device' if cfg.data.on_device else args.dataset})",
          flush=True)
    try:
        import psutil
        rss_proc = psutil.Process()
    except Exception:
        rss_proc = None

    def batches():
        if cfg.data.on_device:
            yield from loader
        else:
            while True:
                for batch in loader:
                    for k in ("name", "ori_h", "ori_w", "n_disp"):
                        batch.pop(k, None)
                    yield shard_batch(batch, mesh)

    # trace under the mesh context so the model's PartitionSpec sharding
    # constraints (disp-axis cost volume) resolve against this mesh
    with mesh:
        for batch in batches():
            if freeze_step is not None and step >= freeze_after:
                state, logs = freeze_step(state, batch)
            else:
                state, logs = train_step(state, batch)
            step += 1
            if step % cfg.train.log_every == 0:
                logs = {k: float(v) for k, v in logs.items()}
                dt = time.perf_counter() - t_log
                t_log = time.perf_counter()
                print(json.dumps(
                    {"step": step,
                     "loss": round(logs["total"], 5),
                     "grad_norm": round(logs["grad_norm"], 4),
                     "steps_per_sec":
                         round(cfg.train.log_every / dt, 3),
                     **{k: round(v, 5) for k, v in logs.items()
                        if k not in ("total", "grad_norm")}}), flush=True)
                # Host-RSS guard: checkpoint + exit(75) so a supervisor
                # (scripts/train_supervised.sh) restarts and resumes.
                if rss_proc is not None and cfg.train.max_rss_gb > 0:
                    rss_gb = rss_proc.memory_info().rss / 1e9
                    if rss_gb > cfg.train.max_rss_gb:
                        if jax.process_index() == 0:
                            mgr.save(step, state)
                        print(f"RSS {rss_gb:.1f} GB > "
                              f"{cfg.train.max_rss_gb} GB; checkpointed @ "
                              f"{step}, exiting 75 for restart", flush=True)
                        raise SystemExit(75)
            if eval_step is not None and step % args.eval_every == 0:
                m = run_eval(state)
                print(json.dumps({"step": step,
                                  "eval_epe": round(m["epe"], 4),
                                  "eval_d1": round(m["d1"], 3),
                                  "eval_epe_up0": round(m["epe_up0"], 4),
                                  "eval_d1_up0": round(m["d1_up0"], 3)}),
                      flush=True)
            if step % cfg.train.ckpt_every == 0 and \
                    jax.process_index() == 0:
                mgr.save(step, state)
                print(f"saved checkpoint @ {step}", flush=True)
            if step >= cfg.train.total_steps:
                break

    if jax.process_index() == 0:
        mgr.save(step, state)
        print(f"final checkpoint @ {step}")


if __name__ == "__main__":
    main()
