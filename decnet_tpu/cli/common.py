"""Shared CLI plumbing: config flags, model/state construction."""
from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

from decnet_tpu.config import Config


def add_config_args(p: argparse.ArgumentParser):
    p.add_argument("--config", type=str, default=None,
                   help="JSON/YAML config file")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="SECTION.KEY=VALUE",
                   help="config override, e.g. --set model.max_disp=192")
    # reference-parity convenience flags (demo.py:22-67)
    p.add_argument("--arch", type=str, default=None)
    p.add_argument("--max_disp", type=int, default=None)
    p.add_argument("--base_channels", type=int, default=None)
    p.add_argument("--num_stage", type=int, default=None)
    p.add_argument("--down_scale", type=int, default=None)
    p.add_argument("--cost_func", type=str, default=None)
    p.add_argument("--skip_stage_id", type=int, default=None)
    p.add_argument("--use_detail", type=int, default=None)
    p.add_argument("--thold", type=float, default=None)
    p.add_argument("--down_func_name", type=str, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint directory (orbax) or .npz params")
    p.add_argument("--seed", type=int, default=None)


def build_config(args) -> Config:
    cfg = Config.load(args.config) if args.config else Config()
    for name in ("arch", "max_disp", "base_channels", "num_stage",
                 "down_scale", "cost_func", "skip_stage_id", "thold"):
        v = getattr(args, name, None)
        if v is not None:
            setattr(cfg.model, name, v)
    if args.use_detail is not None:
        cfg.model.use_detail = bool(args.use_detail)
    if args.down_func_name is not None:
        cfg.loss.down_func_name = args.down_func_name
    if getattr(args, "seed", None) is not None:
        cfg.train.seed = args.seed
    cfg = cfg.apply_overrides(args.overrides)
    return cfg


def apply_checkpoint_sidecar(cfg: Config, args) -> Config:
    """Adopt the checkpoint's config.json architecture without discarding
    explicit CLI intent (self-describing checkpoints).

    The sidecar describes the architecture the checkpoint was trained with,
    so it becomes the base model config — but any model flag the user passed
    on the CLI (--thold, --use_detail, ...) and every `--set model.*`
    override is re-applied on top, and max_disp stays the runtime value the
    CLI resolved (per-scene ndisp / --max_disp are serving knobs, not
    architecture).  Without this, a user passing --thold at eval silently got
    the training-time value."""
    sidecar = getattr(args, "resume", None) and \
        os.path.join(args.resume, "config.json")
    if not (sidecar and os.path.exists(sidecar)):
        return cfg
    runtime_max_disp = cfg.model.max_disp
    cfg.model = Config.load(sidecar, lenient=True).model
    cfg.model.max_disp = runtime_max_disp
    reapplied = []
    for name in ("arch", "base_channels", "num_stage", "down_scale",
                 "cost_func", "skip_stage_id", "thold"):
        v = getattr(args, name, None)
        if v is not None:
            setattr(cfg.model, name, v)
            reapplied.append(name)
    if getattr(args, "use_detail", None) is not None:
        cfg.model.use_detail = bool(args.use_detail)
        reapplied.append("use_detail")
    model_ovs = [ov for ov in getattr(args, "overrides", [])
                 if ov.startswith("model.")]
    if model_ovs:
        cfg = cfg.apply_overrides(model_ovs)
        reapplied.extend(ov.split("=", 1)[0] for ov in model_ovs)
    extra = f" (CLI keeps: {', '.join(reapplied)})" if reapplied else ""
    print(f"model config from {sidecar}{extra}")
    return cfg


def init_model_and_state(cfg: Config, resume: Optional[str] = None,
                         for_training: bool = True):
    """Build model + (possibly restored) TrainState on tiny init shapes."""
    import jax
    import jax.numpy as jnp
    from decnet_tpu.models import get_model
    from decnet_tpu.train.state import create_train_state
    from decnet_tpu.train.checkpoint import CheckpointManager

    model = get_model(cfg.model.arch, cfg.model)
    k = cfg.model.down_scale ** (cfg.model.num_stage - 1) * 2
    dummy = jnp.zeros((1, k, k, 3))
    # jit the init: eager init dispatches hundreds of tiny ops, which through
    # the remote-TPU tunnel costs minutes; one compiled (and cached) call
    # costs seconds.
    if cfg.model.use_detail:
        variables = jax.jit(model.init)(jax.random.PRNGKey(cfg.train.seed),
                                        dummy, dummy)
    else:
        s = cfg.model.down_scale
        masks = [jnp.zeros((1, k // s ** (cfg.model.num_stage - 1 - i),
                            k // s ** (cfg.model.num_stage - 1 - i)))
                 for i in range(1, cfg.model.num_stage)]
        variables = jax.jit(model.init)(jax.random.PRNGKey(cfg.train.seed),
                                        dummy, dummy, masks, masks)
    state = create_train_state(model, variables, cfg.train)
    mgr = None
    npz = resume and (resume if resume.endswith(".npz")
                      else os.path.join(resume, "params.npz"))
    if npz and os.path.exists(npz):
        # durable params+batch_stats snapshot (scripts/export_ckpt.py):
        # no optimizer state, so only valid for inference / warm starts
        from decnet_tpu.train.checkpoint import load_params
        restored = load_params(npz, {"params": state.params,
                                     "batch_stats": state.batch_stats})
        step = 0
        meta = os.path.join(os.path.dirname(npz), "meta.json")
        if os.path.exists(meta):
            import json
            with open(meta) as f:
                step = int(json.load(f).get("step", 0))
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              step=step)
        print(f"Restored params snapshot (step {step}) from {npz}")
    elif resume:
        mgr = CheckpointManager(resume, keep=cfg.train.keep_ckpts)
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"Restored checkpoint step {int(state.step)} from {resume}")
        else:
            print(f"No checkpoint found in {resume}; starting fresh")
    return model, state, mgr
