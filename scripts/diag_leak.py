"""Diagnose the host-memory growth that OOM-killed the round-2 training run
(~13 MB/step at batch 8, 162x243 — exactly one host batch per step).

Phase A reuses ONE device-resident batch every step: growth here implicates
the step execution itself (remote-backend buffers, logs, optimizer).
Phase B re-transfers a fresh host batch every step (the train-CLI pattern):
growth here implicates the host->device transfer path.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gc
import numpy as np
import psutil

from decnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax

from decnet_tpu.config import Config
from decnet_tpu.cli.common import init_model_and_state
from decnet_tpu.parallel.mesh import make_mesh, shard_batch, replicated
from decnet_tpu.train.step import make_train_step

cfg = Config()
cfg.model.max_disp = 108
cfg.model.use_detail = False
cfg.model.dtype = "bfloat16"
cfg.train.crop_h, cfg.train.crop_w = 162, 243
cfg.train.batch_size = 8

model, state, _ = init_model_and_state(cfg, None)
mesh = make_mesh(cfg.mesh)
state = jax.device_put(state, replicated(mesh))
train_step = make_train_step(model, cfg)

rng = np.random.RandomState(0)
B, H, W = 8, 162, 243


def make_host_batch():
    return {
        "left": rng.rand(B, H, W, 3).astype(np.float32),
        "right": rng.rand(B, H, W, 3).astype(np.float32),
        "gt": (rng.rand(B, H, W) * 100).astype(np.float32),
        "left_masks": [(rng.rand(B, H // s, W // s) < 0.5).astype(np.float32)
                       for s in (9, 3, 1)],
        "right_masks": [(rng.rand(B, H // s, W // s) < 0.5).astype(np.float32)
                        for s in (9, 3, 1)],
    }


proc = psutil.Process()


def rss_mb():
    return proc.memory_info().rss / 1e6


_staging = None


def staged_host_batch():
    """Fresh data written IN PLACE into persistent numpy buffers: tests
    whether the axon client's per-transfer host leak keys on buffer
    identity (E) or on each device_put call regardless (leak persists)."""
    global _staging
    fresh = make_host_batch()
    if _staging is None:
        _staging = fresh
        return _staging
    for k, v in fresh.items():
        if isinstance(v, list):
            for dst, src in zip(_staging[k], v):
                np.copyto(dst, src)
        else:
            np.copyto(_staging[k], v)
    return _staging


def run(n, fresh, sync_every=0, gc_every=0, label="", staged=False):
    global state
    base = None
    with mesh:
        fixed = shard_batch(make_host_batch(), mesh)
        for i in range(n):
            batch = shard_batch(staged_host_batch() if staged
                                else make_host_batch(), mesh) if fresh \
                else fixed
            state, logs = train_step(state, batch)
            if sync_every and (i + 1) % sync_every == 0:
                float(logs["total"])
            if gc_every and (i + 1) % gc_every == 0:
                gc.collect()
            if (i + 1) % 20 == 0:
                float(logs["total"])  # fence before measuring
                m = rss_mb()
                if base is None:
                    base = m
                print(f"{label} step {i+1:4d} rss {m:8.1f} MB "
                      f"(+{m-base:7.1f})", flush=True)
    return rss_mb()


print("jax backend:", jax.default_backend(), flush=True)
if os.environ.get("DIAG_PHASE", "E") == "ALL":
    run(100, fresh=False, sync_every=0, label="A fixed-batch  ")
    gc.collect()
    run(100, fresh=True, sync_every=0, label="B fresh-batch  ")
    gc.collect()
    run(100, fresh=True, sync_every=1, label="C fresh+sync1  ")
    gc.collect()
    run(100, fresh=True, sync_every=0, gc_every=10, label="D fresh+gc10   ")
else:
    run(100, fresh=True, staged=True, label="E staged-bufs  ")
