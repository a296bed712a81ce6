"""Device mesh and sharding rules.

The reference's entire parallelism story is single-process
`torch.nn.DataParallel` + thread-rendezvous SyncBN
(modules/sync_batchnorm/, eval.py:144-147).  The TPU build replaces all of it
with a (data, tile, disp) mesh:

* **data**  — batch axis; pure data parallelism.
* **tile**  — image-H axis; spatial tiling of all conv stencils.  XLA's SPMD
  partitioner inserts the halo exchanges for convolutions automatically, and
  the sparse-matching kernels operate on independent rows, so an H shard needs
  no communication at all.
* **disp**  — the S (hypothesis) axis of the stage-0 cost volume; soft-argmin
  over a sharded S decomposes into psum-merged partial softmax stats, which
  XLA also derives automatically from the jnp softmax.

BatchNorm becomes synchronous *by construction*: under jit+GSPMD, batch-stat
means are global over the sharded batch (subsuming the 743-LoC SyncBN stack).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from decnet_tpu.config import MeshConfig

AXES = ("data", "tile", "disp")


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    cfg = cfg or MeshConfig()
    tile = max(1, cfg.tile)
    disp = max(1, cfg.disp)
    data = cfg.data if cfg.data > 0 else n // (tile * disp)
    assert data * tile * disp == n, (
        f"mesh {data}x{tile}x{disp} != {n} devices")
    arr = np.asarray(devices).reshape(data, tile, disp)
    return Mesh(arr, AXES)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard a (B, H, W, ...) array over (data, tile)."""
    spec = [None] * ndim
    spec[0] = "data"
    if ndim >= 3:
        spec[1] = "tile"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def volume_spec() -> P:
    """(B, S, H, W, C) cost-volume partition spec.

    H is deliberately NOT on the tile axis: the 1/27-res volume is tiny
    (20x36 at the flagship shape), so spatial shards would be smaller than
    the 3D-conv halos — all exchange, no compute.  The coarse stage is
    data x disp parallel and spatially replicated (see coarse_spec)."""
    return P("data", "disp", None, None, None)


def cost_spec() -> P:
    """(B, S, H, W) regularised-cost partition spec."""
    return P("data", "disp", None, None)


def coarse_spec() -> P:
    """Coarse (1/27-res) feature maps: batch-sharded, spatially replicated.

    Two reasons. (1) Performance: at 1/27 the maps are a few rows per shard
    (20x36 at the flagship shape over tile>=2); conv halo exchange would
    dominate any compute. (2) Robustness: tiny spatial shards (<= the conv
    halo) are exactly the regime where jax-0.9.0 partitioner backward bugs
    live (Shardy's fork+concat mis-scaling; the GSPMD kernel-grad idle-axis
    bug worked around in ops/spmd_conv.py).  Keeping the coarse level
    spatially replicated sidesteps the degenerate-shard regime entirely; the
    strengthened __graft_entry__.dryrun_multichip checks gradients numerically
    against a single-device replay every run."""
    return P("data")


def constrain(x, spec: P):
    """`with_sharding_constraint` that degrades to a no-op without a mesh.

    The model calls this on its stage-0 cost volume so that, when the caller
    traces under a ``with mesh:`` context, the S (disparity-hypothesis) axis
    is sharded across the `disp` mesh axis and GSPMD decomposes the
    soft-argmin into psum-merged partial softmax stats (the same online-
    softmax decomposition the reference's CUDA kernel uses per-thread,
    SM_kernel.cu:100-124).  Outside any mesh context (single-chip inference,
    CPU tests) the constraint is unresolvable and is skipped.
    """
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (RuntimeError, ValueError, TypeError):
        return x


def shard_batch(batch, mesh: Mesh):
    """Build globally-sharded device arrays from each process's LOCAL batch.

    Single-process: a plain device_put onto the (data, tile) sharding.
    Multi-process: each host feeds only the batch rows it loaded
    (DataLoader(shard=(process_index, process_count)) samples a disjoint
    subset), and `jax.make_array_from_process_local_data` assembles the
    global array without any cross-host copy of the full batch — the
    TPU-native replacement for nn.DataParallel's scatter
    (reference eval.py:146).  Requires the mesh's `data` axis to span
    processes evenly (the standard multi-host layout: batch divided across
    hosts, tile/disp axes within a host's chips).
    """
    nproc = jax.process_count()

    def put(x):
        sharding = batch_sharding(mesh, np.ndim(x))
        if nproc == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding,
                                                      np.asarray(x))
    return jax.tree_util.tree_map(put, batch)
