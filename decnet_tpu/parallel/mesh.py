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
    """(B, S, H, W, C) cost-volume partition spec."""
    return P("data", "disp", "tile", None, None)


def shard_batch(batch, mesh: Mesh):
    """Apply batch sharding to every array in a pytree."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(put, batch)
