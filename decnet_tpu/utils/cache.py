"""Persistent XLA compilation cache setup.

Flagship-model compiles take minutes (large multi-stage graph + Mosaic
kernels, remote-compiled under the axon harness); the persistent cache makes
every subsequent process reuse them.  Called by all CLIs, bench.py and
__graft_entry__.py before the first jit.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/decnet_jax_cache")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def ensure_tpu(retries: int = 5, wait_s: float = 20.0) -> str:
    """Make sure the TPU backend is usable and return its name.

    The axon harness provides the (remote) TPU; it is single-tenant and its
    registration flakes when another process holds the chip ("Backend 'axon'
    is not in the list of known backends" / "No jellyfish device found").
    Retry with backend-cache clearing until the chip frees up.  Raises if no
    TPU backend comes up (so benchmarks never silently run on CPU)."""
    import time
    import jax
    last = None
    for attempt in range(retries):
        try:
            if jax.default_backend() == "tpu":
                return "tpu"
            raise RuntimeError(f"default backend {jax.default_backend()!r}")
        except RuntimeError as e:
            last = e
            try:
                from jax._src import xla_bridge as xb
                xb._clear_backends()
            except Exception:
                pass
            if attempt < retries - 1:
                time.sleep(wait_s)
    raise RuntimeError(f"TPU backend unavailable after {retries} tries: "
                       f"{last}")
