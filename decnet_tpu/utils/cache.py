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
    # The TPU harness import hook sets jax_platforms to "axon,cpu", but the
    # "axon" platform name flakily fails to register ("not in the list of
    # known backends"); let JAX auto-choose instead.
    try:
        if "axon" in (jax.config.jax_platforms or ""):
            jax.config.update("jax_platforms", None)
    except Exception:
        pass
