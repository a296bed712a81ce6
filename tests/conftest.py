"""Test harness config: run on a virtual 8-device CPU mesh by default.

Set DECNET_TEST_TPU=1 to run the suite on the real TPU backend instead
(used for kernel-parity and benchmark tests).
"""
import os

if not os.environ.get("DECNET_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The axon TPU harness routes compiles to a remote pool; that stalls
    # CPU-only test processes by ~60-100s at first compile. Drop it.
    for _v in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS"):
        os.environ.pop(_v, None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compile cache: repeat test runs skip XLA compilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/decnet_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

if not os.environ.get("DECNET_TEST_TPU"):
    # The TPU harness's import hook rewrites jax_platforms to "axon,cpu"
    # even when JAX_PLATFORMS=cpu is exported; override it back after import
    # (before any backend is initialised).
    import jax
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
