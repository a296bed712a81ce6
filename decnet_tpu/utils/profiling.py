"""Tracing / profiling utilities.

The reference's only instrumentation is `torch.cuda.synchronize()` +
wall-clock prints (demo.py:185-199).  Here: named trace annotations that show
up in XProf/TensorBoard, a `jax.profiler.trace` context for full device
traces, and a lightweight synchronised timer for CLI printouts.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """Capture a full device profile viewable in xprof/tensorboard."""
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    """Named scope appearing in device traces (use inside jitted fns)."""
    return jax.named_scope(name)


class Timer:
    """Synchronised wall-clock timing with running stats."""

    def __init__(self):
        self.times: Dict[str, list] = {}

    @contextlib.contextmanager
    def measure(self, name: str, result=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def timed(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.times.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self, skip_first: bool = True) -> Dict[str, float]:
        out = {}
        for k, v in self.times.items():
            vals = v[1:] if skip_first and len(v) > 1 else v
            out[k] = sum(vals) / len(vals)
        return out

    def report(self) -> str:
        return "\n".join(f"{k:32s} {v * 1000:9.2f} ms"
                         for k, v in self.summary().items())
