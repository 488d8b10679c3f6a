"""Profiling / tracing utilities.

First-class observability (SURVEY §5: the reference has none beyond tqdm
bars): ``jax.profiler`` trace capture around training steps plus a simple
step timer that logs device-time estimates into the metrics stream.

Usage::

    with trace("/tmp/pbx_trace"):
        state, metrics = pretrain_step(...)

    timer = StepTimer()
    with timer:
        state, metrics = pretrain_step(...)
    print(timer.last_ms)
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np

__all__ = ["trace", "StepTimer", "block"]


@contextlib.contextmanager
def trace(log_dir: str, with_memory: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof).

    ``with_memory`` additionally dumps a device-memory profile
    (``memory.prof``, pprof format) into ``log_dir`` when the trace ends.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        if with_memory:
            import os
            jax.profiler.save_device_memory_profile(
                os.path.join(log_dir, "memory.prof"))


def block(tree) -> None:
    """Synchronize on a pytree of device arrays.

    Through the axon tunnel, ``block_until_ready`` alone UNDER-reports
    latency (CLAUDE.md); fetching a scalar value is the only reliable
    sync, so the smallest leaf is materialized in addition to blocking."""
    leaves = [l for l in jax.tree.leaves(tree)
              if hasattr(l, "block_until_ready")]
    for leaf in leaves:
        leaf.block_until_ready()
    if leaves:
        smallest = min(leaves, key=lambda l: getattr(l, "size", 1))
        np.asarray(smallest).ravel()[:1]   # host fetch = true sync


class StepTimer:
    """Wall-clock timer that synchronizes the device on exit."""

    def __init__(self):
        self.last_ms: Optional[float] = None
        self.total_s: float = 0.0
        self.count: int = 0
        self._t0: Optional[float] = None
        self._result = None

    def observe(self, result):
        """Register the step output to synchronize on."""
        self._result = result
        return result

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._result is not None:
            block(self._result)
            self._result = None
        dt = time.perf_counter() - self._t0
        self.last_ms = dt * 1e3
        self.total_s += dt
        self.count += 1
        return False

    @property
    def mean_ms(self) -> float:
        return self.total_s / max(self.count, 1) * 1e3
