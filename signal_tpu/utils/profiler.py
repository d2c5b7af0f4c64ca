"""Profiling / tracing helpers.

Replaces the reference's observability tools (sys.settrace execution
tracer `scripts/trace_execution.py`, cuda-synchronize timing in
`engine/processor.py:284-302` — maxingan2412/Signal) with TPU-native
equivalents: jax.profiler traces viewable in TensorBoard/Perfetto, and a
block-until-ready step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median wall seconds per call, synchronized on device completion.

    Sync is a host fetch (`jax.device_get`), not `block_until_ready` —
    the latter can return before device work completes on remote-TPU
    transports (see bench.py's checksum-fetch pattern)."""
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree.map(
            lambda x: x.ravel()[0] if hasattr(x, "ravel") else x, out))
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


class StepTimer:
    """Per-epoch time/throughput accounting matching the reference's
    'Time per batch / Speed' log line."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.start = time.time()
        self.batches = 0

    def tick(self, n: int = 1):
        self.batches += n

    def summary(self, batch_size: int):
        elapsed = time.time() - self.start
        per_batch = elapsed / max(self.batches, 1)
        return per_batch, batch_size / per_batch
