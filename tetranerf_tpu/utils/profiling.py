"""Profiling and timing utilities.

The reference has no tracing/profiling subsystem (SURVEY §5.1 — only
ad-hoc wall clocks in tests). Here:

- :func:`trace` wraps ``jax.profiler`` for TensorBoard-viewable device
  traces.
- :func:`benchmark` measures steady-state per-call time of a jitted
  function the way remote/async dispatch requires: chaining several
  dispatches per host sync (a single dispatch measures pipeline-idle
  latency, not throughput — on tunneled devices the difference is 4x+).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Sequence

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(
    fn: Callable,
    args_list: Sequence[tuple],
    warmup: int = 1,
    repeats: int = 2,
    host_overhead: float = 0.0,
    min_dispatches: int = 16,
) -> float:
    """Steady-state seconds per call of ``fn`` over a set of argument
    tuples, pipelining all dispatches between host syncs.

    ``args_list`` should contain several distinct argument tuples (some
    execution environments memoize identical dispatches). The list is
    cycled up to ``min_dispatches`` per sync: this host pays a measured
    ~35-40 ms round trip PER SYNC (tunneled device), so a 4-deep
    pipeline inflates every per-call figure by ~10 ms — sub-10ms ops
    need ≥16 dispatches per sync to be resolvable at all. For exact
    per-op device times use ``benchmarks/trace_step.py`` (XLA profiler)
    instead of wall clocks.
    """
    reps = max(1, -(-min_dispatches // max(len(args_list), 1)))
    calls = list(args_list) * reps
    for _ in range(warmup):
        outs = [fn(*args) for args in args_list]
        jax.block_until_ready(outs)
        _force(outs[-1])
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(*args) for args in calls]
        _force(outs[-1])
        dt = (time.perf_counter() - t0 - host_overhead) / len(calls)
        best = min(best, dt)
    return best


def _force(out):
    # Fetch ONE element to the host: on tunneled devices
    # ``block_until_ready`` returns before remote execution finishes, and
    # ``np.asarray`` of the whole buffer would time the transfer, not the
    # compute. Indexing makes a scalar that depends on the full result.
    leaf = jax.tree_util.tree_leaves(out)[0]
    flat = leaf.reshape(-1) if getattr(leaf, "ndim", 0) else leaf
    np.asarray(flat[..., 0] if getattr(flat, "ndim", 0) else flat)
