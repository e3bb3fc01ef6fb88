"""Profiling utilities — jax.profiler traces + per-stage wall clocks.

TPU counterpart of the reference's torch profiler mode
(/root/reference/mvs/mvs_cas/train_whu.py:350-378): wraps warm-up + timed
iterations and writes a trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Optional


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def profile_fn(
    fn: Callable,
    *args,
    warmup: int = 5,
    iters: int = 5,
    trace_dir: Optional[str] = None,
):
    """Warm up, then time `iters` calls (optionally under a device trace).

    Returns (mean_seconds, result). Chains a scalar fetch per call so the
    timing is honest even through async dispatch layers.
    """
    import jax

    result = fn(*args)
    for _ in range(warmup - 1):
        result = fn(*args)
    jax.block_until_ready(result)
    leaf = jax.tree_util.tree_leaves(result)[0]
    _ = float(leaf.reshape(-1)[0])  # force one full sync

    ctx = device_trace(trace_dir) if trace_dir else contextlib.nullcontext()
    with ctx:
        t0 = time.perf_counter()
        for _ in range(iters):
            result = fn(*args)
        leaf = jax.tree_util.tree_leaves(result)[0]
        _ = float(leaf.reshape(-1)[0])
        dt = (time.perf_counter() - t0) / iters
    return dt, result
