"""Profiling / tracing harness.

The reference's observability is wall-clock meters + the aim tracker
(SURVEY §5; reference train.py:212,268-281). TPU-native additions:

* ``trace(path)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution;
* ``device_timer`` — block-until-ready timing helper for jitted fns, with
  chained mode to amortize host<->device round-trips (essential on tunneled
  dev setups where a single round-trip costs ~25 ms);
* ``annotate`` — named trace spans (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable, Optional

__all__ = ["trace", "annotate", "device_timer"]


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_timer(
    fn: Callable,
    *args,
    iters: int = 20,
    warmup: int = 2,
    chain: Optional[Callable] = None,
    **kwargs,
):
    """Time a device function.

    Without ``chain``: per-call block_until_ready (includes host round-trip).
    With ``chain(prev_out, args) -> args``: sequentially-dependent calls,
    blocking once at the end — measures pure device time.
    Returns (mean_ms, all_samples_or_total).
    """
    import jax

    out = fn(*args, **kwargs)
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)

    if chain is None:
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args, **kwargs))
            samples.append((time.perf_counter() - t0) * 1000.0)
        return sum(samples) / len(samples), samples

    t0 = time.perf_counter()
    for _ in range(iters):
        args = chain(out, args)
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    total = (time.perf_counter() - t0) * 1000.0
    return total / iters, total
