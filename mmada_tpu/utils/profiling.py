"""Profiling and debugging instrumentation.

The reference has no profiler hooks (SURVEY.md §5: wall-clock meters only).
TPU-native we expose:

  * `trace(logdir)` — jax.profiler context capturing an xplane trace
    (viewable in TensorBoard / xprof) around training or serving steps;
  * `annotate(name)` — TraceAnnotation for named regions inside a step;
  * `enable_nan_debugging()` — jax debug_nans/debug_infs gates (the
    reference scrubs NaNs ad hoc, modeling_llada.py:158-166);
  * `step_timer` — lightweight wall-clock timing with device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def step_timer(sync_on=None) -> Iterator[dict]:
    """Times a block; `sync_on` (an array or pytree) is fetched at exit so
    async dispatch doesn't fake the timing (block_until_ready is unreliable
    on the tunneled platform — see bench.py)."""
    out: dict = {}
    t0 = time.perf_counter()
    yield out
    if sync_on is not None:
        jax.tree.map(lambda x: jax.device_get(x), sync_on)
    out["seconds"] = time.perf_counter() - t0


def device_memory_stats() -> dict:
    """Per-device memory stats when the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
