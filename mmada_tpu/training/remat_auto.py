"""`training.gradient_checkpointing: auto` — measured policy selection.

`dots` (save matmul outputs, recompute only elementwise + the
flash-attention forward) is +8–12% train throughput over `full`
(BASELINE.md round-3d) but costs ~7x the activation memory; which one
fits is a function of depth × batch × seq × HBM that users shouldn't
have to solve by OOM-bisection. `auto` asks the compiler instead: AOT-
compile the step under `dots`, read XLA's buffer assignment
(`compiled.memory_analysis()`, the same instrument as
tools/project_v5e8.py), and keep `dots` iff its logical peak fits the
device budget with headroom — else compile `full`. The compile used for
the decision is the compile the run would have paid anyway (jit cache
shares the executable), so the only waste is one extra compile in the
fallback case.
"""

from __future__ import annotations

import logging
import os
from typing import Callable

import jax

logger = logging.getLogger(__name__)

# fraction of the device budget the dots step may claim: leaves room for
# the framework's own buffers (prefetch, metrics, EMA shadow) and for
# fragmentation XLA's logical number can't see
_HEADROOM = 0.92


def device_memory_budget() -> int:
    """Per-device accelerator memory in bytes. `memory_stats()` when the
    backend reports it; 16 GB (v5e) when it doesn't (e.g. the tunneled
    chip); CPU test runs override via MMADA_REMAT_AUTO_BUDGET_GB."""
    env = os.environ.get("MMADA_REMAT_AUTO_BUDGET_GB")
    if env:
        return int(float(env) * 1e9)
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
        if stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:  # backend without memory_stats (axon tunnel, CPU)
        pass
    return int(16e9)


def logical_peak_bytes(compiled) -> int:
    """Logical per-device peak from the buffer assignment; donated inputs
    alias their outputs, so alias_size is subtracted once
    (tools/project_v5e8.py:90-94 convention)."""
    ma = compiled.memory_analysis()
    return int(
        ma.argument_size_in_bytes + ma.output_size_in_bytes
        + ma.temp_size_in_bytes - ma.alias_size_in_bytes
    )


def pick_remat(
    make_step: Callable[[str], Callable],
    *example_args,
    budget_bytes: int | None = None,
):
    """`make_step(mode)` -> jitted step fn for remat mode 'dots'/'full'.

    Returns `(mode, step_fn, info)`; `step_fn` is the jitted fn whose
    executable for `example_args` is already compiled.
    """
    budget = budget_bytes or device_memory_budget()
    dots_fn = make_step("dots")
    try:
        compiled = dots_fn.lower(*example_args).compile()
        peak = logical_peak_bytes(compiled)
    except Exception as e:  # resource errors surface at compile on TPU
        logger.info("auto remat: dots compile failed (%s) -> full", e)
        full_fn = make_step("full")
        full_fn.lower(*example_args).compile()
        return "full", full_fn, {"reason": f"dots compile failed: {e}"}

    info = {
        "dots_peak_gb": round(peak / 1e9, 3),
        "budget_gb": round(budget / 1e9, 3),
        "headroom": _HEADROOM,
    }
    if peak <= _HEADROOM * budget:
        logger.info(
            "auto remat -> dots (peak %.2f GB <= %.0f%% of %.2f GB)",
            peak / 1e9, _HEADROOM * 100, budget / 1e9,
        )
        return "dots", dots_fn, dict(info, reason="fits")
    logger.info(
        "auto remat -> full (dots peak %.2f GB > %.0f%% of %.2f GB)",
        peak / 1e9, _HEADROOM * 100, budget / 1e9,
    )
    full_fn = make_step("full")
    full_fn.lower(*example_args).compile()
    return "full", full_fn, dict(info, reason="dots exceeds budget")
