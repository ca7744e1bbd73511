"""LR schedule factory: constant / linear / cosine(+min scale) /
cosine_with_restarts / polynomial, all with linear warmup.

Same family and semantics as the reference's vendored diffusers-style
factory (models/lr_schedulers.py:31-304), expressed as optax schedules.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp


def get_scheduler(
    name: str,
    learning_rate: float,
    warmup_steps: int = 0,
    total_steps: Optional[int] = None,
    min_lr_scale: float = 0.0,
    num_cycles: float = 0.5,
    power: float = 1.0,
) -> Callable:
    name = name.lower()

    def warmup(step):
        return jnp.minimum(1.0, step / jnp.maximum(1, warmup_steps))

    if name == "constant":
        return lambda step: learning_rate * jnp.where(warmup_steps > 0, warmup(step), 1.0)

    if total_steps is None:
        raise ValueError(f"schedule {name!r} needs total_steps")

    def progress(step):
        return jnp.clip(
            (step - warmup_steps) / jnp.maximum(1, total_steps - warmup_steps),
            0.0, 1.0,
        )

    if name == "linear":
        return lambda step: learning_rate * warmup(step) * (1.0 - progress(step))

    if name == "cosine":
        def fn(step):
            cos = 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress(step)))
            cos = min_lr_scale + (1.0 - min_lr_scale) * cos
            return learning_rate * warmup(step) * cos
        return fn

    if name == "cosine_with_restarts":
        def fn(step):
            p = progress(step)
            cos = 0.5 * (1.0 + jnp.cos(math.pi * ((num_cycles * p) % 1.0) * 2.0))
            return learning_rate * warmup(step) * cos
        return fn

    if name == "polynomial":
        def fn(step):
            return learning_rate * warmup(step) * (1.0 - progress(step)) ** power
        return fn

    raise ValueError(f"unknown lr schedule: {name}")


def from_config(sched_cfg, total_steps: Optional[int] = None) -> Callable:
    """Build from the reference yaml shape (`lr_scheduler:` block)."""
    params = sched_cfg.get("params", {})
    return get_scheduler(
        sched_cfg.get("scheduler", "constant"),
        learning_rate=params.get("learning_rate", 1e-4),
        warmup_steps=params.get("warmup_steps", 0),
        total_steps=params.get("total_steps", total_steps),
        min_lr_scale=params.get("min_lr_scale", 0.0),
    )
