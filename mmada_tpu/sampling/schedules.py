"""Mask-ratio schedules for MaskGIT-style denoising.

Same families as the reference (models/sampling.py:39-78): cosine, linear,
pow<k>, sigmoid. `t` is progress in [0, 1]; the return value is the fraction
of positions that stay masked after the step.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax.numpy as jnp


def cosine_schedule(t):
    return jnp.cos(t * math.pi * 0.5)


def linear_schedule(t):
    return jnp.clip(1.0 - t, 1e-6, 1.0)


def pow_schedule(t, exponent: float):
    return jnp.clip(1.0 - t ** exponent, 1e-6, 1.0)


def sigmoid_schedule(t, start: float = -3.0, end: float = 3.0, tau: float = 1.0,
                     clip_min: float = 1e-6):
    v_start = 1.0 / (1.0 + math.exp(-start / tau))
    v_end = 1.0 / (1.0 + math.exp(-end / tau))
    output = 1.0 / (1.0 + jnp.exp(-((t * (end - start) + start) / tau)))
    output = (v_end - output) / (v_end - v_start)
    return jnp.clip(output, clip_min, 1.0)


def get_mask_schedule(method: str, **kwargs) -> Callable:
    """Factory matching `get_mask_schedule` (models/sampling.py:68-78)."""
    if method == "cosine":
        return cosine_schedule
    if method == "linear":
        return linear_schedule
    if method.startswith("pow"):
        return partial(pow_schedule, exponent=float(method[3:]))
    if method == "sigmoid":
        return partial(sigmoid_schedule, **kwargs)
    raise ValueError(f"unknown schedule method: {method}")
