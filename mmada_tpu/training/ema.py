"""Exponential moving average of model weights.

Equivalent of the reference's `EMA` class (models/training_utils.py:61-297):
decay follows `min(max_decay, (1 + step/gamma)^-power)` warmup (inv_gamma /
power schedule), held as an explicit pytree so it composes with jit and
sharding (the reference's is a module wrapper and is not wired into its
trainers; here it is available via StepConfig/Trainer opt-in).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EMAState:
    shadow: Any
    step: jax.Array

    @classmethod
    def create(cls, params: Any) -> "EMAState":
        return cls(
            shadow=jax.tree.map(jnp.asarray, params),
            step=jnp.zeros((), jnp.int32),
        )


def ema_decay(
    step: jax.Array,
    max_decay: float = 0.9999,
    min_decay: float = 0.0,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
) -> jax.Array:
    """Warmup decay schedule (models/training_utils.py:129-142)."""
    value = 1.0 - (1.0 + step / inv_gamma) ** -power
    return jnp.clip(value, min_decay, max_decay)


def ema_update(
    state: EMAState,
    params: Any,
    max_decay: float = 0.9999,
    min_decay: float = 0.0,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
) -> EMAState:
    step = state.step + 1
    decay = ema_decay(step, max_decay, min_decay, inv_gamma, power)

    def blend(shadow, p):
        return (shadow * decay + p.astype(shadow.dtype) * (1.0 - decay)).astype(
            shadow.dtype
        )

    return EMAState(
        shadow=jax.tree.map(blend, state.shadow, params), step=step
    )
