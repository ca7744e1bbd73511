"""Optimizers: AdamW with no-decay parameter groups, and Lion.

The reference builds AdamW with weight decay excluded for biases, norms,
and embeddings (training/train_mmada.py:207-232) and vendors a Lion
implementation (training/optimizer.py:20-81). Here both are optax chains;
the no-decay partition is a pytree mask derived from parameter paths.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Union

import jax
import optax

NO_DECAY_KEYS = ("norm", "ln_f", "bias", "wte")


def decay_mask(params: Any, no_decay_keys=NO_DECAY_KEYS) -> Any:
    """True where weight decay applies: 2-D+ weights whose path contains no
    norm/bias/embedding component."""

    def path_str(path) -> str:
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)

    def decide(path, leaf):
        p = path_str(path).lower()
        if any(nd in p for nd in no_decay_keys):
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(decide, params)


def adamw(
    learning_rate: Union[float, Callable],
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    max_grad_norm: Optional[float] = 1.0,
    params_for_mask: Optional[Any] = None,
    mu_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """`mu_dtype`: dtype of the first moment (optax keeps nu in fp32
    internally for `adamw` only when params are fp32; with bf16 params
    both moments default to bf16). For production 8B runs set
    `optimizer.params.mu_dtype: float32` — the v5e-8 budget has room
    (PROJECTION_r03.json: 9.7 GB/dev with bf16 moments; fp32 first
    moments add ~2 GB/dev under fsdp8)."""
    mask = (
        decay_mask(params_for_mask) if params_for_mask is not None
        else (lambda p: decay_mask(p))
    )
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate, b1=beta1, b2=beta2, eps=eps,
            weight_decay=weight_decay, mask=mask, mu_dtype=mu_dtype,
        )
    )
    return optax.chain(*chain)


def lion(
    learning_rate: Union[float, Callable],
    beta1: float = 0.9,
    beta2: float = 0.99,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
    params_for_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    mask = (
        decay_mask(params_for_mask) if params_for_mask is not None
        else (lambda p: decay_mask(p))
    )
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.lion(learning_rate, b1=beta1, b2=beta2,
                   weight_decay=weight_decay, mask=mask)
    )
    return optax.chain(*chain)


def from_config(opt_cfg, lr_schedule, params=None) -> optax.GradientTransformation:
    """Build from the reference yaml shape (configs/*.yaml `optimizer:`)."""
    name = opt_cfg.get("name", "adamw")
    p = opt_cfg.get("params", {})
    common = dict(
        learning_rate=lr_schedule,
        beta1=p.get("beta1", 0.9),
        beta2=p.get("beta2", 0.999),
        weight_decay=p.get("weight_decay", 0.01),
        max_grad_norm=p.get("max_grad_norm", None),
        params_for_mask=params,
    )
    if name == "adamw":
        import jax.numpy as jnp

        mu_dtype = p.get("mu_dtype")
        return adamw(eps=p.get("epsilon", 1e-8),
                     mu_dtype=jnp.dtype(mu_dtype) if mu_dtype else None,
                     **common)
    if name == "lion":
        common["beta2"] = p.get("beta2", 0.99)
        return lion(**common)
    raise ValueError(f"unknown optimizer: {name}")
