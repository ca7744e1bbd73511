"""LoRA adapters for the LLaDA backbone.

Equivalent of the reference's PEFT setup for t2m LoRA fine-tuning
(training/train_t2m_lora.py:443-454; configs/t2m_instruct_lora.yaml:53-58:
r=32, alpha=64, adapters on attention/MLP projections, plus fully-trainable
embeddings and head — `modules_to_save=["embed_tokens","lm_head"]`, i.e.
`wte`/`ff_out` here).

Functional formulation: adapters live in their own pytree; `merge` folds
`W + (alpha/r)·A@B` into effective weights for the unchanged forward, and
`trainable_mask` drives optax masking so only adapters (+ opted-in full
modules) receive updates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from mmada_tpu.models.llada import LLaDAConfig

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "attn_out",
                   "ff_proj", "up_proj", "ff_out")


@dataclasses.dataclass(frozen=True)
class LoRAConfig:
    rank: int = 32
    alpha: float = 64.0
    targets: Sequence[str] = DEFAULT_TARGETS
    train_embeddings: bool = True   # modules_to_save analog (wte + head)

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def init_lora(
    key: jax.Array, params: Any, lcfg: LoRAConfig, dtype=jnp.float32
) -> Any:
    """Per-target A (normal 0.02) and B (zeros) with the layer-stacked
    leading axis, so merged deltas start at zero."""
    lora: dict = {"blocks": {}}
    blocks = params["blocks"]
    keys = jax.random.split(key, len(lcfg.targets))
    for k, name in zip(keys, lcfg.targets):
        if name not in blocks:
            continue
        w = blocks[name]            # (L, in, out)
        n, d_in, d_out = w.shape
        lora["blocks"][name] = {
            "a": (jax.random.normal(k, (n, d_in, lcfg.rank), jnp.float32)
                  * 0.02).astype(dtype),
            "b": jnp.zeros((n, lcfg.rank, d_out), dtype),
        }
    return lora


def merge(params: Any, lora: Any, lcfg: LoRAConfig) -> Any:
    """Effective params: W + scale·A@B per adapted block weight."""
    merged_blocks = dict(params["blocks"])
    for name, ab in lora["blocks"].items():
        delta = jnp.einsum(
            "lir,lro->lio", ab["a"].astype(jnp.float32),
            ab["b"].astype(jnp.float32),
        ) * lcfg.scale
        merged_blocks[name] = (
            params["blocks"][name] + delta.astype(params["blocks"][name].dtype)
        )
    out = dict(params)
    out["blocks"] = merged_blocks
    return out


def trainable_params(params: Any, lora: Any, lcfg: LoRAConfig) -> Any:
    """The pytree that actually trains: adapters (+ embeddings/head when
    configured)."""
    out = {"lora": lora}
    if lcfg.train_embeddings:
        out["wte"] = params["wte"]
        if "ff_out" in params:
            out["head"] = params["ff_out"]
    return out


def apply_trainable(params: Any, trainable: Any, lcfg: LoRAConfig) -> Any:
    """Rebuild full effective params from (frozen base, trainable subset)."""
    base = dict(params)
    if "wte" in trainable:
        base["wte"] = trainable["wte"]
    if "head" in trainable:
        base["ff_out"] = trainable["head"]
    return merge(base, trainable["lora"], lcfg)


def param_count(lora: Any) -> int:
    return sum(p.size for p in jax.tree.leaves(lora))
