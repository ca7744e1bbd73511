"""Precision policy: bf16 matmuls with fp32 islands.

The reference runs bf16 autocast with fp32 RMSNorm (modeling_llada.py:315-329),
optionally fp32 RoPE (rope_full_precision), and float64 sampling softmax/Gumbel
(generate.py:8-19). TPU has no f64: sampling math runs in f32 — exact at
temperature 0 and statistically validated at T>0 (see tests/test_samplers.py).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32      # storage dtype of weights
    compute_dtype: jnp.dtype = jnp.bfloat16   # matmul/activation dtype
    norm_dtype: jnp.dtype = jnp.float32       # RMSNorm/LayerNorm island
    softmax_dtype: jnp.dtype = jnp.float32    # attention + sampling softmax
    rope_dtype: jnp.dtype = jnp.float32       # rope_full_precision analog
    logits_dtype: jnp.dtype = jnp.float32     # final head output

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)


# Parity/testing: everything fp32 so outputs can be compared elementwise.
FP32 = Policy(
    param_dtype=jnp.float32,
    compute_dtype=jnp.float32,
)

# Production: bf16 weights + compute, fp32 islands (reference bf16 autocast).
BF16 = Policy(
    param_dtype=jnp.bfloat16,
    compute_dtype=jnp.bfloat16,
)


def policy_from_name(name: str) -> Policy:
    return {"fp32": FP32, "float32": FP32, "bf16": BF16, "bfloat16": BF16}[name]
