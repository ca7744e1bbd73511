"""Normalization layers with fp32 compute islands.

Matches reference semantics: RMSNorm computes variance in fp32, casts the
normalized activations back to the input dtype, then applies the affine
weight (models/modeling_llada.py:315-329); Gemma-RMS applies ``x*(1+w)``
(:332-360); plain LayerNorm optionally carries no affine.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(
    x: jax.Array,
    weight: Optional[jax.Array],
    eps: float = 1e-5,
    gemma_style: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(compute_dtype)
    variance = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(variance + eps)
    x = xf.astype(orig_dtype)
    if weight is None:
        return x
    if gemma_style:
        return x * (1.0 + weight).astype(orig_dtype)
    return x * weight.astype(orig_dtype)


def layer_norm(
    x: jax.Array,
    weight: Optional[jax.Array],
    bias: Optional[jax.Array],
    eps: float = 1e-5,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(compute_dtype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    x = xf.astype(orig_dtype)
    if weight is not None:
        x = x * weight.astype(orig_dtype)
    if bias is not None:
        x = x + bias.astype(orig_dtype)
    return x


def group_norm(
    x: jax.Array,  # NHWC
    weight: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
) -> jax.Array:
    """GroupNorm over NHWC tensors (VQGAN `Normalize`,
    models/common_modules.py:21-24 uses groups=32, eps=1e-6)."""
    orig_dtype = x.dtype
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    return (xf * weight + bias).astype(orig_dtype)
