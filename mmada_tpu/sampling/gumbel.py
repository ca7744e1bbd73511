"""Sampling primitives: Gumbel-max, confidence remasking, top-k/top-p.

The reference samples with float64 Gumbel noise in the form
``exp(logits) / (-log u)^T`` (generate.py:8-19, citing arXiv:2409.02908).
TPU has no f64; we use the mathematically identical log-space form
``logits + T * g`` with ``g = -log(-log u)`` in fp32 (the reference's own
app.py:19-39 uses this stabler formulation). At T=0 both reduce to argmax,
which is the parity-tested path; at T>0 the sampled distribution is
identical, only the RNG stream differs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)
_EPS = 1e-20


def gumbel_noise(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    u = jax.random.uniform(key, shape, dtype=dtype, minval=_EPS, maxval=1.0)
    return -jnp.log(-jnp.log(u) + _EPS)


def gumbel_argmax(
    logits: jax.Array, key: Optional[jax.Array], temperature: float
) -> jax.Array:
    """argmax(logits + T * Gumbel): exact argmax at T=0."""
    logits = logits.astype(jnp.float32)
    if temperature == 0.0 or key is None:
        return jnp.argmax(logits, axis=-1)
    noise = gumbel_noise(key, logits.shape)
    return jnp.argmax(logits + temperature * noise, axis=-1)


def confidence_of(logits: jax.Array, token_ids: jax.Array) -> jax.Array:
    """softmax probability of each chosen token (fp32), the 'low_confidence'
    remasking score (generate.py:94-96).

    Computed as exp(l_sel − logsumexp(l)) — identical to softmax+gather but
    without materializing the (B, L, V) probability tensor, which at the
    134k fused vocab blows the TPU's 16 MB scoped VMEM in the fused softmax
    (observed XLA 'out of memory in memory space vmem' at compile)."""
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    sel = jnp.take_along_axis(logits, token_ids[..., None], axis=-1)[..., 0]
    return jnp.exp(sel - lse)


def ranks_desc(values: jax.Array) -> jax.Array:
    """Per-row 0-based rank in descending order (rank 0 = largest).

    Stable: ties resolve to the lower index first, matching torch.topk's
    practical behavior in the reference's per-row top-k transfer loop
    (generate.py:108-110)."""
    order = jnp.argsort(-values, axis=-1, stable=True)
    ranks = jnp.zeros_like(order)
    put = jnp.broadcast_to(
        jnp.arange(values.shape[-1]), values.shape
    ).astype(order.dtype)
    return jnp.put_along_axis(ranks, order, put, axis=-1, inplace=False)


def select_top_k_dynamic(values: jax.Array, k: jax.Array) -> jax.Array:
    """Boolean mask of the per-row top-k entries where k is a traced
    per-row count — the vectorized, on-device replacement for the
    reference's host-side per-row `torch.topk` loop (generate.py:108-110)."""
    return ranks_desc(values) < k[:, None]


def mask_by_random_topk(
    mask_len: jax.Array,        # (B, 1) int — how many stay masked
    probs: jax.Array,           # (B, N) confidence of chosen tokens
    temperature: jax.Array,     # scalar
    key: Optional[jax.Array],
) -> jax.Array:
    """Gumbel-perturbed low-confidence remasking (models/sampling.py:31-36):
    the `mask_len` lowest-confidence positions go back to [MASK]."""
    conf = jnp.log(jnp.clip(probs.astype(jnp.float32), _EPS, None))
    if key is not None:
        conf = conf + temperature * gumbel_noise(key, probs.shape)
    sorted_conf = jnp.sort(conf, axis=-1)
    cutoff = jnp.take_along_axis(sorted_conf, mask_len.astype(jnp.int32), axis=-1)
    return conf < cutoff


def top_k_top_p_filtering(
    logits: jax.Array,
    top_k: int = 0,
    top_p: float = 1.0,
    filter_value: float = NEG_INF,
    min_tokens_to_keep: int = 1,
) -> jax.Array:
    """Top-k / nucleus filtering (models/sampling.py:80-118)."""
    v = logits.shape[-1]
    if top_k > 0:
        top_k = min(max(top_k, min_tokens_to_keep), v)
        kth = jnp.sort(logits, axis=-1)[..., v - top_k][..., None]
        logits = jnp.where(logits < kth, filter_value, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = cum > top_p
        if min_tokens_to_keep > 1:
            remove = remove.at[..., :min_tokens_to_keep].set(False)
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        # kth kept value per row = smallest surviving sorted logit
        kept = jnp.where(remove, jnp.inf, sorted_logits)
        threshold = jnp.min(kept, axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, filter_value, logits)
    return logits
