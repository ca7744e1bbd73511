"""Per-masked-ratio-bucket training diagnostics.

Equivalent of the reference's metrics helpers
(models/training_utils.py:299-455): bucket batch rows by their masking
ratio and report per-bucket cross-entropy / prediction entropy / token
counts — the standard instrument for diagnosing which diffusion noise
levels a masked-diffusion model handles poorly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmada_tpu.training.losses import masked_cross_entropy


def mask_ratio_bucket_stats(
    logits: jax.Array,          # (B, L, V)
    labels: jax.Array,          # (B, L) with IGNORE_ID
    masked_indices: jax.Array,  # (B, L) bool
    num_buckets: int = 10,
) -> dict[str, jax.Array]:
    """Returns per-bucket arrays of shape (num_buckets,): mean CE, mean
    prediction entropy, and masked-token counts. Rows are bucketed by their
    masked fraction; empty buckets report 0."""
    b, l = labels.shape
    ce, valid = masked_cross_entropy(logits, labels)
    active = masked_indices & valid

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    entropy = -jnp.sum(jnp.exp(logp) * logp, axis=-1)        # (B, L)

    ratios = masked_indices.mean(axis=1)                     # (B,)
    bucket_of = jnp.clip(
        (ratios * num_buckets).astype(jnp.int32), 0, num_buckets - 1
    )
    onehot = jax.nn.one_hot(bucket_of, num_buckets, dtype=jnp.float32)  # (B, K)

    row_ce = jnp.where(active, ce, 0.0).sum(axis=1)
    row_entropy = jnp.where(active, entropy, 0.0).sum(axis=1)
    row_count = active.sum(axis=1).astype(jnp.float32)

    bucket_count = onehot.T @ row_count
    safe = jnp.maximum(bucket_count, 1.0)
    return {
        "bucket_ce": (onehot.T @ row_ce) / safe,
        "bucket_entropy": (onehot.T @ row_entropy) / safe,
        "bucket_tokens": bucket_count,
    }
