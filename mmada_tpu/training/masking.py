"""Forward diffusion (corruption) processes for multi-task training.

JAX ports of the reference's masking laws:

  * image tokens — timestep → mask schedule → per-row mask count, uniform
    random positions (or a contiguous 2-D region), mask or random-replace
    noise (training/utils.py:77-175);
  * text (lm) — per-row uniform t, `p_mask = (1−eps)·t + eps`, iid Bernoulli
    masking (train_mmada.py:478-495);
  * mmu — same Bernoulli law but prompt positions restored and answer
    lengths recorded for loss normalization (train_mmada.py:497-517).

All functions are pure (explicit PRNG keys) and fixed-shape, so they live
inside the jitted train step — the reference does this host-side per batch.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

IGNORE_ID = -100


def mask_image_tokens(
    key: jax.Array,
    image_tokens: jax.Array,        # (B, N) raw VQ or fused ids
    mask_id: int,
    mask_schedule: Callable,
    min_masking_rate: float = 0.0,
    noise_type: str = "mask",       # 'mask' | 'random_replace'
    codebook_size: int = 8192,
    mask_contiguous_region_prob: float = 0.0,
    mask_prob_override: Optional[jax.Array] = None,  # eval: fixed ratios (B,)
):
    """Returns (input_ids, labels, mask_prob). Labels are IGNORE_ID at
    unmasked positions for 'mask' noise; full tokens for 'random_replace'
    (predict-all-tokens mode)."""
    b, n = image_tokens.shape
    k_t, k_perm, k_region, k_choice, k_rand = jax.random.split(key, 5)

    if mask_prob_override is not None:
        mask_prob = mask_prob_override
    else:
        t = jax.random.uniform(k_t, (b,))
        mask_prob = jnp.clip(mask_schedule(t), min_masking_rate, None)

    num_masked = jnp.clip(jnp.round(n * mask_prob), 1, None).astype(jnp.int32)

    # uniform random positions: rank of iid noise < count
    noise = jax.random.uniform(k_perm, (b, n))
    ranks = jnp.argsort(jnp.argsort(noise, axis=-1), axis=-1)
    random_mask = ranks < num_masked[:, None]

    if mask_contiguous_region_prob > 0.0:
        region_mask = _contiguous_region_mask(k_region, num_masked, n)
        use_region = (
            jax.random.uniform(k_choice, ()) < mask_contiguous_region_prob
        )
        mask = jnp.where(use_region, region_mask, random_mask)
    else:
        mask = random_mask

    if noise_type == "mask":
        input_ids = jnp.where(mask, mask_id, image_tokens)
        labels = jnp.where(mask, image_tokens, IGNORE_ID)
    elif noise_type == "random_replace":
        rand_tokens = jax.random.randint(
            k_rand, image_tokens.shape, 0, codebook_size, image_tokens.dtype
        )
        input_ids = jnp.where(mask, rand_tokens, image_tokens)
        labels = image_tokens
    else:
        raise ValueError(f"unknown noise_type: {noise_type}")
    return input_ids, labels, mask_prob


def _contiguous_region_mask(key, num_masked: jax.Array, n: int) -> jax.Array:
    """~num_masked rectangle on the sqrt(n)×sqrt(n) grid
    (training/utils.py:119-144)."""
    res = int(round(n ** 0.5))
    b = num_masked.shape[0]
    k_h, k_y, k_x = jax.random.split(key, 3)
    min_h = jnp.ceil(num_masked / res).astype(jnp.int32)
    max_h = jnp.minimum(res, num_masked)
    u = jax.random.uniform(k_h, (b,))
    height = (min_h + (u * (max_h - min_h + 1)).astype(jnp.int32)).clip(1, res)
    width = jnp.minimum(jnp.ceil(num_masked / height).astype(jnp.int32), res)
    y0 = (jax.random.uniform(k_y, (b,)) * (res - height + 1)).astype(jnp.int32)
    x0 = (jax.random.uniform(k_x, (b,)) * (res - width + 1)).astype(jnp.int32)
    ys = jnp.arange(res)[None, :, None]
    xs = jnp.arange(res)[None, None, :]
    inside = (
        (ys >= y0[:, None, None]) & (ys < (y0 + height)[:, None, None])
        & (xs >= x0[:, None, None]) & (xs < (x0 + width)[:, None, None])
    )
    return inside.reshape(b, res * res)


def eval_image_corruption(
    seed: int,
    image_tokens: jax.Array,
    mask_id: int,
    eval_mask_ratios: Optional[list] = None,
    mask_schedule: Optional[Callable] = None,
):
    """Deterministic eval-time corruption: a fixed seed and optionally fixed
    per-row ratios (the reference saves/restores global RNG state around
    this, training/utils.py:80-98,168-173 — explicit keys make that free)."""
    from mmada_tpu.sampling.schedules import cosine_schedule

    b = image_tokens.shape[0]
    key = jax.random.key(seed)
    override = None
    if eval_mask_ratios:
        idx = jax.random.randint(
            jax.random.fold_in(key, 1), (b,), 0, len(eval_mask_ratios)
        )
        override = jnp.asarray(eval_mask_ratios)[idx]
    return mask_image_tokens(
        key, image_tokens, mask_id,
        mask_schedule=mask_schedule or cosine_schedule,
        mask_prob_override=override,
    )


def enable_full_determinism(seed: int = 0):
    """Best-effort determinism gates (models/training_utils.py:27-45
    analog). TPU/XLA execution is deterministic by default given fixed
    PRNG keys, so on-device this only needs fixed host-side seeds. NOTE:
    XLA flags are only read at backend initialization — this must run
    before the first JAX operation of the process to have any XLA-side
    effect (same constraint as the reference's CUBLAS env vars)."""
    import numpy as np

    np.random.seed(seed)
    import random as _random

    _random.seed(seed)


def mask_text_tokens(
    key: jax.Array,
    input_ids: jax.Array,   # (B, L)
    mask_id: int,
    eps: float = 1e-3,
):
    """LLaDA-style uniform-t corruption: p = (1−eps)·t + eps, iid per token
    (train_mmada.py:478-495). Returns (noisy_ids, p_mask (B, L))."""
    b, l = input_ids.shape
    k_t, k_m = jax.random.split(key)
    t = jax.random.uniform(k_t, (b,))
    p_mask = ((1 - eps) * t + eps)[:, None] * jnp.ones((1, l))
    masked = jax.random.uniform(k_m, (b, l)) < p_mask
    noisy = jnp.where(masked, mask_id, input_ids)
    return noisy, p_mask


def mask_answer_tokens(
    key: jax.Array,
    input_ids: jax.Array,     # (B, L)
    prompt_mask: jax.Array,   # (B, L) 1 = prompt (kept clean)
    mask_id: int,
    eps: float = 1e-3,
):
    """mmu/chat corruption: Bernoulli mask, prompt restored, answer length
    per row (train_mmada.py:497-517). Returns
    (noisy_ids, p_mask, answer_lengths (B, L))."""
    noisy, p_mask = mask_text_tokens(key, input_ids, mask_id, eps)
    noisy = jnp.where(prompt_mask.astype(bool), input_ids, noisy)
    answer_len = jnp.sum(1 - prompt_mask, axis=-1, keepdims=True)
    answer_lengths = jnp.broadcast_to(answer_len, input_ids.shape)
    return noisy, p_mask, answer_lengths
