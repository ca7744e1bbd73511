"""Text-to-motion training: token mapping, corruption, loss, train step.

Equivalent of the reference t2m trainer core (training/train_t2m.py:538-660
vocabulary offsetting + EOM/PAD mapping + MLM batch; models/modelling_ours.py
:509-555 `forward_t2m` masked-CE loss). LoRA fine-tuning
(train_t2m_lora.py) composes via models/lora.py.

Dataset motion codes use EOM = nb_code and PAD = nb_code + 1
(dataset_TM_train.py:131-137); fused ids append those two rows after the
motion codebook (core/vocab.py `motion_special`), so the whole mapping is
one addition of `motion_offset`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from mmada_tpu.core.vocab import VocabLayout
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.sampling.schedules import cosine_schedule
from mmada_tpu.training import masking
from mmada_tpu.training.losses import IGNORE_ID, masked_cross_entropy
from mmada_tpu.training.train_step import TrainState


def map_motion_tokens(m_tokens: jax.Array, vocab: VocabLayout) -> jax.Array:
    """Dataset code space [0, nb_code+1] -> fused ids (train_t2m.py:546-588).
    Regular codes, EOM and PAD all shift by motion_offset because the fused
    layout reserves nb_code+2 contiguous rows."""
    return m_tokens + vocab.motion_offset


def t2m_loss(
    logits: jax.Array,          # (B, L, motion_window)
    labels: jax.Array,          # (B, L) window-relative ids or IGNORE_ID
    masked_indices: jax.Array,  # (B, L)
) -> jax.Array:
    """Mean CE over masked motion positions (`forward_t2m`,
    modelling_ours.py:541-548)."""
    ce, valid = masked_cross_entropy(logits, labels)
    active = masked_indices & valid
    return jnp.where(active, ce, 0.0).sum() / jnp.maximum(active.sum(), 1)


@dataclasses.dataclass(frozen=True)
class T2MStepConfig:
    batch_size: int
    max_text_len: int            # frame text length (prompting max_text_len+1)
    num_motion_tokens: int
    min_masking_rate: float = 0.0
    mask_schedule: Callable = cosine_schedule
    skip_nonfinite_updates: bool = True  # on-device NaN-batch skip
                                         # (train_t2m.py:219-238 analog)


def make_t2m_train_step(
    model_template: MMadaModel,
    optimizer: optax.GradientTransformation,
    sc: T2MStepConfig,
):
    """train_step(state, batch, rng) for the motion MLM objective.

    batch: {'input_ids': (B, L) t2m frames with CLEAN fused motion tokens,
            'labels': (B, L) fused ids over the motion span, IGNORE elsewhere,
            'attention_mask': (B, L)}.
    The motion span [max_text_len+1, L-1) is corrupted on device with the
    schedule-based masking law; logits are evaluated only over the motion
    vocab window.
    """
    vocab = model_template.vocab
    window = (
        vocab.motion_offset,
        vocab.motion_offset + vocab.motion_codebook_size + vocab.motion_special,
    )

    model_template = dataclasses.replace(model_template, params=None)

    def loss_fn(params, batch, rng):
        model = dataclasses.replace(model_template, params=params)
        ids = batch["input_ids"]
        span = slice(sc.max_text_len + 1, ids.shape[1] - 1)
        motion_tokens = ids[:, span]
        noisy_span, _, mask_prob = masking.mask_image_tokens(
            rng, motion_tokens, vocab.mask_token_id,
            mask_schedule=sc.mask_schedule,
            min_masking_rate=sc.min_masking_rate,
        )
        noisy = ids.at[:, span].set(noisy_span)
        masked = noisy == vocab.mask_token_id

        logits = model.forward(
            noisy, attention_mask=batch.get("attention_mask"),
            logit_window=window,
        ).astype(jnp.float32)

        labels = batch["labels"]
        rel_labels = jnp.where(
            labels == IGNORE_ID, IGNORE_ID, labels - vocab.motion_offset
        )
        loss = t2m_loss(logits, rel_labels, masked)
        return loss, {"loss_t2m": loss, "mask_prob": mask_prob.mean()}

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        if sc.skip_nonfinite_updates:
            ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), params, state.params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                opt_state, state.opt_state,
            )
            aux = dict(aux, skipped_nonfinite=(~ok).astype(jnp.float32))
        metrics = dict(aux, loss=loss, grad_norm=grad_norm)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return train_step


def make_t2m_lora_train_step(
    model_template: MMadaModel,
    optimizer: optax.GradientTransformation,
    sc: T2MStepConfig,
    lora_cfg,
):
    """LoRA fine-tuning variant (train_t2m_lora.py analog): the base model
    is frozen; gradients flow only through the adapter pytree (+embeddings/
    head when configured). train_step(state, batch, rng) where state.params
    is the TRAINABLE subset from models/lora.trainable_params.

    The step signature is train_step(state, batch, rng, base_params): the
    frozen base weights are a RUNTIME argument — closure capture would pin
    them and break remote compilation (see models/mmada.py docstring).
    Falls back to the template's own params when base_params is None (small
    models/tests)."""
    from mmada_tpu.models import lora as lora_mod

    vocab = model_template.vocab
    window = (
        vocab.motion_offset,
        vocab.motion_offset + vocab.motion_codebook_size + vocab.motion_special,
    )
    fallback_base = model_template.params
    model_template = dataclasses.replace(model_template, params=None)

    def loss_fn(trainable, base_params, batch, rng):
        eff = lora_mod.apply_trainable(base_params, trainable, lora_cfg)
        model = dataclasses.replace(model_template, params=eff)
        ids = batch["input_ids"]
        span = slice(sc.max_text_len + 1, ids.shape[1] - 1)
        noisy_span, _, mask_prob = masking.mask_image_tokens(
            rng, ids[:, span], vocab.mask_token_id,
            mask_schedule=sc.mask_schedule,
            min_masking_rate=sc.min_masking_rate,
        )
        noisy = ids.at[:, span].set(noisy_span)
        masked = noisy == vocab.mask_token_id
        logits = model.forward(
            noisy, attention_mask=batch.get("attention_mask"),
            logit_window=window,
        ).astype(jnp.float32)
        rel = jnp.where(
            batch["labels"] == IGNORE_ID, IGNORE_ID,
            batch["labels"] - vocab.motion_offset,
        )
        loss = t2m_loss(logits, rel, masked)
        return loss, {"loss_t2m": loss, "mask_prob": mask_prob.mean()}

    def train_step(state: TrainState, batch: dict, rng: jax.Array,
                   base_params=None):
        if base_params is None:
            base_params = fallback_base
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, base_params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        if sc.skip_nonfinite_updates:
            ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), params, state.params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                opt_state, state.opt_state,
            )
            aux = dict(aux, skipped_nonfinite=(~ok).astype(jnp.float32))
        metrics = dict(aux, loss=loss, grad_norm=grad_norm)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return train_step


def token_range_sanity(generated_vq: jax.Array, vocab: VocabLayout) -> dict:
    """In-loop generation checks: range validity, diversity, mode collapse
    (reference train_t2m.py:677-760)."""
    import numpy as np

    arr = jax.device_get(generated_vq)
    unique = np.unique(arr)
    counts = np.bincount(
        arr.reshape(-1), minlength=vocab.motion_codebook_size
    )
    top_frac = counts.max() / max(arr.size, 1)
    return {
        "in_range": bool(
            (arr >= 0).all() and (arr < vocab.motion_codebook_size).all()
        ),
        "unique_tokens": int(unique.size),
        "mode_collapse_top_token_frac": float(top_frac),
    }
