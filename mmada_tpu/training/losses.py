"""Multi-task masked-diffusion losses: one forward, three weighted CE terms.

Equivalent of `MMadaModelLM.forward_process` (models/modeling_mmada.py:213-276):
the train batch is a static concat `[t2i rows | lm rows | mmu rows]`; one
backbone forward produces logits over the fused vocab, then

  * t2i — mean CE over the image span (positions > max_seq_length) with
    ignore_index −100;
  * lm  — LLaDA estimator: Σ_masked CE/p_mask / (B·L) (the Eq. 8 masked-CE
    Monte-Carlo estimate); with answer lengths (chat SFT):
    Σ_masked CE/(p_mask·answer_len) / B;
  * mmu — Σ_masked CE/(p_mask·answer_len) / B.

Divergence note: the reference stage-3 lm path first collapses the masked
CE to a scalar and *then* divides by answer lengths and re-sums
(modeling_mmada.py:268-271), i.e. `scalar · Σ 1/len / B` — a compounding
normalization bug; and the stage-1/2 call path crashes outright when
`answer_lengths_lm is None` (:267 vs train_mmada.py:617-628). Here
`lm_loss_mode='reference_stage3'` reproduces the former for drop-in parity;
the default 'llada' mode is the correct estimator.

Static segment sizes keep the step jit-friendly (SURVEY.md §7.4.5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

IGNORE_ID = -100


def masked_cross_entropy(
    logits: jax.Array,   # (B, L, V) fp32
    labels: jax.Array,   # (B, L) int, IGNORE_ID to skip
) -> tuple[jax.Array, jax.Array]:
    """Per-position CE and validity mask; ignored positions return 0."""
    valid = labels != IGNORE_ID
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    return jnp.where(valid, ce, 0.0), valid


def t2i_loss(logits, labels, max_seq_length: int) -> jax.Array:
    """Mean CE over the image span (modeling_mmada.py:240-247)."""
    span_logits = logits[:, max_seq_length + 1:]
    span_labels = labels[:, max_seq_length + 1:]
    ce, valid = masked_cross_entropy(span_logits, span_labels)
    denom = jnp.maximum(valid.sum(), 1)
    return ce.sum() / denom


def lm_loss(
    logits, labels, masked_indices, p_mask,
    answer_lengths: Optional[jax.Array] = None,
    mode: str = "llada",
) -> jax.Array:
    b, l = labels.shape
    ce, valid = masked_cross_entropy(logits, labels)
    active = masked_indices & valid
    weighted = jnp.where(active, ce / p_mask, 0.0)
    if answer_lengths is None:
        return weighted.sum() / (b * l)
    if mode == "reference_stage3":
        scalar = weighted.sum() / (b * l)
        inv_len = jnp.where(active, 1.0 / answer_lengths, 0.0)
        return scalar * inv_len.sum() / b
    return jnp.where(active, weighted / answer_lengths, 0.0).sum() / b


def answer_loss(logits, labels, masked_indices, p_mask, answer_lengths) -> jax.Array:
    """mmu loss: Σ CE/(p·len) / B (modeling_mmada.py:273-276)."""
    ce, valid = masked_cross_entropy(logits, labels)
    active = masked_indices & valid
    return jnp.where(
        active, ce / (p_mask * answer_lengths), 0.0
    ).sum() / labels.shape[0]


def chunked_weighted_ce(
    model,
    normed_hidden: jax.Array,   # (B, L, D) post-final-norm
    labels: jax.Array,          # (B, L) int, IGNORE_ID to skip
    weights: jax.Array,         # (T, B, L) fp32 per-task position weights
    chunk_size: int,
) -> jax.Array:
    """Σ_pos weights[t] · CE_pos for each task t, applying the vocab head
    one position-chunk at a time inside a rematerialized scan.

    Every loss in this module is linear in per-position CE, so the whole
    multi-task objective reduces to T weighted sums — which means the
    `(B, L, V)` logits tensor (7 GB fp32 at batch 12 × seq 1090 × the
    fused 134,656 vocab, doubled again by the log_softmax backward) never
    needs to exist. Peak extra memory is one `(B, chunk, V)` tile in each
    direction; the backward recomputes each chunk's logits
    (jax.checkpoint), the same trade the layer scan already makes.
    """
    t = weights.shape[0]
    b, l, d = normed_hidden.shape
    pad = (-l) % chunk_size
    if pad:
        normed_hidden = jnp.pad(normed_hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)),
                         constant_values=IGNORE_ID)
        weights = jnp.pad(weights, ((0, 0), (0, 0), (0, pad)))
    nc = (l + pad) // chunk_size
    hs = normed_hidden.reshape(b, nc, chunk_size, d).transpose(1, 0, 2, 3)
    ls = labels.reshape(b, nc, chunk_size).transpose(1, 0, 2)
    ws = weights.reshape(t, b, nc, chunk_size).transpose(2, 0, 1, 3)

    def body(acc, xs):
        h_c, l_c, w_c = xs

        def f(h_c):
            logits = model.apply_head(h_c)
            ce, _ = masked_cross_entropy(logits, l_c)
            return jnp.einsum("tbc,bc->t", w_c, ce)

        return acc + jax.checkpoint(f)(h_c), None

    sums, _ = jax.lax.scan(body, jnp.zeros((t,), jnp.float32), (hs, ls, ws))
    return sums


def forward_process(
    model,
    input_ids: jax.Array,        # (Bt+Bl+Bm, L) fused tokens, corrupted
    labels: jax.Array,           # same shape, IGNORE_ID outside targets
    batch_size_t2i: int,
    batch_size_lm: int,
    batch_size_mmu: int,
    max_seq_length: int,
    p_mask_lm: Optional[jax.Array] = None,
    p_mask_mmu: Optional[jax.Array] = None,
    answer_lengths: Optional[jax.Array] = None,
    t2i_masks: Optional[jax.Array] = None,
    answer_lengths_lm: Optional[jax.Array] = None,
    lm_loss_mode: str = "llada",
    loss_chunk: int = 0,
):
    """Returns (logits, loss_t2i, loss_lm, loss_mmu). Segment sizes are
    Python ints (static) so slicing stays shape-stable under jit.

    `loss_chunk > 0` switches to the position-chunked head (logits are
    never materialized; the returned logits slot is None) — identical loss
    values, bounded memory at the fused-vocab width."""
    bt, bl, bm = batch_size_t2i, batch_size_lm, batch_size_mmu
    attention_mask = None
    if t2i_masks is not None and bt > 0:
        pad = jnp.ones((bl + bm, input_ids.shape[1]), t2i_masks.dtype)
        attention_mask = jnp.concatenate([t2i_masks, pad], axis=0)

    if loss_chunk:
        return _forward_process_chunked(
            model, input_ids, labels, attention_mask,
            bt, bl, bm, max_seq_length,
            p_mask_lm, p_mask_mmu, answer_lengths,
            answer_lengths_lm, lm_loss_mode, loss_chunk,
        )

    logits = model.forward(input_ids, attention_mask=attention_mask)
    logits = logits.astype(jnp.float32)
    mask_id = model.vocab.mask_token_id
    masked_indices = input_ids == mask_id

    zero = jnp.float32(0.0)
    loss_t2i = (
        t2i_loss(logits[:bt], labels[:bt], max_seq_length) if bt else zero
    )
    loss_lm = (
        lm_loss(
            logits[bt:bt + bl], labels[bt:bt + bl],
            masked_indices[bt:bt + bl], p_mask_lm,
            answer_lengths_lm, mode=lm_loss_mode,
        ) if bl else zero
    )
    loss_mmu = (
        answer_loss(
            logits[bt + bl:], labels[bt + bl:],
            masked_indices[bt + bl:], p_mask_mmu, answer_lengths,
        ) if bm else zero
    )
    return logits, loss_t2i, loss_lm, loss_mmu


def _forward_process_chunked(
    model, input_ids, labels, attention_mask,
    bt, bl, bm, max_seq_length,
    p_mask_lm, p_mask_mmu, answer_lengths,
    answer_lengths_lm, lm_loss_mode, loss_chunk,
):
    """Chunked-head variant of forward_process: build the three tasks'
    per-position weight fields (all logits-independent), then one
    chunked_weighted_ce pass. Weight algebra mirrors t2i_loss / lm_loss /
    answer_loss exactly (verified by tests/test_training.py equivalence)."""
    b, l = input_ids.shape
    valid = labels != IGNORE_ID
    masked = input_ids == model.vocab.mask_token_id
    weights = jnp.zeros((3, b, l), jnp.float32)

    if bt:
        pos_in_span = jnp.arange(l) >= (max_seq_length + 1)
        span_valid = valid[:bt] & pos_in_span[None, :]
        denom = jnp.maximum(span_valid.sum(), 1)
        weights = weights.at[0, :bt].set(span_valid / denom)

    lm_factor = jnp.float32(1.0)
    if bl:
        active = masked[bt:bt + bl] & valid[bt:bt + bl]
        base = jnp.where(active, 1.0 / p_mask_lm, 0.0)
        if answer_lengths_lm is None:
            w1 = base / (bl * l)
        elif lm_loss_mode == "reference_stage3":
            # loss = (Σ ce/p / (B·L)) · (Σ 1/len / B): the second factor is
            # logits-independent — fold it in after the sum
            w1 = base / (bl * l)
            inv_len = jnp.where(active, 1.0 / answer_lengths_lm, 0.0)
            lm_factor = inv_len.sum() / bl
        else:
            w1 = jnp.where(active, base / answer_lengths_lm, 0.0) / bl
        weights = weights.at[1, bt:bt + bl].set(w1)

    if bm:
        active = masked[bt + bl:] & valid[bt + bl:]
        w2 = jnp.where(
            active, 1.0 / (p_mask_mmu * answer_lengths), 0.0
        ) / bm
        weights = weights.at[2, bt + bl:].set(w2)

    hidden = model.forward_hidden(input_ids, attention_mask=attention_mask)
    sums = chunked_weighted_ce(model, hidden, labels, weights, loss_chunk)
    zero = jnp.float32(0.0)
    return (
        None,
        sums[0] if bt else zero,
        sums[1] * lm_factor if bl else zero,
        sums[2] if bm else zero,
    )


def t2m_loss(logits, labels, masked_indices, p_mask, answer_lengths) -> jax.Array:
    """Motion loss mirrors the mmu normalization
    (modelling_ours.py:323-395 forward_process t2m branch)."""
    return answer_loss(logits, labels, masked_indices, p_mask, answer_lengths)


def soft_target_cross_entropy(
    logits: jax.Array,        # (B, L, V)
    targets: jax.Array,       # (B, L) hard ids with IGNORE_ID padding
    soft_targets: jax.Array,  # (B, L-1, C) distributions over first C classes
) -> jax.Array:
    """Soft-label CE skipping the first (class-id) token, averaged over
    non-padded positions (training/utils.py:53-69)."""
    logits = logits[:, 1:, : soft_targets.shape[-1]]
    targets = targets[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.sum(soft_targets * logp, axis=-1)
    pad = targets == IGNORE_ID
    loss = jnp.where(pad, 0.0, loss)
    denom = jnp.maximum((~pad).sum(), 1)
    return loss.sum() / denom


def get_loss_weight(t: jax.Array, mask: jax.Array, min_val: float = 0.3) -> jax.Array:
    """Per-position loss weights for predict-all-tokens / random-replace
    training: unmasked positions decay toward `min_val` as noise decreases
    (training/utils.py:72-73)."""
    return 1.0 - (1.0 - mask) * ((1.0 - t) * (1.0 - min_val))[:, None]


def weighted_t2i_loss(
    logits, labels, max_seq_length: int, loss_weight: jax.Array
) -> jax.Array:
    """predict-all-tokens variant: weighted mean CE over the image span."""
    span_logits = logits[:, max_seq_length + 1:]
    span_labels = labels[:, max_seq_length + 1:]
    ce, valid = masked_cross_entropy(span_logits, span_labels)
    w = loss_weight.astype(jnp.float32)
    num = (ce * w * valid).sum()
    denom = jnp.maximum((w * valid).sum(), 1e-6)
    return num / denom


def forward_process_with_r2i(
    model,
    input_ids: jax.Array,        # [t2i | lm | mmu | r2i] concat
    labels: jax.Array,
    batch_size_t2i: int,
    batch_size_lm: int,
    batch_size_mmu: int,
    batch_size_r2i: int,
    max_seq_length: int,
    p_mask_lm=None,
    p_mask_mmu=None,
    p_mask_r2i=None,
    answer_lengths=None,
    answer_lengths_lm=None,
    answer_lengths_r2i=None,
    t2i_masks=None,
    lm_loss_mode: str = "llada",
):
    """Stage-4 variant adding the r2i (reasoning-to-image) segment with the
    same Σ CE/(p·len)/B normalization as mmu
    (modeling_mmada.py:278-359 forward_process_with_r2i)."""
    bt, bl, bm, br = batch_size_t2i, batch_size_lm, batch_size_mmu, batch_size_r2i
    # run t2i+lm through forward_process (mmu segment disabled there since
    # its tail-slice convention would swallow the r2i rows)
    logits, loss_t2i, loss_lm, _ = forward_process(
        model, input_ids, labels,
        batch_size_t2i=bt, batch_size_lm=bl, batch_size_mmu=0,
        max_seq_length=max_seq_length,
        p_mask_lm=p_mask_lm, t2i_masks=t2i_masks,
        answer_lengths_lm=answer_lengths_lm, lm_loss_mode=lm_loss_mode,
    )
    masked = input_ids == model.vocab.mask_token_id
    start_r2i = bt + bl + bm
    zero = jnp.float32(0.0)
    loss_mmu = (
        answer_loss(
            logits[bt + bl:start_r2i], labels[bt + bl:start_r2i],
            masked[bt + bl:start_r2i], p_mask_mmu, answer_lengths,
        ) if bm else zero
    )
    loss_r2i = (
        answer_loss(
            logits[start_r2i:start_r2i + br],
            labels[start_r2i:start_r2i + br],
            masked[start_r2i:start_r2i + br],
            p_mask_r2i, answer_lengths_r2i,
        ) if br else zero
    )
    return logits, loss_t2i, loss_lm, loss_mmu, loss_r2i
