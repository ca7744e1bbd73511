"""The jit-compiled multi-task train step.

One XLA program per optimizer step, equivalent to the reference's host-side
loop body (training/train_mmada.py:526-735) but with every stage on device:

  corrupt (t2i span masking + lm/mmu Bernoulli masking, training/masking.py)
  → one backbone forward over the `[t2i | lm | mmu]` concat batch
  → three masked-CE losses (training/losses.py)
  → weighted sum → grad → clip → AdamW update → LR schedule.

Gradient accumulation uses `optax.MultiSteps` (the `accelerator.accumulate`
analog, train_mmada.py:616). Distribution is by construction: params carry
FSDP/TP shardings (parallel/sharding.py), the batch carries the data spec,
and GSPMD emits the grad reduce-scatters/all-reduces the reference got from
DeepSpeed ZeRO-2.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.sampling.schedules import cosine_schedule
from mmada_tpu.training import losses as L
from mmada_tpu.training import masking


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, optimizer):
        return cls(
            params=params,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration of one train step (sizes fixed for jit)."""

    batch_size_t2i: int
    batch_size_lm: int
    batch_size_mmu: int
    max_seq_length: int          # text-frame length inside the t2i frame
    t2i_coeff: float = 1.0
    lm_coeff: float = 0.1
    mmu_coeff: float = 1.0
    min_masking_rate: float = 0.0
    noise_type: str = "mask"
    mask_contiguous_region_prob: float = 0.0
    mask_schedule: Callable = cosine_schedule
    lm_loss_mode: str = "llada"
    use_chat_lm: bool = False    # stage-3: lm rows carry prompt masks
    lm_pad_loss: bool = True     # reference keeps EOS padding in the lm
                                 # loss (prompting_utils.py:249-250);
                                 # false = IGNORE pad labels (trainer)
    loss_chunk: int = 0          # >0: position-chunked vocab head (the
                                 # (B,L,134k) logits never materialize)
    log_param_grad_norms: bool = False  # per-weight-kind grad norms
                                        # (train_mmada.py:976-981 analog)
    skip_nonfinite_updates: bool = True  # drop a poison batch's update on
                                         # device (train_t2m.py:219-238
                                         # analog, without the host sync)
    forward_quantize: str = "none"       # "w8a8": STE int8-MXU forward
                                         # matmuls, bf16 master weights
                                         # (ops/quantization.tag_w8a8_ste)


def corrupt_batch(model: MMadaModel, sc: StepConfig, batch: dict, rng: jax.Array):
    """Apply the three corruption laws on device; returns the loss-ready
    tensors. `batch` carries *clean* assembled frames from prompting."""
    k_t2i, k_lm, k_mmu = jax.random.split(rng, 3)
    mask_id = model.vocab.mask_token_id
    parts_ids, parts_labels = [], []
    out: dict[str, Any] = {}

    if sc.batch_size_t2i:
        ids = batch["t2i_input_ids"]
        span = slice(sc.max_seq_length + 1, ids.shape[1] - 1)  # image tokens
        image_tokens = ids[:, span]
        noisy_span, span_labels, mask_prob = masking.mask_image_tokens(
            k_t2i, image_tokens, mask_id,
            mask_schedule=sc.mask_schedule,
            min_masking_rate=sc.min_masking_rate,
            noise_type=sc.noise_type,
            codebook_size=model.vocab.image_codebook_size,
            mask_contiguous_region_prob=sc.mask_contiguous_region_prob,
        )
        noisy = ids.at[:, span].set(noisy_span)
        labels = jnp.full_like(ids, L.IGNORE_ID).at[:, span].set(span_labels)
        parts_ids.append(noisy)
        parts_labels.append(labels)
        out["mask_prob"] = mask_prob
        out["t2i_masks"] = batch.get("t2i_masks")

    if sc.batch_size_lm:
        ids = batch["lm_input_ids"]
        if sc.use_chat_lm:
            noisy, p_mask, ans_len = masking.mask_answer_tokens(
                k_lm, ids, batch["lm_prompt_masks"], mask_id
            )
            out["answer_lengths_lm"] = ans_len
        else:
            noisy, p_mask = masking.mask_text_tokens(k_lm, ids, mask_id)
        parts_ids.append(noisy)
        parts_labels.append(batch["lm_labels"])
        out["p_mask_lm"] = p_mask

    if sc.batch_size_mmu:
        ids = batch["mmu_input_ids"]
        noisy, p_mask, ans_len = masking.mask_answer_tokens(
            k_mmu, ids, batch["mmu_prompt_masks"], mask_id
        )
        parts_ids.append(noisy)
        parts_labels.append(batch["mmu_labels"])
        out["p_mask_mmu"] = p_mask
        out["answer_lengths"] = ans_len

    out["input_ids"] = jnp.concatenate(parts_ids, axis=0)
    out["labels"] = jnp.concatenate(parts_labels, axis=0)
    return out


def make_train_step(
    model_template: MMadaModel,
    optimizer: optax.GradientTransformation,
    sc: StepConfig,
):
    """Returns `train_step(state, batch, rng) -> (state, metrics)`,
    ready for jax.jit with sharded state/batch."""

    # strip params from the closure: the template otherwise pins the
    # step-0 parameter arrays for the whole run (and closure weights are
    # catastrophic with this environment's remote compiler)
    model_template = dataclasses.replace(model_template, params=None)

    def loss_fn(params, batch, rng):
        if sc.forward_quantize == "w8a8":
            # STE forward quantization (ops/quantization.tag_w8a8_ste):
            # block matmuls run on the int8 MXU, gradients flow to the
            # bf16 master weights — retagging inside the jitted step is
            # free (pytree relabeling, no copies)
            from mmada_tpu.ops.quantization import tag_w8a8_ste

            params = tag_w8a8_ste(params)
        model = dataclasses.replace(model_template, params=params)
        prepared = corrupt_batch(model, sc, batch, rng)
        _, loss_t2i, loss_lm, loss_mmu = L.forward_process(
            model,
            prepared["input_ids"],
            prepared["labels"],
            batch_size_t2i=sc.batch_size_t2i,
            batch_size_lm=sc.batch_size_lm,
            batch_size_mmu=sc.batch_size_mmu,
            max_seq_length=sc.max_seq_length,
            p_mask_lm=prepared.get("p_mask_lm"),
            p_mask_mmu=prepared.get("p_mask_mmu"),
            answer_lengths=prepared.get("answer_lengths"),
            t2i_masks=prepared.get("t2i_masks"),
            answer_lengths_lm=prepared.get("answer_lengths_lm"),
            lm_loss_mode=sc.lm_loss_mode,
            loss_chunk=sc.loss_chunk,
        )
        loss = (
            sc.t2i_coeff * loss_t2i
            + sc.lm_coeff * loss_lm
            + sc.mmu_coeff * loss_mmu
        )
        aux = {
            "loss_t2i": loss_t2i,
            "loss_lm": loss_lm,
            "loss_mmu": loss_mmu,
            "mask_prob": prepared.get(
                "mask_prob", jnp.zeros((max(sc.batch_size_t2i, 1),))
            ).mean(),
        }
        return loss, aux

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        if sc.skip_nonfinite_updates:
            # reference skips NaN-loss batches with a host-side check
            # (train_t2m.py:219-238); here the skip is ON DEVICE — keep the
            # old params/opt_state when loss or grads go non-finite, so a
            # poison batch cannot corrupt training and no step syncs to host
            ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), params, state.params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                opt_state, state.opt_state,
            )
            aux = dict(aux, skipped_nonfinite=(~ok).astype(jnp.float32))
            # a skipped batch does not count: the reference's host-side
            # `continue` (train_t2m.py:219-238) leaves the step counter
            # untouched, so step-indexed hooks (save_every/eval_every) and
            # the LR schedule stay aligned with batches actually applied
            step = state.step + ok.astype(state.step.dtype)
        else:
            step = state.step + 1
        metrics = dict(aux, loss=loss, grad_norm=grad_norm)
        if sc.log_param_grad_norms:
            metrics.update(per_kind_grad_norms(grads))
        return (
            TrainState(params=params, opt_state=opt_state, step=step),
            metrics,
        )

    return train_step


def per_kind_grad_norms(grads: Any) -> dict[str, jax.Array]:
    """`grad_norm/<name>` per weight kind (the layer-stacked pytree gives one
    entry per kind instead of the reference's per-layer flood,
    train_mmada.py:976-981)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        out[f"grad_norm/{name}"] = jnp.sqrt(jnp.sum(jnp.square(leaf)))
    return out


def with_grad_accumulation(
    optimizer: optax.GradientTransformation, every_k: int
) -> optax.GradientTransformation:
    if every_k <= 1:
        return optimizer
    return optax.MultiSteps(optimizer, every_k_schedule=every_k)
