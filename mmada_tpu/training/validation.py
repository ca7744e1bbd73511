"""In-training validation hooks: the de-facto integration tests.

Equivalents of the reference's wandb-logged generation hooks
(SURVEY.md §4): `generate_images` (train_mmada.py:798-868),
`visualize_predictions` (:750-795), `understanding_images` (:872-932),
`generate_chat_text` (stage3:976-1046). Outputs go to
`{output_dir}/validation/step_{N}/` as PNG/JSONL (wandb is unavailable
here; the artifacts are the same).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from mmada_tpu.models import magvit2
from mmada_tpu.models.mmada import MMadaModel

logger = logging.getLogger(__name__)


def _out_dir(base: str, step: int) -> str:
    path = os.path.join(base, "validation", f"step_{step}")
    os.makedirs(path, exist_ok=True)
    return path


def _save_image(path: str, pixels: np.ndarray):
    from PIL import Image

    arr = np.clip((pixels + 1.0) * 127.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def generate_images(
    model: MMadaModel,
    vq_params, vq_cfg,
    prompting,
    prompts: Sequence[str],
    output_dir: str,
    step: int,
    num_vq_tokens: int = 1024,
    timesteps: int = 12,
    guidance_scale: float = 1.5,
    key: Optional[jax.Array] = None,
):
    """t2i from validation prompts (validation_prompts/*.txt)."""
    mask_id = model.vocab.mask_token_id
    image_ids = np.full((len(prompts), num_vq_tokens), mask_id, np.int64)
    ids, attn = prompting((list(prompts), image_ids), "t2i_gen")
    uncond_ids, uncond_attn = prompting.t2i_gen_uncond(
        len(prompts), num_vq_tokens, mask_id
    )
    codes = model.t2i_generate(
        jnp.asarray(ids), uncond_input_ids=jnp.asarray(uncond_ids),
        attention_mask=jnp.asarray(attn),
        uncond_attention_mask=jnp.asarray(uncond_attn),
        timesteps=timesteps, guidance_scale=guidance_scale,
        num_vq_tokens=num_vq_tokens, key=key or jax.random.key(0),
    )
    pixels = np.asarray(magvit2.decode_code(vq_params, vq_cfg, codes))
    out = _out_dir(output_dir, step)
    for i, prompt in enumerate(prompts):
        _save_image(os.path.join(out, f"t2i_{i:03d}.png"), pixels[i])
    with open(os.path.join(out, "t2i_prompts.jsonl"), "w") as f:
        for i, p in enumerate(prompts):
            f.write(json.dumps({"index": i, "prompt": p}) + "\n")
    return pixels


def visualize_predictions(
    model: MMadaModel,
    vq_params, vq_cfg,
    prompting,
    images: np.ndarray,            # (B, H, W, C) pixels in [-1, 1]
    captions: Sequence[str],
    output_dir: str,
    step: int,
    mask_schedule=None,
    key: Optional[jax.Array] = None,
):
    """Original vs VQ reconstruction vs model prediction triplets
    (train_mmada.py:750-795)."""
    from mmada_tpu.sampling.schedules import cosine_schedule
    from mmada_tpu.training import masking

    key = key or jax.random.key(0)
    vocab = model.vocab
    codes = magvit2.get_code(vq_params, vq_cfg, jnp.asarray(images))
    recon = np.asarray(magvit2.decode_code(vq_params, vq_cfg, codes))

    fused = np.asarray(codes) + vocab.image_offset
    ids, attn, _ = prompting((list(captions), fused, fused), "t2i", dropout=False)
    span = slice(prompting.max_text_len + 1, ids.shape[1] - 1)
    noisy_span, _, mask_prob = masking.mask_image_tokens(
        key, jnp.asarray(ids[:, span]), vocab.mask_token_id,
        mask_schedule=mask_schedule or cosine_schedule,
    )
    noisy = jnp.asarray(ids).at[:, span].set(noisy_span)

    logits = model.forward(noisy, logit_window=vocab.image_window)
    pred = jnp.argmax(logits[:, span], axis=-1)
    # keep unmasked positions from the original grid
    unmasked = noisy_span != vocab.mask_token_id
    pred = jnp.where(unmasked, noisy_span - vocab.image_offset, pred)
    pred_pixels = np.asarray(magvit2.decode_code(vq_params, vq_cfg, pred))

    out = _out_dir(output_dir, step)
    for i in range(images.shape[0]):
        _save_image(os.path.join(out, f"pred_{i:03d}_original.png"), images[i])
        _save_image(os.path.join(out, f"pred_{i:03d}_recon.png"), recon[i])
        _save_image(os.path.join(out, f"pred_{i:03d}_model.png"), pred_pixels[i])
    return recon, pred_pixels


def understanding_images(
    model: MMadaModel,
    vq_params, vq_cfg,
    prompting,
    tokenizer,
    images: np.ndarray,
    question: str,
    output_dir: str,
    step: int,
    max_new_tokens: int = 64,
    steps: int = 32,
    key: Optional[jax.Array] = None,
):
    """Caption/answer for validation images (train_mmada.py:872-932).

    `question` is one string for all images, or one per image (the
    reference's prompts_with_vqa.json pairs each validation image with its
    own task-typed question)."""
    vocab = model.vocab
    sp = prompting.sp
    codes = np.asarray(magvit2.get_code(vq_params, vq_cfg, jnp.asarray(images)))
    fused = codes + vocab.image_offset
    questions = (
        [question] * images.shape[0]
        if isinstance(question, str) else list(question)
    )
    if len(questions) != images.shape[0]:
        raise ValueError(
            f"{len(questions)} questions for {images.shape[0]} images"
        )
    frames = []
    for i in range(images.shape[0]):
        text_ids = tokenizer([questions[i]])["input_ids"][0]
        frames.append(np.concatenate(
            [[sp.mmu, sp.soi], fused[i], [sp.eoi, sp.bos], text_ids]
        ))
    max_len = max(len(fr) for fr in frames)
    # left-pad to a common length so one batched mmu_generate covers
    # variable-length questions (prompt region stays intact on the right)
    frames = np.stack([
        np.concatenate([np.full(max_len - len(fr), sp.pad), fr])
        for fr in frames
    ]).astype(np.int32)
    out_tokens = model.mmu_generate(
        jnp.asarray(frames), max_new_tokens=max_new_tokens, steps=steps,
        block_length=max_new_tokens, key=key,
    )
    answers = []
    for i in range(images.shape[0]):
        ans = np.asarray(out_tokens[i, frames.shape[1]:])
        ans = ans[ans < vocab.text_vocab_size]
        answers.append(tokenizer.decode(ans.tolist()))
    out = _out_dir(output_dir, step)
    with open(os.path.join(out, "mmu_answers.jsonl"), "w") as f:
        for i, a in enumerate(answers):
            f.write(json.dumps(
                {"index": i, "question": questions[i], "answer": a}
            ) + "\n")
    return answers


def quantative_images(
    model: MMadaModel,
    vq_params, vq_cfg,
    prompting,
    prompts,
    scorer,
    output_dir: str,
    step: int,
    **gen_kwargs,
) -> dict:
    """Stage-4 quality eval (train_mmada_stage4.py:1008-1115): generate from
    the quantative prompt file and score with CLIP/ImageReward via
    eval/image_quality.ImageQualityScorer; degrades to generation-only when
    scoring models are unavailable."""
    pixels = generate_images(
        model, vq_params, vq_cfg, prompting, prompts, output_dir, step,
        **gen_kwargs,
    )
    results = scorer.quantitative_images(pixels, prompts) if scorer else {}
    out = _out_dir(output_dir, step)
    with open(os.path.join(out, "quantative.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def generate_chat_text(
    model: MMadaModel,
    tokenizer,
    questions: Sequence[str],
    output_dir: str,
    step: int,
    gen_length: int = 128,
    steps: int = 64,
    block_length: int = 32,
    key: Optional[jax.Array] = None,
):
    """QA transcript generation (stage3:976-1046)."""
    answers = []
    for q in questions:
        if hasattr(tokenizer, "apply_chat_template"):
            try:
                text = tokenizer.apply_chat_template(
                    [{"role": "user", "content": q}],
                    add_generation_prompt=True, tokenize=False,
                )
            except Exception:
                text = q
        else:
            text = q
        ids = jnp.asarray(tokenizer([text])["input_ids"], jnp.int32)
        out = model.generate(
            ids, gen_length=gen_length, steps=steps, block_length=block_length,
            key=key,
        )
        ans = np.asarray(out[0, ids.shape[1]:])
        ans = ans[ans < model.vocab.text_vocab_size]
        answers.append(tokenizer.decode(ans.tolist()))
    out_dir = _out_dir(output_dir, step)
    with open(os.path.join(out_dir, "chat.jsonl"), "w") as f:
        for q, a in zip(questions, answers):
            f.write(json.dumps({"question": q, "answer": a}) + "\n")
    return answers
