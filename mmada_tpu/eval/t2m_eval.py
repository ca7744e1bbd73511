"""End-to-end text-to-motion evaluation driver.

Equivalent of `evaluation_mmada_t2m` (utils/eval_trans.py:617+): for each
eval batch, build t2m frames, run the MaskGIT motion sampler, decode VQ
codes to motion features, embed ground-truth and generated motions with the
T2M evaluators, and aggregate FID / diversity / R-precision / matching.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mmada_tpu.eval import t2m_metrics as M
from mmada_tpu.eval.t2m_evaluator import EvaluatorWrapper
from mmada_tpu.models import motion_vq
from mmada_tpu.models.mmada import MMadaModel

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class T2MEvalConfig:
    num_motion_tokens: int = 49
    timesteps: int = 18
    temperature: float = 1.0
    unit_length: int = 4
    top_k: int = 3
    diversity_times: int = 300


def build_t2m_frames(prompting, captions, num_motion_tokens, mask_id):
    motion = np.full((len(captions), num_motion_tokens), mask_id, np.int64)
    ids, masks, _ = prompting(
        (list(captions), motion, motion), "t2m", dropout=False
    )
    return ids, masks


def evaluate_mmada_t2m(
    model: MMadaModel,
    motion_vq_params,
    motion_vq_cfg: motion_vq.MotionVQConfig,
    evaluator: EvaluatorWrapper,
    prompting,
    eval_batches: Iterable[dict],
    cfg: T2MEvalConfig = T2MEvalConfig(),
    denormalize=None,
    key: Optional[jax.Array] = None,
    max_batches: Optional[int] = None,
) -> dict:
    """eval_batches: dicts from data/motion.py MotionEvalDataset collation
    with keys word_embs, pos_onehot, cap_lens, captions, motion, m_lens."""
    key = key or jax.random.key(0)
    text_embs, gt_embs, gen_embs = [], [], []

    for i, batch in enumerate(eval_batches):
        if max_batches is not None and i >= max_batches:
            break
        captions = batch["captions"]
        frames, attn = build_t2m_frames(
            prompting, captions, cfg.num_motion_tokens,
            model.vocab.mask_token_id,
        )
        key, sub = jax.random.split(key)
        codes = model.t2m_generate(
            jnp.asarray(frames), attention_mask=jnp.asarray(attn),
            temperature=cfg.temperature, timesteps=cfg.timesteps,
            num_motion_tokens=cfg.num_motion_tokens, key=sub,
        )
        codes = jnp.clip(codes, 0, model.vocab.motion_codebook_size - 1)
        gen_motion = motion_vq.decode(motion_vq_params, motion_vq_cfg, codes)
        gen_motion = np.asarray(gen_motion)
        if denormalize is not None:
            gen_motion = denormalize(gen_motion)

        # pad/trim generated motion to the evaluator's max length; lengths
        # must reflect the POST-trim frame count
        T = batch["motion"].shape[1]
        gen_frames = min(gen_motion.shape[1], T)
        if gen_motion.shape[1] < T:
            gen_motion = np.pad(
                gen_motion,
                ((0, 0), (0, T - gen_motion.shape[1]), (0, 0)),
            )
        else:
            gen_motion = gen_motion[:, :T]
        gen_lens = np.full((len(captions),), gen_frames, np.int32)

        text_emb, gt_emb = evaluator.get_co_embeddings(
            jnp.asarray(batch["word_embs"]), jnp.asarray(batch["pos_onehot"]),
            jnp.asarray(batch["cap_lens"]), jnp.asarray(batch["motion"]),
            jnp.asarray(batch["m_lens"]),
        )
        gen_emb = evaluator.get_motion_embeddings(
            jnp.asarray(gen_motion), jnp.asarray(gen_lens)
        )
        text_embs.append(np.asarray(text_emb))
        gt_embs.append(np.asarray(gt_emb))
        gen_embs.append(np.asarray(gen_emb))

    text_embs = np.concatenate(text_embs)
    gt_embs = np.concatenate(gt_embs)
    gen_embs = np.concatenate(gen_embs)
    results = M.evaluate_embeddings(
        text_embs, gt_embs, gen_embs,
        top_k=cfg.top_k,
        diversity_times=min(cfg.diversity_times, len(gen_embs) - 1),
    )
    logger.info("t2m eval: %s", results)
    return results


def evaluate_motion_vq(
    vq_params,
    vq_cfg: motion_vq.MotionVQConfig,
    evaluator: EvaluatorWrapper,
    eval_batches: Iterable[dict],
    denormalize=None,
    joints_num: Optional[int] = 22,
    top_k: int = 3,
    diversity_times: int = 300,
    max_batches: Optional[int] = None,
) -> dict:
    """Motion-VQ reconstruction quality — `evaluation_vqvae` analog
    (utils/eval_trans.py:437+): encode→decode every eval motion through the
    VQ, embed ground truth and reconstruction with the T2M evaluators, and
    report FID / diversity / R-precision / matching on the RECONSTRUCTIONS,
    plus MPJPE over recovered joints. Embeddings consume the evaluator's
    normalized feature space; MPJPE uses `denormalize`d features when a
    denormalizer is given (joint recovery is scale-sensitive). Pass
    `joints_num=None` to skip MPJPE (non-HumanML3D feature widths)."""
    from mmada_tpu.eval.motion_math import recover_from_ric

    text_embs, gt_embs, rec_embs = [], [], []
    mpjpe_sum, mpjpe_n = 0.0, 0

    for i, batch in enumerate(eval_batches):
        if max_batches is not None and i >= max_batches:
            break
        motion = jnp.asarray(batch["motion"], jnp.float32)
        codes = motion_vq.encode(vq_params, vq_cfg, motion)
        recon = motion_vq.decode(vq_params, vq_cfg, codes)
        # decode upsamples by the VQ stride; clip back to the source length
        recon = recon[:, : motion.shape[1]]

        text_emb, gt_emb = evaluator.get_co_embeddings(
            jnp.asarray(batch["word_embs"]), jnp.asarray(batch["pos_onehot"]),
            jnp.asarray(batch["cap_lens"]), motion,
            jnp.asarray(batch["m_lens"]),
        )
        rec_emb = evaluator.get_motion_embeddings(
            recon, jnp.asarray(batch["m_lens"])
        )
        text_embs.append(np.asarray(text_emb))
        gt_embs.append(np.asarray(gt_emb))
        rec_embs.append(np.asarray(rec_emb))

        if joints_num is None:
            continue
        gt_np, rec_np = np.asarray(motion), np.asarray(recon)
        if denormalize is not None:
            gt_np, rec_np = denormalize(gt_np), denormalize(rec_np)
        for row, (g, r) in enumerate(zip(gt_np, rec_np)):
            t = int(batch["m_lens"][row])
            jg = np.asarray(recover_from_ric(g[:t], joints_num))
            jr = np.asarray(recover_from_ric(r[:t], joints_num))
            mpjpe_sum += float(
                np.linalg.norm(jg - jr, axis=-1).mean()
            )
            mpjpe_n += 1

    text_embs = np.concatenate(text_embs)
    gt_embs = np.concatenate(gt_embs)
    rec_embs = np.concatenate(rec_embs)
    results = M.evaluate_embeddings(
        text_embs, gt_embs, rec_embs,
        top_k=top_k,
        diversity_times=min(diversity_times, len(rec_embs) - 1),
    )
    if joints_num is not None:
        results["mpjpe"] = mpjpe_sum / max(mpjpe_n, 1)
    logger.info("motion-VQ eval: %s", results)
    return results


def collate_eval_items(items: list[dict]) -> dict:
    return {
        "word_embs": np.stack([i["word_embs"] for i in items]),
        "pos_onehot": np.stack([i["pos_onehot"] for i in items]),
        "cap_lens": np.asarray([i["cap_len"] for i in items]),
        "captions": [i["caption"] for i in items],
        "motion": np.stack([i["motion"] for i in items]),
        "m_lens": np.asarray([i["m_len"] for i in items]),
    }
