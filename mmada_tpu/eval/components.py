"""Config-driven construction of the T2M evaluation stack.

Shared by `eval_t2m.py` (text-to-motion metrics) and `train_motion_vq.py`'s
post-training reconstruction eval (`evaluation_vqvae` analog) — mirrors the
reference's EvaluatorModelWrapper + dataset_TM_eval bring-up
(models/evaluator_wrapper.py:8-90, train_t2m.py:326-333).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def build_word_vectorizer(cfg):
    """GloVe metas when available, hash stand-in otherwise (metrics from the
    stand-in are NOT comparable to published numbers)."""
    from mmada_tpu.eval.word_vectorizer import (
        RandomWordVectorizer,
        WordVectorizer,
    )

    glove_dir = cfg.get_path("eval.glove_dir")
    if glove_dir and os.path.isdir(glove_dir):
        return WordVectorizer(
            glove_dir, cfg.get_path("eval.glove_prefix", "our_vab")
        )
    logger.warning(
        "no GloVe metas (eval.glove_dir); using hash stand-in — metrics are "
        "NOT comparable to published numbers"
    )
    return RandomWordVectorizer()


def build_evaluator(cfg):
    """T2M BiGRU evaluators from the torch checkpoint directory
    (`eval.evaluator_dir`, `eval.evaluator_file`); None when unset."""
    from mmada_tpu.eval.t2m_evaluator import EvaluatorWrapper

    evaluator_dir = cfg.get_path("eval.evaluator_dir")
    if not (evaluator_dir and os.path.isdir(evaluator_dir)):
        return None
    import torch

    path = os.path.join(
        evaluator_dir, cfg.get_path("eval.evaluator_file", "finest.tar")
    )
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    return EvaluatorWrapper.from_torch_checkpoint(
        ckpt.get("text_encoder", ckpt),
        ckpt.get("motion_encoder", ckpt),
        ckpt.get("movement_encoder", ckpt),
    )


def build_eval_batches(cfg, word_vectorizer, batch_size=None):
    """MotionEvalDataset batches generator, or None if data paths unset."""
    from mmada_tpu.data.motion import MotionEvalDataset
    from mmada_tpu.data.text import batched
    from mmada_tpu.eval.t2m_eval import collate_eval_items

    root = cfg.get_path("dataset.motion_root")
    split = cfg.get_path("dataset.split_file")
    if not (root and split and os.path.exists(split)):
        return None
    batch_size = batch_size or int(cfg.get_path("eval.batch_size", 32))
    max_frames = int(cfg.get_path("eval.max_motion_frames", 196))
    ds = MotionEvalDataset(
        root, split, word_vectorizer, max_motion_length=max_frames
    )
    items = [ds[i] for i in range(len(ds))]
    return (collate_eval_items(b) for b in batched(iter(items), batch_size))


def synthetic_evaluator(mv_cfg, seed: int = 3, hidden: int = 8,
                        out_dim: int = 6):
    """Tiny random-weight EvaluatorWrapper matching a MotionVQConfig's pose
    width — for zero-egress dry runs of the full t2m metric pipeline
    (sampler -> VQ decode -> evaluator embeddings -> FID/R-precision).
    Metrics from it are NOT comparable to published numbers; it proves the
    plumbing, exactly like RandomWordVectorizer."""
    import jax.numpy as jnp
    import numpy as np

    from mmada_tpu.eval.t2m_evaluator import EvaluatorWrapper

    rng = np.random.default_rng(seed)

    def lin(i, o):
        return jnp.asarray(rng.normal(size=(o, i)).astype(np.float32) * 0.1)

    def gru(d):
        return {
            "w_ih_f": lin(d, 3 * hidden), "w_hh_f": lin(hidden, 3 * hidden),
            "b_ih_f": jnp.zeros(3 * hidden), "b_hh_f": jnp.zeros(3 * hidden),
            "w_ih_b": lin(d, 3 * hidden), "w_hh_b": lin(hidden, 3 * hidden),
            "b_ih_b": jnp.zeros(3 * hidden), "b_hh_b": jnp.zeros(3 * hidden),
        }

    def outnet():
        return {
            "fc1_w": lin(2 * hidden, hidden), "fc1_b": jnp.zeros(hidden),
            "ln_w": jnp.ones(hidden), "ln_b": jnp.zeros(hidden),
            "fc2_w": lin(hidden, out_dim), "fc2_b": jnp.zeros(out_dim),
        }

    move_out = out_dim
    return EvaluatorWrapper(
        text_params={
            "pos_emb_w": lin(15, 12), "pos_emb_b": jnp.zeros(12),
            "input_emb_w": lin(12, hidden), "input_emb_b": jnp.zeros(hidden),
            "gru": gru(hidden), "out": outnet(),
            "hidden": jnp.zeros((2, 1, hidden)),
        },
        motion_params={
            "input_emb_w": lin(move_out, hidden),
            "input_emb_b": jnp.zeros(hidden),
            "gru": gru(hidden), "out": outnet(),
            "hidden": jnp.zeros((2, 1, hidden)),
        },
        movement_params={
            "conv1": {
                "w": jnp.asarray(
                    rng.normal(size=(4, mv_cfg.pose_dim - 4, 5)
                               ).astype(np.float32) * 0.1),
                "b": jnp.zeros(5),
            },
            "conv2": {
                "w": jnp.asarray(
                    rng.normal(size=(4, 5, move_out)).astype(np.float32) * 0.1),
                "b": jnp.zeros(move_out),
            },
            "out_w": lin(move_out, move_out), "out_b": jnp.zeros(move_out),
        },
        unit_length=2 ** mv_cfg.down_t,
    )
