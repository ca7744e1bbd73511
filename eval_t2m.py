"""Text-to-motion evaluation CLI: FID / R-precision / diversity / matching.

Reference flow: train_t2m.py:769-800 driving `evaluation_mmada_t2m`
(utils/eval_trans.py:617+). Assembles the model, motion VQ-VAE, T2M
evaluators, and the eval dataset from config and runs
eval/t2m_eval.evaluate_mmada_t2m.

    python eval_t2m.py config=configs/t2m_instruct.yaml \
        dataset.split_file=data/HumanML3D/val.txt \
        eval.evaluator_dir=checkpoints/t2m/Comp_v6_KLD005

Requires HumanML3D data + pretrained evaluator checkpoints (torch format);
errors explicitly when absent.
"""

import json
import logging
import os
import sys

import numpy as np

logger = logging.getLogger(__name__)


def main(argv):
    logging.basicConfig(level=logging.INFO)
    import jax

    from mmada_tpu.core.config import load_config
    from mmada_tpu.checkpoints.manager import load_params_only
    from mmada_tpu.data.motion import MotionEvalDataset
    from mmada_tpu.data.text import batched
    from mmada_tpu.eval.t2m_eval import (
        T2MEvalConfig,
        collate_eval_items,
        evaluate_mmada_t2m,
    )
    from mmada_tpu.models import motion_vq
    from mmada_tpu.serve.loader import (
        build_model, build_prompting, build_text_tokenizer, build_vocab,
    )

    cfg = load_config(cli_args=argv)
    root = cfg.get_path("dataset.motion_root")
    split = cfg.get_path("dataset.split_file")
    batch_size = int(cfg.get_path("eval.batch_size", 32))
    max_batches = cfg.get_path("eval.max_batches")

    if not (root and split and os.path.exists(split)):
        logger.error(
            "dataset.motion_root + dataset.split_file (HumanML3D layout) "
            "are required; got root=%s split=%s", root, split,
        )
        return 1

    # word vectorizer + evaluators (shared with train_motion_vq's vq eval)
    from mmada_tpu.eval.components import build_evaluator, build_word_vectorizer

    wv = build_word_vectorizer(cfg)
    evaluator = build_evaluator(cfg)
    if evaluator is None:
        logger.error("eval.evaluator_dir with T2M evaluator checkpoints required")
        return 1

    # models
    tokenizer = build_text_tokenizer(cfg)
    vocab = build_vocab(cfg)
    if vocab.motion_codebook_size == 0:
        vocab = vocab.with_motion(cfg.get_path("model.mmada.motion_vocab_size", 512))
    prompting = build_prompting(cfg, tokenizer, vocab)
    model = build_model(cfg, vocab)

    mcfg_raw = cfg.get_path("model.motion_vq_model", {})
    mv_cfg = motion_vq.MotionVQConfig(
        pose_dim=mcfg_raw.get("pose_dim", 263),
        code_dim=mcfg_raw.get("code_dim", 512),
        nb_code=mcfg_raw.get("nb_code", 512),
        width=mcfg_raw.get("width", 512),
        down_t=mcfg_raw.get("down_t", 2),
        depth=mcfg_raw.get("depth", 3),
        dilation_growth_rate=mcfg_raw.get("dilation_growth_rate", 3),
    )
    template = motion_vq.init_motion_vq(jax.random.key(0), mv_cfg)
    mv_ckpt = mcfg_raw.get("pretrained_path")
    mv_params = (
        load_params_only(mv_ckpt, template)
        if mv_ckpt and os.path.exists(mv_ckpt) else template
    )

    max_frames = int(cfg.get_path("eval.max_motion_frames", 196))
    unit = 2 ** mv_cfg.down_t
    ds = MotionEvalDataset(root, split, wv, max_motion_length=max_frames)
    items = [ds[i] for i in range(len(ds))]
    eval_batches = (
        collate_eval_items(b) for b in batched(iter(items), batch_size)
    )

    results = evaluate_mmada_t2m(
        model, mv_params, mv_cfg, evaluator, prompting, eval_batches,
        T2MEvalConfig(
            # VQ TOKENS, not frames: unit_length frames per token
            num_motion_tokens=int(
                cfg.get_path("eval.num_motion_tokens", max_frames // unit // 4 * 4 or 49)
            ),
            timesteps=int(cfg.get_path("eval.timesteps", 18)),
            unit_length=unit,
        ),
        # evaluator consumes NORMALIZED motion space, same as the dataset's
        # ground truth (reference eval_trans.py:775-776 — inv_transform is
        # only for visualization); no denormalize here
        max_batches=max_batches,
    )
    print(json.dumps({k: float(v) for k, v in results.items()}, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
