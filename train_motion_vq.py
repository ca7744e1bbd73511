"""Motion VQ-VAE trainer CLI.

Equivalent of `motion_vqvae/train_motion_vq.py` (169 LoC argparse trainer):
standalone training of the 1-D conv VQ-VAE with recon + velocity + commit
losses (utils/losses.py:4-28) and EMA-reset codebook, on windowed motion
features (data/motion.py MotionVQDataset).

    python train_motion_vq.py config=configs/motion_vq.yaml
    python train_motion_vq.py dataset.synthetic=true training.max_train_steps=50
"""

import logging
import sys

import numpy as np

logger = logging.getLogger(__name__)


def main(argv):
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import optax

    from mmada_tpu.core.config import load_config
    from mmada_tpu.checkpoints.manager import CheckpointManager
    from mmada_tpu.models import motion_vq
    from mmada_tpu.utils.logging import MetricsLogger

    cfg = load_config(cli_args=argv)
    mcfg_raw = cfg.get_path("model.motion_vq_model", {})
    mcfg = motion_vq.MotionVQConfig(
        pose_dim=mcfg_raw.get("pose_dim", 263),
        code_dim=mcfg_raw.get("code_dim", 512),
        nb_code=mcfg_raw.get("nb_code", 512),
        width=mcfg_raw.get("width", 512),
        down_t=mcfg_raw.get("down_t", 2),
        depth=mcfg_raw.get("depth", 3),
        dilation_growth_rate=mcfg_raw.get("dilation_growth_rate", 3),
        mu=mcfg_raw.get("mu", 0.99),
        quantizer=mcfg_raw.get("quantizer", "ema_reset"),
        beta=mcfg_raw.get("beta", 1.0),
    )
    tr = cfg.get_path("training", {})
    batch_size = tr.get("batch_size", 32)
    window = cfg.get_path("dataset.window_size", 64)
    max_steps = tr.get("max_train_steps", 100)
    lr = tr.get("learning_rate", 2e-4)
    commit_w = tr.get("commit_weight", 0.02)
    vel_w = tr.get("vel_weight", 0.5)
    out_dir = cfg.get_path("experiment.output_dir", "motion-vq-output")

    if cfg.get_path("dataset.synthetic_structured"):
        # learnable deterministic clips (data/synthetic.motion_clip) at the
        # CONFIGURED VQ size — the on-chip motion-family soak
        # (tools/motion_soak.py); `dataset.synthetic=true` below stays the
        # tiny noise smoke path
        from mmada_tpu.data import synthetic as _synth

        n_clips = int(cfg.get_path("dataset.n_patterns", 64))
        bank = np.stack([
            _synth.motion_clip(k, length=3 * window, pose_dim=mcfg.pose_dim)
            for k in range(n_clips)
        ])

        def loader():
            rng = np.random.default_rng(0)
            while True:
                ks = rng.integers(0, n_clips, size=batch_size)
                starts = rng.integers(
                    0, bank.shape[1] - window + 1, size=batch_size
                )
                yield np.stack([
                    bank[k, s:s + window] for k, s in zip(ks, starts)
                ])
        batches = loader()
    elif cfg.get_path("dataset.synthetic"):
        if tr.get("tiny", True):
            import dataclasses as _dc

            mcfg = _dc.replace(
                motion_vq.tiny_motion_cfg(),
                quantizer=mcfg.quantizer, beta=mcfg.beta,
            )

        def loader():
            rng = np.random.default_rng(0)
            while True:
                yield rng.normal(
                    size=(batch_size, window, mcfg.pose_dim)
                ).astype(np.float32)
        batches = loader()
    else:
        from mmada_tpu.data.motion import MotionVQDataset
        from mmada_tpu.data.text import batched

        ds = MotionVQDataset(
            cfg.get_path("dataset.motion_root"),
            cfg.get_path("dataset.split_file"),
            window_size=window,
        )
        batches = (np.stack(b) for b in batched(iter(ds), batch_size))

    params = motion_vq.init_motion_vq(jax.random.key(0), mcfg)
    cb_state = motion_vq.CodebookState.create(mcfg)
    opt = optax.adamw(lr, weight_decay=tr.get("weight_decay", 0.0))
    # the 'gradient' quantizer trains its codebook through the optimizer
    # (quantize_cnn.py:127-165 Quantizer); the EMA/reset variants update it
    # functionally via forward_train's returned codebook
    train_codebook = mcfg.quantizer == "gradient"
    conv_params = {"encoder": params["encoder"], "decoder": params["decoder"]}
    if train_codebook:
        conv_params["codebook"] = params["codebook"]
    opt_state = opt.init(conv_params)
    codebook = params["codebook"]

    @jax.jit
    def step(conv_params, codebook, cb_state, opt_state, motion, key):
        def loss_fn(cp):
            full = dict(cp) if train_codebook else dict(cp, codebook=codebook)
            recon, commit, ppl, new_cb, new_state = motion_vq.forward_train(
                key, full, cb_state, mcfg, motion
            )
            total, parts = motion_vq.motion_losses(
                recon, motion, commit, commit_w, vel_w
            )
            return total, (parts, ppl, new_cb, new_state)

        (total, (parts, ppl, new_cb, new_state)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(conv_params)
        )
        updates, opt_state = opt.update(grads, opt_state, conv_params)
        conv_params = optax.apply_updates(conv_params, updates)
        if train_codebook:
            new_cb = conv_params["codebook"]
        return conv_params, new_cb, new_state, opt_state, total, parts, ppl

    metrics = MetricsLogger(f"{out_dir}/metrics.jsonl")
    ckpt = CheckpointManager(out_dir)
    for i, motion in enumerate(batches):
        if i >= max_steps:
            break
        conv_params, codebook, cb_state, opt_state, total, parts, ppl = step(
            conv_params, codebook, cb_state, opt_state,
            jnp.asarray(motion), jax.random.key(i),
        )
        if i % tr.get("log_every", 10) == 0:
            vals = {
                "step": i, "loss": float(total), "perplexity": float(ppl),
                **{k: float(v) for k, v in parts.items()},
            }
            metrics.log(vals)
            logger.info("step %d loss %.4f ppl %.1f recon %.4f", i,
                        vals["loss"], vals["perplexity"], vals["recon"])
    full = dict(conv_params, codebook=codebook)
    ckpt.save(max_steps, full)
    logger.info("saved motion VQ-VAE to %s", out_dir)

    # optional reconstruction eval (evaluation_vqvae analog,
    # utils/eval_trans.py:437+): needs the T2M evaluator checkpoint + eval
    # split wired in the config (eval.evaluator_dir, dataset.motion_root,
    # dataset.split_file)
    if cfg.get_path("eval.run_vq_eval", False):
        from mmada_tpu.eval.components import (
            build_eval_batches,
            build_evaluator,
            build_word_vectorizer,
        )
        from mmada_tpu.eval.t2m_eval import evaluate_motion_vq

        evaluator = build_evaluator(cfg)
        batches_iter = (
            build_eval_batches(cfg, build_word_vectorizer(cfg))
            if evaluator is not None else None
        )
        if evaluator is None or batches_iter is None:
            logger.error(
                "eval.run_vq_eval needs eval.evaluator_dir + "
                "dataset.motion_root + dataset.split_file"
            )
            return 1
        results = evaluate_motion_vq(
            full, mcfg, evaluator, batches_iter,
            max_batches=cfg.get_path("eval.max_batches", None),
        )
        metrics.log({"step": max_steps, **{f"vq_eval/{k}": float(v)
                                           for k, v in results.items()}})
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
