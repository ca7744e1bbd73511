"""Export a trained Orbax checkpoint to a reference-compatible HF directory.

Produces `{out_dir}/model.safetensors` (torch-convention names, inverse of
checkpoints/hf_import.py) plus `config.json`, so checkpoints trained in
this framework load directly in the reference's
`MMadaModelLM.from_pretrained`.

    python tools/export_checkpoint.py config=configs/<stage>.yaml \
        checkpoint_dir=<output_dir> out_dir=<export_dir> [step=N] [ema=true]

`ema=true` exports the EMA shadow instead of the raw training weights
(requires the run to have trained with `training.ema.enabled`; EMA weights
are typically what you serve for t2i).
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logger = logging.getLogger(__name__)


def main(argv):
    logging.basicConfig(level=logging.INFO)
    from mmada_tpu.core.config import load_config
    from mmada_tpu.checkpoints.manager import (
        CheckpointManager,
        export_hf_config,
        export_safetensors,
    )
    from mmada_tpu.core.config import Config
    from mmada_tpu.serve.loader import build_model, build_vocab
    from mmada_tpu.training import optimizers
    from mmada_tpu.training.lr_schedules import from_config as lr_from_config
    from mmada_tpu.training.train_step import TrainState, with_grad_accumulation

    cfg = load_config(cli_args=argv)
    ckpt_dir = cfg.get("checkpoint_dir") or cfg.get_path("experiment.output_dir")
    if not ckpt_dir:
        logger.error("set checkpoint_dir=... or experiment.output_dir in the config")
        return 1
    out_dir = cfg.get("out_dir", os.path.join(ckpt_dir, "export"))
    step = cfg.get("step")

    want_ema = str(cfg.get("ema", "false")).lower() in ("1", "true", "yes")

    vocab = build_vocab(cfg)
    model = build_model(cfg, vocab)
    # the restore TEMPLATE must have the trainer's exact optimizer-state
    # tree (schedule + grad-accum wrappers change the chain structure), so
    # build it the same way trainer.Trainer.__init__ does
    tr = cfg.get_path("training", Config())
    lr = lr_from_config(
        cfg.get_path("lr_scheduler", Config()),
        total_steps=tr.get("max_train_steps", 10000),
    )
    opt = optimizers.from_config(
        cfg.get_path("optimizer", Config()), lr, params=model.params
    )
    opt = with_grad_accumulation(opt, tr.get("gradient_accumulation_steps", 1))
    train_template = TrainState.create(model.params, opt)
    from mmada_tpu.training.ema import EMAState

    # EMA-enabled runs persist {"train", "ema"}; plain runs persist the bare
    # TrainState — try the combined payload first, fall back to bare
    mgr = CheckpointManager(ckpt_dir)
    combined = {"train": train_template, "ema": EMAState.create(model.params)}
    try:
        state, found_step = mgr.restore(combined, step=step)
        has_ema = state is not None
    except Exception:
        state, has_ema = None, False
    if state is None:
        try:
            state, found_step = mgr.restore(train_template, step=step)
        except Exception:
            state = None
    if state is None:
        logger.error("no checkpoint under %s", ckpt_dir)
        return 1
    if want_ema and not has_ema:
        logger.error(
            "checkpoint has no EMA shadow — train with training.ema.enabled"
        )
        return 1
    if want_ema:
        params = state["ema"].shadow
    else:
        params = state["train"].params if has_ema else state.params
    logger.info("restoring step %d (%s) -> %s", found_step,
                "EMA shadow" if want_ema else "train params", out_dir)
    os.makedirs(out_dir, exist_ok=True)
    export_safetensors(os.path.join(out_dir, "model.safetensors"), params)
    export_hf_config(out_dir, model.cfg, vocab)
    logger.info("exported model.safetensors + config.json")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
