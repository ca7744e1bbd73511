"""Export a trained Orbax checkpoint to a reference-compatible HF directory.

Produces `{out_dir}/model.safetensors` (torch-convention names, inverse of
checkpoints/hf_import.py) plus `config.json`, so checkpoints trained in
this framework load directly in the reference's
`MMadaModelLM.from_pretrained`.

    python tools/export_checkpoint.py config=configs/<stage>.yaml \
        checkpoint_dir=<output_dir> out_dir=<export_dir> [step=N]
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
    from mmada_tpu.serve.loader import build_model, build_vocab
    from mmada_tpu.training import optimizers
    from mmada_tpu.training.train_step import TrainState

    cfg = load_config(cli_args=argv)
    ckpt_dir = cfg.get("checkpoint_dir") or cfg.get_path("experiment.output_dir")
    if not ckpt_dir:
        logger.error("set checkpoint_dir=... or experiment.output_dir in the config")
        return 1
    out_dir = cfg.get("out_dir", os.path.join(ckpt_dir, "export"))
    step = cfg.get("step")

    vocab = build_vocab(cfg)
    model = build_model(cfg, vocab)
    opt = optimizers.adamw(1e-4, params_for_mask=model.params)
    template = TrainState.create(model.params, opt)
    mgr = CheckpointManager(ckpt_dir)
    state, found_step = mgr.restore(template, step=step)
    if state is None:
        logger.error("no checkpoint under %s", ckpt_dir)
        return 1
    logger.info("restoring step %d -> %s", found_step, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    export_safetensors(os.path.join(out_dir, "model.safetensors"), state.params)
    export_hf_config(out_dir, model.cfg, vocab)
    logger.info("exported model.safetensors + config.json")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
