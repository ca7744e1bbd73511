"""Training entry point: `python train.py config=configs/<stage>.yaml ...`

Replaces the reference's `accelerate launch training/train_mmada*.py`
family (stage 1-4 + cot-sft are configs, not forks — SURVEY.md §7.1).
Multi-host TPU slices initialize through `jax.distributed` automatically
when the runtime provides cluster metadata.
"""

import logging
import sys


def build_dataloader(cfg, trainer):
    """Construct the combined multi-flow loader from config. Synthetic flows
    are available for smoke tests (`dataset.synthetic: true`)."""
    import numpy as np

    from mmada_tpu.data.combined import CombinedLoader
    from mmada_tpu.data.imagenet import ImageNetDataset, collate_imagenet
    from mmada_tpu.data.text import RefinedWebDataset, batched
    from mmada_tpu.data.transforms import image_transform
    from mmada_tpu.data.webdataset import WebDatasetReader, collate_image_text

    tr = cfg.training
    res = cfg.get_path("dataset.preprocessing.resolution", 256)
    flows = {}

    if cfg.get_path("dataset.synthetic"):
        def synth_images(batch):
            rng = np.random.default_rng(0)
            while True:
                yield {
                    "images": rng.standard_normal(
                        (batch, res, res, 3)
                    ).astype(np.float32).clip(-1, 1),
                    "input_ids": ["a synthetic image"] * batch,
                }

        def synth_text(batch):
            while True:
                yield {"input_ids": ["synthetic text sample"] * batch}

        if tr.get("batch_size_t2i"):
            flows["t2i_flow"] = synth_images(tr.batch_size_t2i)
        if tr.get("batch_size_lm"):
            flows["lm_flow"] = synth_text(tr.batch_size_lm)
        if tr.get("batch_size_mmu"):
            flows["mmu_flow"] = synth_images(tr.batch_size_mmu)
        return CombinedLoader(flows)

    params = cfg.get_path("dataset.params", {})
    gen_type = cfg.get_path("dataset.gen_type", "imagenet1k")
    if tr.get("batch_size_t2i"):
        if gen_type == "imagenet1k":
            ds = ImageNetDataset(
                params.get("train_t2i_shards_path_or_url"),
                params.get("imagenet_label_mapping"),
                resolution=res,
            )
            flows["t2i_flow"] = (
                collate_imagenet(b)
                for b in batched(iter(ds), tr.batch_size_t2i)
            )
        else:
            reader = WebDatasetReader(
                params.get("train_t2i_shards_path_or_url"),
                transform=lambda img: image_transform(img, res),
                shuffle_buffer=params.get("shuffle_buffer_size", 1000),
            )
            flows["t2i_flow"] = (
                collate_image_text(b)
                for b in batched(iter(reader), tr.batch_size_t2i)
            )
    if tr.get("batch_size_lm"):
        ds = RefinedWebDataset(
            params.get("train_lm_shards_path_or_url"),
            shuffle_buffer=params.get("shuffle_buffer_size", 1000),
        )
        flows["lm_flow"] = (
            {"input_ids": [s["input_ids"] for s in b]}
            for b in batched(iter(ds), tr.batch_size_lm)
        )
    if tr.get("batch_size_mmu"):
        reader = WebDatasetReader(
            params.get("train_mmu_shards_path_or_url"),
            transform=lambda img: image_transform(img, res),
            shuffle_buffer=params.get("shuffle_buffer_size", 1000),
        )
        flows["mmu_flow"] = (
            collate_image_text(b)
            for b in batched(iter(reader), tr.batch_size_mmu)
        )
    return CombinedLoader(
        flows, cfg.get_path("dataset.combined_loader_mode", "max_size_cycle")
    )


def main(argv):
    logging.basicConfig(level=logging.INFO)
    from mmada_tpu.core.config import load_config
    from mmada_tpu.serve.loader import load_all
    from mmada_tpu.training.trainer import Trainer

    cfg = load_config(cli_args=argv)
    model, vq_params, vq_cfg, tokenizer, prompting, vocab = load_all(cfg)
    trainer = Trainer(cfg, model, prompting, vq_params, vq_cfg)
    if cfg.get_path("experiment.resume_from_checkpoint") == "latest":
        trainer.resume()
    loader = build_dataloader(cfg, trainer)
    trainer.fit(loader, rng_seed=cfg.get_path("training.seed", 0))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
