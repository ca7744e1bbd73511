"""Training entry point: `python train.py config=configs/<stage>.yaml ...`

Replaces the reference's `accelerate launch training/train_mmada*.py`
family (stage 1-4 + cot-sft are configs, not forks — SURVEY.md §7.1).
Multi-host TPU slices initialize through `jax.distributed` automatically
when the runtime provides cluster metadata.
"""

import logging
import sys


def build_dataloader(cfg):
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

    if cfg.get_path("dataset.synthetic_structured"):
        # deterministic LEARNABLE flows (pattern images + templated text)
        # for on-chip proxy training — data/synthetic.py
        from mmada_tpu.data.synthetic import build_structured_flows

        return CombinedLoader(
            build_structured_flows(cfg),
            cfg.get_path("dataset.combined_loader_mode", "max_size_cycle"),
        )

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
        return CombinedLoader(
            flows, cfg.get_path("dataset.combined_loader_mode", "max_size_cycle")
        )

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
        # stage-4 mixes base + instruct lm sources by probability
        # coefficients (train_mmada_stage4.py:636)
        base_coeff = params.get("base_in_lm_coeff")
        if base_coeff is not None and params.get("train_instruct_lm_shards_path_or_url"):
            from mmada_tpu.data.vqa import MixedStream

            streams = {
                "base": iter(RefinedWebDataset(
                    params.get("train_lm_shards_path_or_url"),
                    shuffle_buffer=params.get("shuffle_buffer_size", 1000),
                )),
                "instruct": iter(RefinedWebDataset(
                    params.get("train_instruct_lm_shards_path_or_url"),
                    shuffle_buffer=params.get("shuffle_buffer_size", 1000),
                )),
            }
            weights = {
                "base": base_coeff,
                "instruct": params.get("instruct_in_lm_coeff", 1 - base_coeff),
            }
            lm_iter = iter(MixedStream(streams, weights))
        else:
            lm_iter = iter(RefinedWebDataset(
                params.get("train_lm_shards_path_or_url"),
                shuffle_buffer=params.get("shuffle_buffer_size", 1000),
            ))
        flows["lm_flow"] = (
            {"input_ids": [s["input_ids"] for s in b]}
            for b in batched(lm_iter, tr.batch_size_lm)
        )
    if tr.get("batch_size_mmu"):
        # und_type selects the mmu understanding pipeline; image+caption
        # webdataset streams cover the captioning family, and unsupported
        # types fail loudly like the reference (train_mmada.py:340-377)
        und_type = cfg.get_path("dataset.und_type", "captioning")
        if und_type not in ("captioning", "captioning_parquet"):
            raise NotImplementedError(f"Unsupported und_type {und_type}")
        # stage-4 mixes mmu sources ({cot,vqa,clevr2,geo170k}_in_mmu_coeff,
        # train_mmada_stage4.py:694): any `<name>_in_mmu_coeff` with a
        # matching `train_<name>_mmu_shards_path_or_url` joins the mixture
        mmu_sources = {}
        for key, coeff in list(params.items()):
            if key.endswith("_in_mmu_coeff"):
                name = key[: -len("_in_mmu_coeff")]
                shards = params.get(f"train_{name}_mmu_shards_path_or_url")
                if shards:
                    mmu_sources[name] = (shards, coeff)
        if mmu_sources:
            from mmada_tpu.data.vqa import MixedStream

            streams = {
                name: iter(WebDatasetReader(
                    shards,
                    transform=lambda img: image_transform(img, res),
                    shuffle_buffer=params.get("shuffle_buffer_size", 1000),
                ))
                for name, (shards, _) in mmu_sources.items()
            }
            weights = {n: c for n, (_, c) in mmu_sources.items()}
            mmu_iter = iter(MixedStream(streams, weights))
        else:
            mmu_iter = iter(WebDatasetReader(
                params.get("train_mmu_shards_path_or_url"),
                transform=lambda img: image_transform(img, res),
                shuffle_buffer=params.get("shuffle_buffer_size", 1000),
            ))
        flows["mmu_flow"] = (
            collate_image_text(b)
            for b in batched(mmu_iter, tr.batch_size_mmu)
        )
    return CombinedLoader(
        flows, cfg.get_path("dataset.combined_loader_mode", "max_size_cycle")
    )


def train_t2m(cfg):
    """Text-to-motion training loop (reference train_t2m.py / _lora):
    MotionTokenDataset -> fused mapping -> t2m frames -> motion MLM step;
    LoRA when `training.lora` is configured."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmada_tpu.checkpoints.manager import CheckpointManager
    from mmada_tpu.serve.loader import (
        build_model, build_prompting, build_text_tokenizer, build_vocab,
    )
    from mmada_tpu.training import optimizers, t2m
    from mmada_tpu.training.lr_schedules import from_config as lr_from_config
    from mmada_tpu.training.train_step import TrainState
    from mmada_tpu.utils.logging import MetricsLogger

    tokenizer = build_text_tokenizer(cfg)
    vocab = build_vocab(cfg)
    if vocab.motion_codebook_size == 0:
        vocab = vocab.with_motion(
            cfg.get_path("model.mmada.motion_vocab_size", 512)
        )
    prompting = build_prompting(cfg, tokenizer, vocab)
    model = build_model(cfg, vocab)

    tr = cfg.training
    batch_size = tr.get("batch_size_t2m", 32)
    max_steps = tr.get("max_train_steps", 1000)
    n_motion = cfg.get_path("dataset.max_motion_length", 55)
    lr = lr_from_config(cfg.get_path("lr_scheduler", {}), total_steps=max_steps)

    lora_cfg_raw = tr.get("lora")
    sc = t2m.T2MStepConfig(
        batch_size=batch_size, max_text_len=prompting.max_text_len,
        num_motion_tokens=n_motion,
        skip_nonfinite_updates=tr.get("skip_nonfinite_updates", True),
    )
    if lora_cfg_raw:
        from mmada_tpu.models import lora as lora_mod

        lcfg = lora_mod.LoRAConfig(
            rank=lora_cfg_raw.get("rank", 32),
            alpha=lora_cfg_raw.get("alpha", 64),
            targets=tuple(lora_cfg_raw.get(
                "targets", lora_mod.DEFAULT_TARGETS
            )),
            train_embeddings=lora_cfg_raw.get("train_embeddings", True),
        )
        adapters = lora_mod.init_lora(jax.random.key(1), model.params, lcfg)
        trainable = lora_mod.trainable_params(model.params, adapters, lcfg)
        opt = optimizers.adamw(lr)
        state = TrainState.create(trainable, opt)
        base_params = model.params
        lora_step = jax.jit(t2m.make_t2m_lora_train_step(model, opt, sc, lcfg))

        def step(state, batch, rng):
            return lora_step(state, batch, rng, base_params)
    else:
        opt = optimizers.adamw(lr, params_for_mask=model.params)
        state = TrainState.create(model.params, opt)
        step = jax.jit(t2m.make_t2m_train_step(model, opt, sc))

    if cfg.get_path("dataset.token_bank"):
        # pre-tokenized deterministic bank (tools/motion_soak.py stage 2):
        # caption -> fixed code sequence, so the mapping is LEARNABLE —
        # unlike dataset.synthetic below, whose random tokens per sample
        # only smoke-test the loop. Rows are already padded
        # MotionTokenDataset-style (codes, EOM, PAD...).
        bank = np.load(cfg.get_path("dataset.token_bank"))
        bank_caps = [str(c) for c in bank["captions"]]
        bank_toks = np.asarray(bank["tokens"], np.int64)
        bank_lens = np.asarray(bank["lengths"], np.int64)

        def samples():
            rng = np.random.default_rng(0)
            while True:
                i = int(rng.integers(0, len(bank_caps)))
                yield (bank_caps[i], bank_toks[i], int(bank_lens[i]))
        stream = samples()
    elif cfg.get_path("dataset.synthetic"):
        import itertools

        def samples():
            rng = np.random.default_rng(0)
            while True:
                yield ("a person walks",
                       rng.integers(0, vocab.motion_codebook_size,
                                    size=(n_motion,)), n_motion)
        stream = samples()
    else:
        from mmada_tpu.data.motion import MotionTokenDataset

        ds = MotionTokenDataset(
            cfg.get_path("dataset.motion_root"),
            cfg.get_path("dataset.split_file",
                         cfg.get_path("dataset.motion_root", "") + "/train.txt"),
            cfg.get_path("dataset.tokenizer_name", "VQVAE_tokens"),
            nb_code=vocab.motion_codebook_size,
            max_motion_length=n_motion,
        )
        stream = iter(ds)

    out_dir = cfg.get_path("experiment.output_dir", "t2m-output")
    metrics = MetricsLogger(f"{out_dir}/metrics.jsonl")
    ckpt = CheckpointManager(out_dir,
                             cfg.get_path("experiment.checkpoints_total_limit"))
    save_every = cfg.get_path("experiment.save_every", 5000)
    log_every = cfg.get_path("experiment.log_every", 50)

    key = jax.random.key(tr.get("seed", 0))
    for i in range(max_steps):
        caps, toks, lens = [], [], []
        for _ in range(batch_size):
            c, t_, l = next(stream)
            caps.append(c), toks.append(t_), lens.append(l)
        fused = np.asarray(
            t2m.map_motion_tokens(jnp.asarray(np.stack(toks)), vocab)
        )
        ids, masks, labels = prompting((caps, fused, fused), "t2m")
        batch = {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(labels),
            "attention_mask": jnp.asarray(masks),
        }
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        if i % log_every == 0:
            vals = {k: float(v) for k, v in m.items()}
            vals["step"] = i
            metrics.log(vals)
            logging.getLogger("train").info(
                "t2m step %d loss %.4f", i, vals["loss"]
            )
        if save_every and i > 0 and i % save_every == 0:
            ckpt.save(i, state)
    ckpt.save(max_steps, state)
    return 0


def main(argv):
    logging.basicConfig(level=logging.INFO)
    from mmada_tpu.core.config import load_config
    from mmada_tpu.serve.loader import load_all
    from mmada_tpu.training.trainer import Trainer

    cfg = load_config(cli_args=argv)
    if cfg.get_path("distributed.initialize", False):
        # multi-host topologies (configs/topologies/multihost_*.yaml):
        # coordinator/process info comes from the TPU runtime metadata
        # unless explicitly pinned in the config
        from mmada_tpu.core.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=cfg.get_path("distributed.coordinator", None),
            num_processes=cfg.get_path("distributed.num_processes", None),
            process_id=cfg.get_path("distributed.process_id", None),
        )
    if cfg.get_path("training.task") == "t2m":
        return train_t2m(cfg)
    model, vq_params, vq_cfg, tokenizer, prompting, vocab = load_all(cfg)
    trainer = Trainer(cfg, model, prompting, vq_params, vq_cfg)
    if cfg.get_path("experiment.resume_from_checkpoint") == "latest":
        trainer.resume()
    loader = build_dataloader(cfg)
    trainer.fit(loader, rng_seed=cfg.get_path("training.seed", 0))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
