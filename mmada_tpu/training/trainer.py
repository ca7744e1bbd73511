"""Multi-task trainer: the stage-1..4 training loop as one config-driven class.

Equivalent of the reference trainer family (training/train_mmada.py and its
_stage2/_stage3/_stage4/_cot_sft forks, 985-1333 LoC each — SURVEY.md §2.5).
Stages differ only in data sources, lm flavor (plain vs chat), and loss
coefficients, so here they are configs, not forks:

  stage1: ImageNet t2i + captioning mmu + RefinedWeb lm
  stage2: webdataset t2i image-text pairs
  stage3: lm → ChatDataset with answer-length normalization
  stage4: mixed lm/mmu sources by probability coefficients

Loop shape (train_mmada.py:526-735): host assembles clean frames
(prompting) + VQ-encodes images; the jitted step corrupts on device,
forwards once over the `[t2i | lm | mmu]` concat, computes the three
losses, and updates. Cadence hooks: log_every, save_every (Orbax rotation),
generate_every (validation generations).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.core.compile_cache import enable_compilation_cache
from mmada_tpu.core.config import Config
from mmada_tpu.core.mesh import make_mesh
from mmada_tpu.checkpoints.manager import CheckpointManager
from mmada_tpu.data.combined import CombinedLoader
from mmada_tpu.models import magvit2
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.parallel import sharding
from mmada_tpu.sampling.schedules import get_mask_schedule
from mmada_tpu.training import losses as L
from mmada_tpu.training import optimizers
from mmada_tpu.training.lr_schedules import from_config as lr_from_config
from mmada_tpu.training.train_step import (
    StepConfig,
    TrainState,
    make_train_step,
    with_grad_accumulation,
)
from mmada_tpu.utils.logging import MetricsLogger
from mmada_tpu.utils.meters import AverageMeter

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        model: MMadaModel,
        prompting,
        vq_params=None,
        vq_cfg=None,
        mesh=None,
    ):
        self.cfg = cfg
        self.model = model
        self.prompting = prompting
        self.vq_params = vq_params
        self.vq_cfg = vq_cfg
        # resumes/restarts skip the multi-minute train-step recompile when
        # a cache dir is configured (core/compile_cache.py)
        enable_compilation_cache(cfg)

        tr = cfg.get_path("training", Config())
        self.step_cfg = StepConfig(
            batch_size_t2i=tr.get("batch_size_t2i", 0),
            batch_size_lm=tr.get("batch_size_lm", 0),
            batch_size_mmu=tr.get("batch_size_mmu", 0),
            max_seq_length=self.prompting.max_text_len,
            t2i_coeff=tr.get("t2i_coeff", 1.0),
            lm_coeff=tr.get("lm_coeff", 0.1),
            mmu_coeff=tr.get("mmu_coeff", 1.0),
            min_masking_rate=tr.get("min_masking_rate", 0.0),
            noise_type=tr.get("noise_type", "mask"),
            mask_contiguous_region_prob=tr.get("mask_contiguous_region_prob", 0.0),
            mask_schedule=get_mask_schedule(
                cfg.get_path("mask_schedule.schedule", "cosine")
            ),
            lm_loss_mode=tr.get("lm_loss_mode", "llada"),
            loss_chunk=tr.get("loss_chunk", 0),
            use_chat_lm=tr.get("use_chat_lm", False),
            lm_pad_loss=tr.get("lm_pad_loss", True),
            skip_nonfinite_updates=tr.get("skip_nonfinite_updates", True),
            log_param_grad_norms=tr.get("log_param_grad_norms", False),
            forward_quantize=tr.get("forward_quantize", "none"),
        )

        total_steps = tr.get("max_train_steps", 10000)
        lr = lr_from_config(
            cfg.get_path("lr_scheduler", Config()), total_steps=total_steps
        )
        opt = optimizers.from_config(
            cfg.get_path("optimizer", Config()), lr, params=model.params
        )
        opt = with_grad_accumulation(
            opt, tr.get("gradient_accumulation_steps", 1)
        )
        self.optimizer = opt
        self.max_train_steps = total_steps

        # mesh + shardings
        if mesh is None and jax.device_count() > 1:
            p = cfg.get_path("parallel", Config())
            mesh = make_mesh(
                data=p.get("data", 1), fsdp=p.get("fsdp", -1),
                tensor=p.get("tensor", 1),
            )
        self.mesh = mesh
        if mesh is not None:
            self.model = dataclasses.replace(
                model,
                params=sharding.shard_params(
                    model.params, sharding.llada_param_specs(model.cfg), mesh
                ),
            )

        self.state = TrainState.create(self.model.params, opt)

        def _jit_step(remat_mode):
            return jax.jit(
                make_train_step(
                    dataclasses.replace(self.model, remat=remat_mode), opt,
                    self.step_cfg,
                ),
                donate_argnums=(0,),  # old state freed as the new one lands
            )

        if model.remat == "auto":
            # resolved at the first step, when concrete batch shapes exist:
            # compile `dots`, keep it iff XLA's buffer assignment fits the
            # device budget, else fall back to `full` (training/remat_auto)
            self._jit_step = _jit_step
            self.train_step = self._resolve_auto_remat
        else:
            self.train_step = _jit_step(model.remat)

        # optional weight EMA (the reference ships an EMA class but never
        # wires it, models/training_utils.py:61-297; here training.ema.*
        # enables it)
        ema_cfg = cfg.get_path("training.ema", Config())
        self.ema_state = None
        if ema_cfg.get("enabled"):
            from mmada_tpu.training import ema as ema_mod

            # deep copy: the originals are donated by the first train step
            self.ema_state = ema_mod.EMAState.create(
                jax.tree.map(jnp.copy, self.model.params)
            )
            self._ema_update = jax.jit(
                lambda s, p: ema_mod.ema_update(
                    s, p,
                    max_decay=ema_cfg.get("max_decay", 0.9999),
                    inv_gamma=ema_cfg.get("inv_gamma", 1.0),
                    power=ema_cfg.get("power", 2.0 / 3.0),
                )
            )
        # the live weights now belong to TrainState; keep the model as a
        # paramless template so step-0 arrays don't stay resident
        self.model = dataclasses.replace(self.model, params=None)

        out_dir = cfg.get_path("experiment.output_dir", "output")
        self.ckpt = CheckpointManager(
            out_dir, cfg.get_path("experiment.checkpoints_total_limit")
        )
        self.metrics = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"))
        self.log_every = cfg.get_path("experiment.log_every", 50)
        self.save_every = cfg.get_path("experiment.save_every", 1000)
        self.generate_every = cfg.get_path("experiment.generate_every", 0)
        self.global_step = 0

        # config snapshot (train_mmada.py:151-155)
        os.makedirs(out_dir, exist_ok=True)
        cfg.save(os.path.join(out_dir, "config.yaml"))

    def _resolve_auto_remat(self, state, batch, rng):
        """First-step trampoline for `gradient_checkpointing: auto`:
        pick dots/full by compiled memory fit, swap the chosen jitted fn
        into `self.train_step`, and run the step."""
        from mmada_tpu.training.remat_auto import pick_remat

        mode, step_fn, info = pick_remat(self._jit_step, state, batch, rng)
        logger.info("gradient_checkpointing=auto resolved to %r (%s)",
                    mode, info)
        self.remat_resolved = (mode, info)
        self.train_step = step_fn
        return step_fn(state, batch, rng)

    # -------------------------------------------------------------- data
    _encode_fn = None
    _vq_cache: Optional[dict] = None

    def encode_images(
        self, images: np.ndarray, cache_keys=None
    ) -> np.ndarray:
        """pixels (B, H, W, C) -> fused image token ids. Jitted once: the
        eager conv stack is fine on CPU but op-by-op dispatch through the
        remote-TPU tunnel would dominate step time.

        `cache_keys` (one hashable per image) lets flows with few distinct
        images (data/synthetic.py pattern banks; any pre-deduplicated
        dataset) skip re-uploading + re-encoding repeats — the VQ encoder
        is frozen, so codes are immutable per image."""
        if self._encode_fn is None:
            vq_cfg = self.vq_cfg
            self._encode_fn = jax.jit(
                lambda p, x: magvit2.get_code(p, vq_cfg, x)
            )
        offset = self.model.vocab.image_offset
        if cache_keys is None:
            codes = self._encode_fn(self.vq_params, jnp.asarray(images))
            return np.asarray(codes) + offset
        if self._vq_cache is None:
            self._vq_cache = {}
        missing = [i for i, k in enumerate(cache_keys)
                   if k not in self._vq_cache]
        if missing:
            fresh = np.asarray(self._encode_fn(
                self.vq_params, jnp.asarray(np.asarray(images)[missing])
            ))
            for j, i in enumerate(missing):
                self._vq_cache[cache_keys[i]] = fresh[j]
        return np.stack(
            [self._vq_cache[k] for k in cache_keys]
        ) + offset

    def prepare_batch(self, raw: dict) -> dict:
        """Host-side assembly: VQ encode + prompting frames, no corruption
        (corruption happens inside the jitted step)."""
        sc = self.step_cfg
        batch: dict[str, Any] = {}
        if sc.batch_size_t2i:
            flow = raw["t2i_flow"]
            image_ids = self.encode_images(
                flow["images"], flow.get("cache_keys")
            )
            ids, masks, _ = self.prompting(
                (flow["input_ids"], image_ids, image_ids), "t2i"
            )
            batch["t2i_input_ids"] = jnp.asarray(ids)
            batch["t2i_masks"] = jnp.asarray(masks)
        if sc.batch_size_lm:
            flow = raw["lm_flow"]
            max_len = batch.get("t2i_input_ids").shape[1] if sc.batch_size_t2i else (
                self.cfg.get_path("dataset.preprocessing.max_seq_length", 512)
            )
            if sc.use_chat_lm:
                ids, pmask, labels = self.prompting(
                    (flow["input_ids"], max_len), "lm_chat"
                )
                batch["lm_prompt_masks"] = jnp.asarray(pmask)
            else:
                ids, lm_mask, labels = self.prompting(
                    (flow["input_ids"], max_len), "lm"
                )
                if not sc.lm_pad_loss:
                    # training.lm_pad_loss=false: EOS padding beyond each
                    # row's real text (+1 terminal EOS, inside lm_mask)
                    # leaves the loss. The reference keeps pad in-loss
                    # (prompting_utils.py:249-250) — harmless for corpora
                    # that fill the frame, but when rows are much shorter
                    # than the concat frame the masked positions become
                    # ~95% EOS and the model learns "masked → EOS"
                    # (proxy campaign B: loss_lm plateau 0.12, 0% infill)
                    labels = np.where(
                        np.asarray(lm_mask, bool), labels, L.IGNORE_ID
                    )
            batch["lm_input_ids"] = jnp.asarray(ids)
            batch["lm_labels"] = jnp.asarray(labels)
        if sc.batch_size_mmu:
            flow = raw["mmu_flow"]
            image_ids = self.encode_images(
                flow["images"], flow.get("cache_keys")
            )
            ids, pmask, labels = self.prompting(
                (image_ids, flow["input_ids"]), "mmu"
            )
            batch["mmu_input_ids"] = jnp.asarray(ids)
            batch["mmu_prompt_masks"] = jnp.asarray(pmask)
            batch["mmu_labels"] = jnp.asarray(labels)
        # pad all flows to one sequence length for the concat forward
        return _pad_flows_to_common_length(
            batch, self.model.vocab.eos_token_id
        )

    # -------------------------------------------------------------- loop
    _preempted = False

    def _install_preemption_handler(self):
        """Failure/preemption detection: SIGTERM (Cloud TPU maintenance
        events / spot preemption) triggers a checkpoint before exit — the
        reference has no recovery beyond resume_from_checkpoint
        (SURVEY.md §5)."""
        import signal

        def handler(signum, frame):
            self._preempted = True

        try:
            signal.signal(signal.SIGTERM, handler)
        except ValueError:
            pass  # non-main thread

    def _save_checkpoint(self, wait: Optional[bool] = None):
        """Persist TrainState and, when enabled, the EMA shadow (which would
        otherwise silently reset to fresh weights on resume). Cadence saves
        run asynchronously when `training.async_checkpointing` is set (the
        Orbax snapshot happens up front; training overlaps the disk flush);
        preemption/final saves always wait."""
        payload = (
            {"train": self.state, "ema": self.ema_state}
            if self.ema_state is not None else self.state
        )
        if wait is None:
            wait = not bool(
                self.cfg.get_path("training.async_checkpointing", False)
            )
        self.ckpt.save(self.global_step, payload, wait=wait)

    def resume(self):
        template = (
            {"train": self.state, "ema": self.ema_state}
            if self.ema_state is not None else self.state
        )
        restored, step = self.ckpt.restore(template)
        if restored is not None:
            if self.ema_state is not None:
                self.state = restored["train"]
                self.ema_state = restored["ema"]
            else:
                self.state = restored
            self.global_step = step
            logger.info("resumed from step %d", step)

    def fit(self, loader: Iterator[dict], rng_seed: int = 0):
        batch_meter, data_meter = AverageMeter(), AverageMeter()
        end = time.time()
        key = jax.random.key(rng_seed)
        self._install_preemption_handler()
        profile_at = self.cfg.get_path("experiment.profile_at_step")
        profile_dir = self.cfg.get_path(
            "experiment.profile_dir",
            os.path.join(self.cfg.get_path("experiment.output_dir", "output"),
                         "profile"),
        )
        for raw in loader:
            if self.global_step >= self.max_train_steps:
                break
            if self._preempted:
                logger.warning("preemption: saving checkpoint and stopping")
                self._save_checkpoint(wait=True)
                break
            if profile_at is not None and self.global_step == profile_at:
                jax.profiler.start_trace(profile_dir)
            if profile_at is not None and self.global_step == profile_at + 3:
                jax.profiler.stop_trace()
                logger.info("profile trace written to %s", profile_dir)
            batch = self.prepare_batch(raw)
            data_meter.update(time.time() - end)
            key, sub = jax.random.split(key)
            self.state, metrics = self.train_step(self.state, batch, sub)
            if self.ema_state is not None:
                self.ema_state = self._ema_update(
                    self.ema_state, self.state.params
                )
            self.global_step += 1
            batch_meter.update(time.time() - end)
            end = time.time()

            if self.global_step % self.log_every == 0:
                vals = {k: float(v) for k, v in metrics.items()}
                total_batch = (
                    self.step_cfg.batch_size_t2i
                    + self.step_cfg.batch_size_lm
                    + self.step_cfg.batch_size_mmu
                )
                vals.update(
                    step=self.global_step,
                    samples_per_sec=total_batch / max(batch_meter.avg, 1e-9),
                    data_time=data_meter.avg,
                    batch_time=batch_meter.avg,
                )
                self.metrics.log(vals)
                logger.info(
                    "step %d loss %.4f (t2i %.4f lm %.4f mmu %.4f) %.1f samp/s",
                    self.global_step, vals["loss"], vals["loss_t2i"],
                    vals["loss_lm"], vals["loss_mmu"], vals["samples_per_sec"],
                )
            if self.save_every and self.global_step % self.save_every == 0:
                self._save_checkpoint()
            if (
                self.generate_every
                and self.global_step % self.generate_every == 0
            ):
                self._run_validation_hooks()
                self._maybe_visualize_predictions(raw)
        if (
            profile_at is not None
            and profile_at <= self.global_step < profile_at + 3
        ):
            # loop exited inside the profiling window — flush the trace
            jax.profiler.stop_trace()
            logger.info("profile trace written to %s", profile_dir)
        self.ckpt.finalize()  # land any in-flight async save before exit
        return self.state

    def _run_validation_hooks(self):
        """Cadence generations (train_mmada.py:698-730): t2i from the
        validation prompts file + chat QA when configured. Failures are
        logged, never fatal to training."""
        from mmada_tpu.training import validation as V

        out_dir = self.cfg.get_path("experiment.output_dir", "output")
        model = dataclasses.replace(self.model, params=self.state.params)
        try:
            prompts_file = self.cfg.get_path(
                "dataset.params.validation_prompts_file"
            )
            if prompts_file and os.path.exists(prompts_file) and self.vq_params:
                with open(prompts_file) as f:
                    prompts = [ln.strip() for ln in f if ln.strip()][:4]
                V.generate_images(
                    model, self.vq_params, self.vq_cfg, self.prompting,
                    prompts, out_dir, self.global_step,
                    num_vq_tokens=self.cfg.get_path(
                        "model.mmada.num_vq_tokens", 1024
                    ),
                    timesteps=self.cfg.get_path(
                        "training.generation_timesteps", 12
                    ),
                    guidance_scale=self.cfg.get_path(
                        "training.guidance_scale", 1.5
                    ),
                )
        except Exception:
            logger.exception("generate_images validation hook failed")
        try:
            mmu_dir = self.cfg.get_path(
                "dataset.params.mmu_validation_dir", "mmu_validation"
            )
            prompts_path = os.path.join(mmu_dir, "prompts.jsonl")
            if os.path.exists(prompts_path) and self.vq_params:
                self._run_understanding_hook(model, mmu_dir, prompts_path)
        except Exception:
            logger.exception("understanding_images validation hook failed")
        try:
            chat_path = self.cfg.get_path(
                "dataset.params.lm_chat_validation_file",
                os.path.join("lm_chat_validation", "questions.jsonl"),
            )
            if os.path.exists(chat_path):
                import json as _json

                questions = []
                with open(chat_path) as f:
                    for ln in f:
                        if ln.strip():
                            rec = _json.loads(ln)
                            questions.append(
                                rec.get("question") or rec.get("prompt") or ""
                            )
                if questions:
                    V.generate_chat_text(
                        model, self.prompting.text_tokenizer, questions[:4],
                        out_dir, self.global_step,
                        gen_length=self.cfg.get_path(
                            "training.validation_max_new_tokens", 32
                        ),
                        steps=self.cfg.get_path("training.validation_steps", 16),
                        block_length=self.cfg.get_path(
                            "training.validation_max_new_tokens", 32
                        ),
                    )
        except Exception:
            logger.exception("generate_chat_text validation hook failed")

    def _maybe_visualize_predictions(self, raw_batch: dict):
        """Original vs VQ-recon vs model-prediction triptychs from the
        CURRENT training batch's images (train_mmada.py:750-795) — runs on
        the generate_every cadence alongside the other hooks."""
        from mmada_tpu.training import validation as V

        images = raw_batch.get("t2i_flow", {}).get("images")
        if images is None or not self.vq_params:
            return
        try:
            model = dataclasses.replace(self.model, params=self.state.params)
            imgs = np.asarray(images)[:2]
            V.visualize_predictions(
                model, self.vq_params, self.vq_cfg, self.prompting,
                imgs, [""] * imgs.shape[0],
                self.cfg.get_path("experiment.output_dir", "output"),
                self.global_step,
            )
        except Exception:
            logger.exception("visualize_predictions validation hook failed")

    def _run_understanding_hook(self, model, mmu_dir, prompts_path):
        """Caption the task-typed validation images with their per-image
        questions (train_mmada.py:872-932 + mmu_validation fixtures)."""
        import json as _json

        import numpy as np
        from PIL import Image

        from mmada_tpu.data.transforms import image_transform
        from mmada_tpu.training import validation as V

        res = self.cfg.get_path("dataset.preprocessing.resolution", 256)
        entries = []
        with open(prompts_path) as f:
            for ln in f:
                if ln.strip():
                    entries.append(_json.loads(ln))
        images, questions = [], []
        for e in entries[:8]:
            path = os.path.join(mmu_dir, e.get("file_name", ""))
            if not os.path.exists(path):
                continue
            images.append(image_transform(Image.open(path), res))
            questions.append(e["prompt"])
        if not images:
            return
        V.understanding_images(
            model, self.vq_params, self.vq_cfg, self.prompting,
            self.prompting.text_tokenizer, np.stack(images), questions,
            self.cfg.get_path("experiment.output_dir", "output"),
            self.global_step,
            max_new_tokens=self.cfg.get_path(
                "training.validation_max_new_tokens", 32
            ),
            steps=self.cfg.get_path("training.validation_steps", 16),
        )


def _pad_flows_to_common_length(batch: dict, eos_id: int) -> dict:
    seq_keys = [k for k in batch if k.endswith(("input_ids", "labels", "masks", "prompt_masks"))]
    if not seq_keys:
        return batch
    max_len = max(batch[k].shape[1] for k in seq_keys)
    out = dict(batch)
    for k in seq_keys:
        arr = batch[k]
        if arr.shape[1] == max_len:
            continue
        pad_width = max_len - arr.shape[1]
        if k.endswith("labels"):
            fill = L.IGNORE_ID
        elif k.endswith(("masks", "prompt_masks")):
            fill = 1 if "prompt" in k else 0
        else:
            fill = eos_id
        out[k] = jnp.pad(arr, ((0, 0), (0, pad_width)), constant_values=fill)
    return out
