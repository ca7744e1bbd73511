"""Checkpoint save/restore with rotation and resume-latest.

Reference behavior (training/train_mmada.py:404-436, 935-973): checkpoints
land in `{output_dir}/checkpoint-{step}/` with a `metadata.json` carrying
the global step; `checkpoints_total_limit` rotates the oldest out;
`resume_from_checkpoint: latest` scans for the newest `checkpoint-*`.
The reference explicitly does NOT restore optimizer/scheduler/dataloader
state (train_mmada.py:261-263) — we do better and checkpoint the full
TrainState (params + optimizer state + step) through Orbax, which handles
sharded arrays natively (ZeRO-3-gather analog of
`accelerator.get_state_dict`). `save_params_only` reproduces the
reference's `unwrapped_model` export for interop.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"checkpoint-(\d+)$")


def _item_path(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, f"checkpoint-{step}")


def list_checkpoints(output_dir: str) -> list[tuple[int, str]]:
    if not os.path.isdir(output_dir):
        return []
    out = []
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if not m:
            continue
        path = os.path.join(output_dir, name)
        # metadata.json is written only once the (possibly async) Orbax
        # flush completes — a directory without it is in-flight or torn
        # and must be invisible to resume/rotation
        if os.path.exists(os.path.join(path, "metadata.json")):
            out.append((int(m.group(1)), path))
    return sorted(out)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    ckpts = list_checkpoints(output_dir)
    return ckpts[-1][1] if ckpts else None


class CheckpointManager:
    def __init__(self, output_dir: str, total_limit: Optional[int] = None):
        self.output_dir = os.path.abspath(output_dir)
        self.total_limit = total_limit
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------- save
    def save(self, step: int, state: Any,
             extra_metadata: Optional[dict] = None, wait: bool = True):
        """Write checkpoint-{step}. With `wait=False` the Orbax write
        happens asynchronously (device arrays are snapshotted up front, so
        training continues while the host flushes to disk — the TPU-native
        answer to checkpoint stalls at 8B scale); the next save/finalize
        blocks on the previous one first. metadata.json is written only on
        completion, so a half-flushed directory is never resumable."""
        self.finalize()  # at most one in-flight save
        path = _item_path(self.output_dir, step)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(os.path.join(path, "state"), state)
        meta = {"global_step": int(step)}
        if extra_metadata:
            meta.update(extra_metadata)

        def complete():
            with open(os.path.join(path, "metadata.json"), "w") as f:
                json.dump(meta, f)
            self._rotate()

        if wait:
            self._ckptr.wait_until_finished()
            complete()
        else:
            self._pending = complete
        return path

    def finalize(self):
        """Block until any in-flight async save has landed."""
        pending = getattr(self, "_pending", None)
        if pending is not None:
            self._ckptr.wait_until_finished()
            self._pending = None
            pending()

    def _rotate(self):
        if self.total_limit is None:
            return
        ckpts = list_checkpoints(self.output_dir)
        while len(ckpts) > self.total_limit:
            _, path = ckpts.pop(0)
            shutil.rmtree(path, ignore_errors=True)

    # ---------------------------------------------------------- restore
    def restore(self, state_template: Any, step: Optional[int] = None):
        """Restore into the structure/shardings of `state_template`.
        Returns (state, global_step) or (None, 0) when nothing exists."""
        self.finalize()
        if step is None:
            path = latest_checkpoint(self.output_dir)
            if path is None:
                return None, 0
        else:
            path = _item_path(self.output_dir, step)
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        restored = self._ckptr.restore(
            os.path.join(path, "state"), state_template
        )
        return restored, int(meta["global_step"])


def save_params_only(path: str, params: Any):
    """Export bare params (the reference's `unwrapped_model` safetensors
    analog) for serving/eval jobs."""
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def load_params_only(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def export_hf_config(model_dir: str, cfg, vocab=None):
    """Write a reference-compatible `config.json` next to exported
    safetensors so `MMadaModelLM.from_pretrained` can consume checkpoints
    trained here (inverse of hf_import.config_from_hf_json)."""
    raw = {
        "architectures": ["MMadaModelLM"],
        "model_type": "mmada",
        "d_model": cfg.d_model,
        "n_heads": cfg.n_heads,
        "n_kv_heads": cfg.n_kv_heads,
        "n_layers": cfg.n_layers,
        "mlp_hidden_size": cfg.mlp_hidden_size,
        "mlp_ratio": cfg.mlp_ratio,
        "vocab_size": cfg.vocab_size,
        "embedding_size": cfg.effective_vocab_size,
        "max_sequence_length": cfg.max_sequence_length,
        "rope": True,
        "rope_theta": cfg.rope_theta,
        "rope_full_precision": cfg.rope_full_precision,
        "layer_norm_type": cfg.layer_norm_type,
        "rms_norm_eps": cfg.rms_norm_eps,
        "activation_type": cfg.activation_type,
        "block_type": cfg.block_type,
        "weight_tying": cfg.weight_tying,
        "include_bias": cfg.include_bias,
        "include_qkv_bias": cfg.include_qkv_bias,
        "attention_layer_norm": cfg.attention_layer_norm,
        "input_emb_norm": cfg.input_emb_norm,
        "scale_logits": cfg.scale_logits,
        "mask_token_id": cfg.mask_token_id,
        "alibi": False,
        "use_cache": False,
        "block_group_size": 1,
    }
    if vocab is not None:
        raw.update(
            new_vocab_size=vocab.total_vocab_size,
            llm_vocab_size=vocab.text_vocab_size,
            codebook_size=vocab.image_codebook_size,
        )
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(raw, f, indent=2)


def export_safetensors(path: str, params: Any, cfg=None):
    """Write params as a torch-convention safetensors file so reference
    tooling can consume checkpoints trained here (name mapping inverse of
    checkpoints/hf_import.py)."""
    from safetensors.numpy import save_file

    flat: dict[str, np.ndarray] = {}

    def to_np(x):
        return np.asarray(jax.device_get(x))

    def finalize(d):
        # safetensors silently serializes the raw buffer of non-contiguous
        # arrays (transposed views keep their shape but lose the transpose)
        return {k: np.ascontiguousarray(v) for k, v in d.items()}

    flat["model.transformer.wte.weight"] = to_np(params["wte"])
    flat["model.transformer.ln_f.weight"] = to_np(params["ln_f"])
    if "ff_out" in params:
        flat["model.transformer.ff_out.weight"] = to_np(params["ff_out"]).T
    for name, stacked in params["blocks"].items():
        arr = to_np(stacked)
        for layer in range(arr.shape[0]):
            if name.endswith("_bias"):
                key = f"model.transformer.blocks.{layer}.{name[:-5]}.bias"
                flat[key] = arr[layer]
            elif arr.ndim == 3:
                key = f"model.transformer.blocks.{layer}.{name}.weight"
                flat[key] = arr[layer].T
            else:
                key = f"model.transformer.blocks.{layer}.{name}.weight"
                flat[key] = arr[layer]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file(finalize(flat), path)
