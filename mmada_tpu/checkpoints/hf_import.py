"""Import MMaDA/LLaDA HuggingFace checkpoints into the JAX param pytree.

Checkpoint key layout (reference module tree, models/modeling_llada.py):

    model.transformer.wte.weight                     (V, D) embedding
    model.transformer.blocks.{i}.attn_norm.weight    (D,)
    model.transformer.blocks.{i}.q_proj.weight       (D, D)    [llama block]
    model.transformer.blocks.{i}.k_proj.weight       (KVH*hd, D)
    model.transformer.blocks.{i}.v_proj.weight       (KVH*hd, D)
    model.transformer.blocks.{i}.att_proj.weight     (D+2*KVH*hd, D) [sequential]
    model.transformer.blocks.{i}.attn_out.weight     (D, D)
    model.transformer.blocks.{i}.ff_norm.weight      (D,)
    model.transformer.blocks.{i}.ff_proj.weight      (F, D)
    model.transformer.blocks.{i}.up_proj.weight      (F, D)    [llama block]
    model.transformer.blocks.{i}.ff_out.weight       (D, F')
    model.transformer.ln_f.weight                    (D,)
    model.transformer.ff_out.weight                  (V, D)    [no weight tying]

Some checkpoints wrap blocks in groups (`block_groups.{g}.{j}.` when
config.block_group_size > 1, modeling_llada.py:968-1021); both spellings are
handled. Torch `nn.Linear` stores weights `(out, in)` — transposed here to
the `(in, out)` right-multiply convention. Per-layer tensors are stacked on
a leading `(n_layers, ...)` axis for the scan-based forward.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Iterable, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from mmada_tpu.models.llada import LLaDAConfig, Params

_BLOCK_RE = re.compile(
    r"(?:model\.)?transformer\.(?:blocks\.(\d+)|block_groups\.(\d+)\.(\d+))\.(.+)"
)


def _canon_layer(key: str, block_group_size: int) -> Optional[tuple[int, str]]:
    m = _BLOCK_RE.match(key)
    if not m:
        return None
    if m.group(1) is not None:
        return int(m.group(1)), m.group(4)
    g, j = int(m.group(2)), int(m.group(3))
    return g * block_group_size + j, m.group(4)


_LINEAR_2D = {
    "q_proj", "k_proj", "v_proj", "att_proj", "attn_out",
    "ff_proj", "up_proj", "ff_out",
}
_NORM_1D = {"attn_norm", "ff_norm", "q_norm", "k_norm"}


def params_from_torch_state_dict(
    state: Mapping[str, np.ndarray],
    cfg: LLaDAConfig,
    dtype: jnp.dtype = jnp.float32,
    block_group_size: int = 1,
) -> Params:
    """Build the stacked param pytree from a flat torch-style state dict
    (values as numpy arrays)."""
    n = cfg.n_layers
    per_layer: dict[str, list[Optional[np.ndarray]]] = {}
    top: dict[str, np.ndarray] = {}

    def strip(key: str) -> str:
        return key[len("model."):] if key.startswith("model.") else key

    for key, value in state.items():
        value = np.asarray(value)
        parsed = _canon_layer(key, block_group_size)
        if parsed is not None:
            layer, rest = parsed
            name, _, leaf = rest.partition(".")
            if leaf == "weight" and name in _LINEAR_2D:
                arr = value.T  # torch (out, in) -> (in, out)
            elif leaf == "weight" and name in _NORM_1D:
                arr = value
            elif leaf == "bias":
                name = f"{name}_bias" if name != "att_proj" else "att_proj_bias"
                arr = value
            else:
                continue
            per_layer.setdefault(name, [None] * n)[layer] = arr
            continue
        skey = strip(key)
        if skey == "transformer.wte.weight":
            top["wte"] = value
        elif skey == "transformer.ln_f.weight":
            top["ln_f"] = value
        elif skey == "transformer.ff_out.weight":
            top["ff_out"] = value.T

    blocks = {}
    for name, slices in per_layer.items():
        missing = [i for i, s in enumerate(slices) if s is None]
        if missing:
            raise ValueError(f"layers {missing} missing tensor {name!r}")
        blocks[name] = jnp.asarray(np.stack(slices), dtype)

    params: Params = {
        "wte": jnp.asarray(top["wte"], dtype),
        "ln_f": jnp.asarray(top["ln_f"], dtype),
        "blocks": blocks,
    }
    if not cfg.weight_tying:
        if "ff_out" not in top:
            raise ValueError("weight_tying=False but no transformer.ff_out.weight")
        params["ff_out"] = jnp.asarray(top["ff_out"], dtype)
    return params


def iter_safetensors(model_dir: str) -> Iterable[tuple[str, np.ndarray]]:
    """Stream tensors from a HF model dir (single or sharded safetensors,
    reference save layout train_mmada.py:935-973)."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        files = [
            f for f in sorted(os.listdir(model_dir)) if f.endswith(".safetensors")
        ]
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="np") as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


def load_pretrained(
    model_dir: str,
    cfg: LLaDAConfig,
    dtype: jnp.dtype = jnp.bfloat16,
    block_group_size: int = 1,
) -> Params:
    """Load LLaDA/MMaDA weights from a local HF checkpoint directory:
    safetensors (single or sharded) or `pytorch_model.bin` — the same two
    formats the reference resume path handles (train_mmada.py:404-434)."""
    has_st = os.path.exists(
        os.path.join(model_dir, "model.safetensors.index.json")
    ) or any(f.endswith(".safetensors") for f in os.listdir(model_dir))
    if has_st:
        state = dict(iter_safetensors(model_dir))
    else:
        bin_path = os.path.join(model_dir, "pytorch_model.bin")
        if not os.path.exists(bin_path):
            raise FileNotFoundError(
                f"no safetensors or pytorch_model.bin under {model_dir}"
            )
        import torch

        raw = torch.load(bin_path, map_location="cpu", weights_only=True)
        state = {k: v.float().numpy() for k, v in raw.items()}
    return params_from_torch_state_dict(
        state, cfg, dtype=dtype, block_group_size=block_group_size
    )


def config_from_hf_json(path_or_dict) -> LLaDAConfig:
    """Translate a HF `config.json` (LLaDAConfig/MMadaConfig fields) into
    the JAX `LLaDAConfig`."""
    if isinstance(path_or_dict, (str, os.PathLike)):
        with open(os.path.join(str(path_or_dict), "config.json")) as f:
            raw = json.load(f)
    else:
        raw = dict(path_or_dict)
    field_map = dict(
        d_model="d_model",
        n_heads="n_heads",
        n_kv_heads="n_kv_heads",
        n_layers="n_layers",
        mlp_hidden_size="mlp_hidden_size",
        mlp_ratio="mlp_ratio",
        vocab_size="vocab_size",
        embedding_size="embedding_size",
        max_sequence_length="max_sequence_length",
        rope_theta="rope_theta",
        rope_full_precision="rope_full_precision",
        layer_norm_type="layer_norm_type",
        rms_norm_eps="rms_norm_eps",
        activation_type="activation_type",
        block_type="block_type",
        weight_tying="weight_tying",
        include_bias="include_bias",
        include_qkv_bias="include_qkv_bias",
        attention_layer_norm="attention_layer_norm",
        input_emb_norm="input_emb_norm",
        scale_logits="scale_logits",
        mask_token_id="mask_token_id",
    )
    kwargs = {}
    for ours, theirs in field_map.items():
        if theirs in raw and raw[theirs] is not None:
            kwargs[ours] = raw[theirs]
    # new_vocab_size (MMadaConfig) supersedes vocab_size after embedding resize
    if raw.get("new_vocab_size"):
        kwargs["vocab_size"] = raw["new_vocab_size"]
        kwargs["embedding_size"] = raw["new_vocab_size"]
    return LLaDAConfig(**kwargs)
