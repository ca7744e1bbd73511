"""Import MAGVIT-v2 (showlab/magvitv2) torch weights into the JAX pytree.

Checkpoint layout follows the reference module tree
(models/modeling_magvitv2.py): `encoder.*`, `decoder.*`, `quantize.*`
(the LFQ has only constant buffers — nothing to load). Conv kernels convert
OIHW → HWIO for NHWC TPU convolutions.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from mmada_tpu.models.magvit2 import VQGANConfig

Params = dict[str, Any]


def _convert_leaf(key: str, value: np.ndarray):
    if key.endswith(".weight") and value.ndim == 4:
        return "w", value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
    if key.endswith(".weight"):
        return "w", value
    if key.endswith(".bias"):
        return "b", value
    return None


def _set_path(tree: Params, parts: list, leaf_name: str, value):
    node = tree
    for part in parts:
        if part.isdigit():
            part = int(part)
            while len(node) <= part if isinstance(node, list) else False:
                node.append({})
            if isinstance(node, list):
                node = node[part]
                continue
        if isinstance(node, list):
            node = node[int(part)]
            continue
        node = node.setdefault(part, {})
    node[leaf_name] = value


def _component_from_state(
    state: Mapping[str, np.ndarray],
    n_levels: int,
    num_res_blocks,
    dtype,
    is_encoder: bool,
) -> Params:
    out: Params = {}
    levels_key = "down" if is_encoder else "up"
    levels = [
        {"block": [dict() for _ in range(num_res_blocks[i])], "attn": []}
        for i in range(n_levels)
    ]
    for key, value in state.items():
        conv = _convert_leaf(key, np.asarray(value))
        if conv is None:
            continue
        leaf_name, arr = conv
        arr = jnp.asarray(arr, dtype)
        parts = key.split(".")[:-1]  # drop weight/bias
        if parts[0] == levels_key:
            lvl = int(parts[1])
            kind = parts[2]
            if kind == "block":
                idx, rest = int(parts[3]), parts[4:]
                node = levels[lvl]["block"][idx]
                for p in rest:
                    node = node.setdefault(p, {})
                node[leaf_name] = arr
            elif kind == "attn":
                idx, rest = int(parts[3]), parts[4:]
                while len(levels[lvl]["attn"]) <= idx:
                    levels[lvl]["attn"].append({})
                node = levels[lvl]["attn"][idx]
                for p in rest:
                    node = node.setdefault(p, {})
                node[leaf_name] = arr
            elif kind in ("downsample", "upsample"):
                node = levels[lvl].setdefault(kind, {})
                for p in parts[3:]:
                    node = node.setdefault(p, {})
                node[leaf_name] = arr
        else:
            node = out
            for p in parts:
                node = node.setdefault(p, {})
            node[leaf_name] = arr
    out[levels_key] = levels
    return out


def magvit2_params_from_torch(
    encoder_state: Mapping[str, np.ndarray],
    decoder_state: Mapping[str, np.ndarray],
    cfg: VQGANConfig,
    dtype=jnp.float32,
) -> Params:
    return {
        "encoder": _component_from_state(
            encoder_state, cfg.num_levels, cfg.enc_num_res_blocks, dtype, True
        ),
        "decoder": _component_from_state(
            decoder_state, len(cfg.dec_ch_mult), cfg.dec_num_res_blocks, dtype, False
        ),
    }


def magvit2_params_from_fused_state(
    state: Mapping[str, np.ndarray], cfg: VQGANConfig, dtype=jnp.float32
) -> Params:
    """Split a fused `MAGVITv2` state dict (keys `encoder.*` / `decoder.*`,
    the save format of the reference wrapper) and convert."""
    enc = {k[len("encoder."):]: v for k, v in state.items() if k.startswith("encoder.")}
    dec = {k[len("decoder."):]: v for k, v in state.items() if k.startswith("decoder.")}
    return magvit2_params_from_torch(enc, dec, cfg, dtype)


def load_magvit2(model_dir: str, cfg: VQGANConfig, dtype=jnp.bfloat16) -> Params:
    from mmada_tpu.checkpoints.hf_import import iter_safetensors

    state = dict(iter_safetensors(model_dir))
    return magvit2_params_from_fused_state(state, cfg, dtype)
