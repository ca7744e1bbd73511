"""JAX rebuild of CLIP (dual-tower ViT + text transformer).

The reference's stage-4 quality eval scores generated images with
torchmetrics' CLIPScore (train_mmada_stage4.py:1008-1115), which wraps
`transformers.CLIPModel`. Rebuilt here with the same numerics so the
score runs on-device next to the sampler instead of round-tripping pixels
to a host torch process — the same treatment `eval/t2m_evaluator.py` gave
the BiGRU evaluators (torch-exact golden at random init; weights drop in
via `from_torch_state` on mount day).

TPU notes: both towers are layer-stacked `lax.scan`s (one compiled block
regardless of depth, like models/llada.py); the patch embedding is a
reshape+matmul rather than a conv (non-overlapping stride=kernel patches
make the conv a plain dot — straight onto the MXU with no im2col).
Activation `quick_gelu` (x·σ(1.702x)) matches CLIP's default.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPTowerConfig:
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class CLIPJaxConfig:
    text: CLIPTowerConfig
    vision: CLIPTowerConfig
    projection_dim: int
    image_size: int = 224
    patch_size: int = 14
    vocab_size: int = 49408
    max_positions: int = 77
    eos_token_id: int = 2

    @classmethod
    def from_hf(cls, hf_cfg) -> "CLIPJaxConfig":
        """From a transformers.CLIPConfig (or its to_dict())."""
        d = hf_cfg if isinstance(hf_cfg, dict) else hf_cfg.to_dict()
        t, v = d["text_config"], d["vision_config"]

        def tower(c):
            return CLIPTowerConfig(
                hidden_size=c["hidden_size"],
                intermediate_size=c["intermediate_size"],
                num_layers=c["num_hidden_layers"],
                num_heads=c["num_attention_heads"],
                hidden_act=c.get("hidden_act", "quick_gelu"),
                layer_norm_eps=c.get("layer_norm_eps", 1e-5),
            )

        return cls(
            text=tower(t), vision=tower(v),
            projection_dim=d["projection_dim"],
            image_size=v["image_size"], patch_size=v["patch_size"],
            vocab_size=t["vocab_size"],
            max_positions=t["max_position_embeddings"],
            eos_token_id=t.get("eos_token_id", 2),
        )


def _act(name: str, x: jax.Array) -> jax.Array:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new"):
        return jax.nn.gelu(x, approximate=name == "gelu_new")
    raise ValueError(f"unknown activation {name}")


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _mha(lp, x, n_heads: int, mask: Optional[jax.Array]) -> jax.Array:
    """Pre-LN CLIP attention block body (post-LN residual add by caller).
    x: (B, L, D); mask: additive fp32 (B|1, 1, L, L) or None."""
    b, l, d = x.shape
    hd = d // n_heads

    def split(h):
        return h.reshape(b, l, n_heads, hd).transpose(0, 2, 1, 3)

    q = split(x @ lp["q_w"] + lp["q_b"]) * (hd ** -0.5)
    k = split(x @ lp["k_w"] + lp["k_b"])
    v = split(x @ lp["v_w"] + lp["v_b"])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    if mask is not None:
        s = s + mask
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, d)
    return o @ lp["o_w"] + lp["o_b"]


def _tower(cfg: CLIPTowerConfig, layers: Params, x: jax.Array,
           mask: Optional[jax.Array]) -> jax.Array:
    """Stacked pre-LN encoder via lax.scan over the layer axis."""

    def body(h, lp):
        a = _ln(h, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
        h = h + _mha(lp, a, cfg.num_heads, mask)
        m = _ln(h, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
        m = _act(cfg.hidden_act, m @ lp["fc1_w"] + lp["fc1_b"])
        h = h + (m @ lp["fc2_w"] + lp["fc2_b"])
        return h, None

    out, _ = jax.lax.scan(body, x, layers)
    return out


def text_features(params: Params, cfg: CLIPJaxConfig,
                  input_ids: jax.Array,
                  attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """transformers `CLIPModel.get_text_features` numerics: causal text
    tower, pooled at the FIRST eos position, projected (not normalized)."""
    p = params["text"]
    b, l = input_ids.shape
    x = p["tok_emb"][input_ids] + p["pos_emb"][:l]
    causal = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
    mask = causal[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf)
        mask = mask + pad
    h = _tower(cfg.text, p["layers"], x, mask)
    h = _ln(h, p["final_ln_w"], p["final_ln_b"], cfg.text.layer_norm_eps)
    if cfg.eos_token_id == 2:
        # transformers keeps CLIP's legacy pooling when eos_token_id == 2:
        # the ARGMAX of the token values (EOT is the largest id, 49407, in
        # the real vocab) rather than the first literal eos position
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eos_pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = h[jnp.arange(b), eos_pos]
    return pooled @ p["proj"]


def image_features(params: Params, cfg: CLIPJaxConfig,
                   pixel_values: jax.Array) -> jax.Array:
    """transformers `CLIPModel.get_image_features` numerics. pixel_values:
    (B, 3, H, W), already CLIP-normalized."""
    p = params["vision"]
    b = pixel_values.shape[0]
    ps = cfg.patch_size
    g = cfg.image_size // ps
    # non-overlapping conv == reshape + matmul (patch pixels flattened in
    # the conv-weight's (C, ph, pw) order)
    patches = pixel_values.reshape(b, 3, g, ps, g, ps)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, -1)
    x = patches @ p["patch"]
    cls = jnp.broadcast_to(p["cls"], (b, 1, cfg.vision.hidden_size))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + p["pos_emb"]
    x = _ln(x, p["pre_ln_w"], p["pre_ln_b"], cfg.vision.layer_norm_eps)
    h = _tower(cfg.vision, p["layers"], x, mask=None)
    pooled = _ln(h[:, 0], p["post_ln_w"], p["post_ln_b"],
                 cfg.vision.layer_norm_eps)
    return pooled @ p["proj"]


def clip_scores(params: Params, cfg: CLIPJaxConfig, pixel_values, input_ids,
                attention_mask=None) -> jax.Array:
    """torchmetrics CLIPScore: max(100·cos(img, txt), 0) per pair."""
    img = image_features(params, cfg, pixel_values)
    txt = text_features(params, cfg, input_ids, attention_mask)

    def norm(x):
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    return jnp.maximum(100.0 * (norm(img) * norm(txt)).sum(-1), 0.0)


# --------------------------------------------------------------- converters

def _t(state: Mapping, key: str) -> np.ndarray:
    v = state[key]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _tower_from_torch(state: Mapping, prefix: str, n_layers: int) -> Params:
    """Stack `{prefix}.encoder.layers.{i}` into scan-ready (L, ...) arrays;
    torch Linear weights (out, in) transpose to matmul (in, out)."""
    names = {
        "q_w": "self_attn.q_proj.weight", "q_b": "self_attn.q_proj.bias",
        "k_w": "self_attn.k_proj.weight", "k_b": "self_attn.k_proj.bias",
        "v_w": "self_attn.v_proj.weight", "v_b": "self_attn.v_proj.bias",
        "o_w": "self_attn.out_proj.weight", "o_b": "self_attn.out_proj.bias",
        "ln1_w": "layer_norm1.weight", "ln1_b": "layer_norm1.bias",
        "fc1_w": "mlp.fc1.weight", "fc1_b": "mlp.fc1.bias",
        "fc2_w": "mlp.fc2.weight", "fc2_b": "mlp.fc2.bias",
        "ln2_w": "layer_norm2.weight", "ln2_b": "layer_norm2.bias",
    }
    out: Params = {}
    for ours, theirs in names.items():
        mats = [_t(state, f"{prefix}.encoder.layers.{i}.{theirs}")
                for i in range(n_layers)]
        if ours.endswith("_w") and not ours.startswith("ln"):
            mats = [m.T for m in mats]
        out[ours] = jnp.asarray(np.stack(mats))
    return out


def from_torch_state(state: Mapping, cfg: CLIPJaxConfig,
                     dtype=jnp.float32) -> Params:
    """Convert a `transformers.CLIPModel` state_dict (the format CLIP
    checkpoints ship in) to this module's pytree."""
    params = {
        "text": {
            "tok_emb": _t(state, "text_model.embeddings.token_embedding.weight"),
            "pos_emb": _t(state, "text_model.embeddings.position_embedding.weight"),
            "layers": _tower_from_torch(state, "text_model",
                                        cfg.text.num_layers),
            "final_ln_w": _t(state, "text_model.final_layer_norm.weight"),
            "final_ln_b": _t(state, "text_model.final_layer_norm.bias"),
            "proj": _t(state, "text_projection.weight").T,
        },
        "vision": {
            "cls": _t(state, "vision_model.embeddings.class_embedding"),
            "patch": _t(state, "vision_model.embeddings.patch_embedding.weight")
                     .reshape(cfg.vision.hidden_size, -1).T,
            "pos_emb": _t(state, "vision_model.embeddings.position_embedding.weight"),
            "pre_ln_w": _t(state, "vision_model.pre_layrnorm.weight"),
            "pre_ln_b": _t(state, "vision_model.pre_layrnorm.bias"),
            "layers": _tower_from_torch(state, "vision_model",
                                        cfg.vision.num_layers),
            "post_ln_w": _t(state, "vision_model.post_layernorm.weight"),
            "post_ln_b": _t(state, "vision_model.post_layernorm.bias"),
            "proj": _t(state, "visual_projection.weight").T,
        },
        "logit_scale": _t(state, "logit_scale"),
    }

    def cast(x):
        a = jnp.asarray(x)
        return a.astype(dtype) if a.dtype.kind == "f" else a

    return jax.tree.map(cast, params)


def load_clip(clip_dir: str, dtype=jnp.float32):
    """(params, cfg) from a local transformers CLIP checkpoint directory
    (config.json + pytorch/safetensors weights) — the mount-day loader."""
    import json as _json
    import os

    with open(os.path.join(clip_dir, "config.json")) as f:
        cfg = CLIPJaxConfig.from_hf(_json.load(f))
    state = _load_state(clip_dir)
    return from_torch_state(state, cfg, dtype=dtype), cfg


def _load_state(model_dir: str) -> Mapping:
    import os

    if any(f.endswith(".safetensors") for f in os.listdir(model_dir)):
        from mmada_tpu.checkpoints.hf_import import iter_safetensors

        return dict(iter_safetensors(model_dir))
    import torch

    return torch.load(os.path.join(model_dir, "pytorch_model.bin"),
                      map_location="cpu", weights_only=True)
