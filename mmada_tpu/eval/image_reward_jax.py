"""JAX rebuild of ImageReward (BLIP backbone + MLP reward head).

The reference's stage-4 eval loads the ImageReward model
(train_mmada_stage4.py:1008-1115, `RM.load("ImageReward-v1.0")`) to score
generated images against their prompts. Its architecture: a BLIP
image-text backbone — ViT vision encoder + BERT-style text encoder whose
every layer cross-attends to the vision features — with the pooled [CLS]
text feature fed to a 5-layer MLP producing a scalar reward, z-normalized
by fixed constants.

Rebuilt with `transformers.BlipForImageTextRetrieval` numerics (the same
BLIP family; golden-tested at random init in tests/test_image_quality.py,
the `eval/t2m_evaluator.py` treatment). Both towers scan over stacked
layers. Two weight layouts load:

  * `from_blip_torch_state` — transformers Blip* naming (golden source);
  * `from_imagereward_state` — the ImageReward checkpoint's own naming
    (`blip.visual_encoder.*` timm-ViT / `blip.text_encoder.*` med-BERT /
    `mlp.layers.*`), untestable without weights in this zero-egress
    environment but structured for mount day.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# z-normalization constants from the ImageReward repo (ImageReward.py);
# overridable at call time should a checkpoint revision change them
REWARD_MEAN = 0.16717362830052426
REWARD_STD = 1.0333394966054072


@dataclasses.dataclass(frozen=True)
class BlipRewardConfig:
    text_hidden: int
    text_intermediate: int
    text_layers: int
    text_heads: int
    vision_hidden: int
    vision_intermediate: int
    vision_layers: int
    vision_heads: int
    image_size: int = 224
    patch_size: int = 16
    vocab_size: int = 30524
    max_positions: int = 512
    layer_norm_eps: float = 1e-12
    vision_eps: float = 1e-5

    @classmethod
    def from_hf(cls, hf_cfg) -> "BlipRewardConfig":
        d = hf_cfg if isinstance(hf_cfg, dict) else hf_cfg.to_dict()
        t, v = d["text_config"], d["vision_config"]
        return cls(
            text_hidden=t["hidden_size"],
            text_intermediate=t["intermediate_size"],
            text_layers=t["num_hidden_layers"],
            text_heads=t["num_attention_heads"],
            vision_hidden=v["hidden_size"],
            vision_intermediate=v["intermediate_size"],
            vision_layers=v["num_hidden_layers"],
            vision_heads=v["num_attention_heads"],
            image_size=v["image_size"], patch_size=v["patch_size"],
            vocab_size=t["vocab_size"],
            max_positions=t["max_position_embeddings"],
            layer_norm_eps=t.get("layer_norm_eps", 1e-12),
            vision_eps=v.get("layer_norm_eps", 1e-5),
        )


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _attend(q, k, v, n_heads: int, mask: Optional[jax.Array]) -> jax.Array:
    """(B, Lq, D) x (B, Lk, Dk) multi-head attention core."""
    b, lq, d = q.shape
    lk = k.shape[1]
    hd = d // n_heads

    def split(h, l):
        return h.reshape(b, l, n_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, lq), split(k, lk), split(v, lk)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    if mask is not None:
        s = s + mask
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, lq, d)


# ------------------------------------------------------------------ vision

def vision_forward(params: Params, cfg: BlipRewardConfig,
                   pixel_values: jax.Array) -> jax.Array:
    """BLIP ViT: patch embed (+bias), [CLS], learned positions, pre-LN
    blocks with fused qkv, post-LN. Returns (B, 1+N, D) image embeddings
    (the text encoder cross-attends to ALL tokens, not a pooled vector)."""
    p = params["vision"]
    b = pixel_values.shape[0]
    ps = cfg.patch_size
    g = cfg.image_size // ps
    patches = pixel_values.reshape(b, 3, g, ps, g, ps)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, -1)
    x = patches @ p["patch_w"] + p["patch_b"]
    cls = jnp.broadcast_to(p["cls"], (b, 1, cfg.vision_hidden)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_emb"]

    heads, eps = cfg.vision_heads, cfg.vision_eps

    def body(h, lp):
        a = _ln(h, lp["ln1_w"], lp["ln1_b"], eps)
        qkv = a @ lp["qkv_w"] + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        att = _attend(q, k, v, heads, mask=None)
        h = h + (att @ lp["proj_w"] + lp["proj_b"])
        m = _ln(h, lp["ln2_w"], lp["ln2_b"], eps)
        m = jax.nn.gelu(m @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        h = h + (m @ lp["fc2_w"] + lp["fc2_b"])
        return h, None

    x, _ = jax.lax.scan(body, x, p["layers"])
    return _ln(x, p["post_ln_w"], p["post_ln_b"], eps)


# -------------------------------------------------------------------- text

def text_forward(params: Params, cfg: BlipRewardConfig,
                 input_ids: jax.Array,
                 image_embeds: jax.Array,
                 attention_mask: Optional[jax.Array] = None) -> jax.Array:
    """BLIP med-BERT text encoder: post-LN self-attention + per-layer
    cross-attention over the vision tokens + post-LN FFN. Returns the full
    last hidden state (B, L, D); the reward pools [:, 0]."""
    p = params["text"]
    l = input_ids.shape[1]
    x = p["word_emb"][input_ids] + p["pos_emb"][:l]
    x = _ln(x, p["emb_ln_w"], p["emb_ln_b"], cfg.layer_norm_eps)

    mask = None
    if attention_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * neg

    heads, eps = cfg.text_heads, cfg.layer_norm_eps

    def body(h, lp):
        q = h @ lp["sa_q_w"] + lp["sa_q_b"]
        k = h @ lp["sa_k_w"] + lp["sa_k_b"]
        v = h @ lp["sa_v_w"] + lp["sa_v_b"]
        att = _attend(q, k, v, heads, mask)
        h = _ln(att @ lp["sa_o_w"] + lp["sa_o_b"] + h,
                lp["sa_ln_w"], lp["sa_ln_b"], eps)
        q = h @ lp["ca_q_w"] + lp["ca_q_b"]
        k = image_embeds @ lp["ca_k_w"] + lp["ca_k_b"]
        v = image_embeds @ lp["ca_v_w"] + lp["ca_v_b"]
        att = _attend(q, k, v, heads, mask=None)
        h = _ln(att @ lp["ca_o_w"] + lp["ca_o_b"] + h,
                lp["ca_ln_w"], lp["ca_ln_b"], eps)
        m = jax.nn.gelu(h @ lp["fc1_w"] + lp["fc1_b"], approximate=False)
        h = _ln(m @ lp["fc2_w"] + lp["fc2_b"] + h,
                lp["ffn_ln_w"], lp["ffn_ln_b"], eps)
        return h, None

    x, _ = jax.lax.scan(body, x, p["layers"])
    return x


def rewards(params: Params, cfg: BlipRewardConfig, pixel_values, input_ids,
            attention_mask=None, mean: float = REWARD_MEAN,
            std: float = REWARD_STD) -> jax.Array:
    """ImageReward scores: BLIP cross-modal [CLS] feature → MLP → scalar,
    z-normalized ((r - mean) / std, the repo's fixed constants)."""
    img = vision_forward(params, cfg, pixel_values)
    txt = text_forward(params, cfg, input_ids, img, attention_mask)
    h = txt[:, 0]
    for i, (w, b) in enumerate(params["mlp"]):
        h = h @ w + b
    return (h[:, 0] - mean) / std


# --------------------------------------------------------------- converters

def _t(state: Mapping, key: str) -> np.ndarray:
    v = state[key]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _stack(state: Mapping, fmt: str, n: int, transpose: bool) -> jnp.ndarray:
    mats = [_t(state, fmt.format(i)) for i in range(n)]
    if transpose:
        mats = [m.T for m in mats]
    return jnp.asarray(np.stack(mats))


_BLIP_TEXT = {
    "sa_q_w": ("attention.self.query.weight", True),
    "sa_q_b": ("attention.self.query.bias", False),
    "sa_k_w": ("attention.self.key.weight", True),
    "sa_k_b": ("attention.self.key.bias", False),
    "sa_v_w": ("attention.self.value.weight", True),
    "sa_v_b": ("attention.self.value.bias", False),
    "sa_o_w": ("attention.output.dense.weight", True),
    "sa_o_b": ("attention.output.dense.bias", False),
    "sa_ln_w": ("attention.output.LayerNorm.weight", False),
    "sa_ln_b": ("attention.output.LayerNorm.bias", False),
    "ca_q_w": ("crossattention.self.query.weight", True),
    "ca_q_b": ("crossattention.self.query.bias", False),
    "ca_k_w": ("crossattention.self.key.weight", True),
    "ca_k_b": ("crossattention.self.key.bias", False),
    "ca_v_w": ("crossattention.self.value.weight", True),
    "ca_v_b": ("crossattention.self.value.bias", False),
    "ca_o_w": ("crossattention.output.dense.weight", True),
    "ca_o_b": ("crossattention.output.dense.bias", False),
    "ca_ln_w": ("crossattention.output.LayerNorm.weight", False),
    "ca_ln_b": ("crossattention.output.LayerNorm.bias", False),
    "fc1_w": ("intermediate.dense.weight", True),
    "fc1_b": ("intermediate.dense.bias", False),
    "fc2_w": ("output.dense.weight", True),
    "fc2_b": ("output.dense.bias", False),
    "ffn_ln_w": ("output.LayerNorm.weight", False),
    "ffn_ln_b": ("output.LayerNorm.bias", False),
}

_BLIP_VISION = {
    "qkv_w": ("self_attn.qkv.weight", True),
    "qkv_b": ("self_attn.qkv.bias", False),
    "proj_w": ("self_attn.projection.weight", True),
    "proj_b": ("self_attn.projection.bias", False),
    "ln1_w": ("layer_norm1.weight", False),
    "ln1_b": ("layer_norm1.bias", False),
    "fc1_w": ("mlp.fc1.weight", True),
    "fc1_b": ("mlp.fc1.bias", False),
    "fc2_w": ("mlp.fc2.weight", True),
    "fc2_b": ("mlp.fc2.bias", False),
    "ln2_w": ("layer_norm2.weight", False),
    "ln2_b": ("layer_norm2.bias", False),
}


def from_blip_torch_state(state: Mapping, cfg: BlipRewardConfig,
                          mlp_state: Optional[Mapping] = None,
                          dtype=jnp.float32) -> Params:
    """transformers `BlipForImageTextRetrieval` naming (the golden source).
    `mlp_state` optionally supplies `layers.{i}.weight/bias` for the reward
    head; absent, a 1-layer identity-ish head is synthesized so the
    backbone can be exercised alone."""
    text = {
        "word_emb": _t(state, "text_encoder.embeddings.word_embeddings.weight"),
        "pos_emb": _t(state, "text_encoder.embeddings.position_embeddings.weight"),
        "emb_ln_w": _t(state, "text_encoder.embeddings.LayerNorm.weight"),
        "emb_ln_b": _t(state, "text_encoder.embeddings.LayerNorm.bias"),
        "layers": {
            ours: _stack(state, f"text_encoder.encoder.layer.{{}}.{theirs}"
                         .replace("{}", "{0}"), cfg.text_layers, tr)
            for ours, (theirs, tr) in _BLIP_TEXT.items()
        },
    }
    vision = {
        "cls": _t(state, "vision_model.embeddings.class_embedding")
               .reshape(cfg.vision_hidden),
        "pos_emb": _t(state, "vision_model.embeddings.position_embedding")[0],
        "patch_w": _t(state, "vision_model.embeddings.patch_embedding.weight")
                   .reshape(cfg.vision_hidden, -1).T,
        "patch_b": _t(state, "vision_model.embeddings.patch_embedding.bias"),
        "post_ln_w": _t(state, "vision_model.post_layernorm.weight"),
        "post_ln_b": _t(state, "vision_model.post_layernorm.bias"),
        "layers": {
            ours: _stack(state, f"vision_model.encoder.layers.{{0}}.{theirs}",
                         cfg.vision_layers, tr)
            for ours, (theirs, tr) in _BLIP_VISION.items()
        },
    }
    mlp = _mlp_from_state(mlp_state) if mlp_state else [
        (np.zeros((cfg.text_hidden, 1), np.float32),
         np.zeros((1,), np.float32)),
    ]
    params = {"text": text, "vision": vision,
              "mlp": [(jnp.asarray(w), jnp.asarray(b)) for w, b in mlp]}

    def cast(x):
        a = jnp.asarray(x)
        return a.astype(dtype) if a.dtype.kind == "f" else a

    return jax.tree.map(cast, params)


def _mlp_from_state(mlp_state: Mapping):
    """`layers.{i}.weight/bias` (the ImageReward MLP: 1024→128→64→16→1
    linear stack; Dropout layers hold no parameters and are inference
    no-ops)."""
    idx = sorted({int(m.group(1)) for k in mlp_state
                  if (m := re.match(r"(?:mlp\.)?layers\.(\d+)\.weight", k))})
    out = []
    for i in idx:
        prefix = f"mlp.layers.{i}" if f"mlp.layers.{i}.weight" in mlp_state \
            else f"layers.{i}"
        out.append((_t(mlp_state, f"{prefix}.weight").T,
                    _t(mlp_state, f"{prefix}.bias")))
    return out


def from_imagereward_state(state: Mapping, cfg: BlipRewardConfig,
                           dtype=jnp.float32) -> Params:
    """The ImageReward checkpoint's own naming: `blip.visual_encoder.*` is
    a timm-style ViT (fused qkv, `norm1/norm2`, `mlp.fc1/fc2`, `patch_embed
    .proj`, `cls_token`, separate `pos_embed`), `blip.text_encoder.*`
    matches the transformers med-BERT naming above, `mlp.layers.*` is the
    reward head. Exercised for real on mount day
    (tools/real_weight_harness.py stage 5c)."""
    tstate = {k[len("blip."):]: v for k, v in state.items()
              if k.startswith("blip.text_encoder.")}
    # text naming is identical to transformers' — reuse the table
    text = {
        "word_emb": _t(tstate, "text_encoder.embeddings.word_embeddings.weight"),
        "pos_emb": _t(tstate, "text_encoder.embeddings.position_embeddings.weight"),
        "emb_ln_w": _t(tstate, "text_encoder.embeddings.LayerNorm.weight"),
        "emb_ln_b": _t(tstate, "text_encoder.embeddings.LayerNorm.bias"),
        "layers": {
            ours: _stack(tstate, f"text_encoder.encoder.layer.{{0}}.{theirs}",
                         cfg.text_layers, tr)
            for ours, (theirs, tr) in _BLIP_TEXT.items()
        },
    }
    v = "blip.visual_encoder"
    vision = {
        "cls": _t(state, f"{v}.cls_token").reshape(cfg.vision_hidden),
        "pos_emb": _t(state, f"{v}.pos_embed")[0],
        "patch_w": _t(state, f"{v}.patch_embed.proj.weight")
                   .reshape(cfg.vision_hidden, -1).T,
        "patch_b": _t(state, f"{v}.patch_embed.proj.bias"),
        "post_ln_w": _t(state, f"{v}.norm.weight"),
        "post_ln_b": _t(state, f"{v}.norm.bias"),
        "layers": {},
    }
    timm_names = {
        "qkv_w": ("attn.qkv.weight", True),
        "qkv_b": ("attn.qkv.bias", False),
        "proj_w": ("attn.proj.weight", True),
        "proj_b": ("attn.proj.bias", False),
        "ln1_w": ("norm1.weight", False), "ln1_b": ("norm1.bias", False),
        "fc1_w": ("mlp.fc1.weight", True), "fc1_b": ("mlp.fc1.bias", False),
        "fc2_w": ("mlp.fc2.weight", True), "fc2_b": ("mlp.fc2.bias", False),
        "ln2_w": ("norm2.weight", False), "ln2_b": ("norm2.bias", False),
    }
    vision["layers"] = {
        ours: _stack(state, f"{v}.blocks.{{0}}.{theirs}",
                     cfg.vision_layers, tr)
        for ours, (theirs, tr) in timm_names.items()
    }
    mlp = _mlp_from_state({k: v for k, v in state.items()
                           if k.startswith("mlp.")})
    params = {"text": text, "vision": vision,
              "mlp": [(jnp.asarray(w), jnp.asarray(b)) for w, b in mlp]}

    def cast(x):
        a = jnp.asarray(x)
        return a.astype(dtype) if a.dtype.kind == "f" else a

    return jax.tree.map(cast, params)
