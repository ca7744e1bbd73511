"""T2M evaluator models in JAX: BiGRU text/motion encoders + movement conv
encoder, with torch checkpoint import.

Rebuild of the reference evaluator stack (models/modules.py:13-109,
models/evaluator_wrapper.py:8-90) that produces the embeddings consumed by
eval/t2m_metrics.py. The pretrained weights ship as torch checkpoints
(`checkpoints/t2m/Comp_v6_KLD005/`, reference train_t2m.py:326-333);
`*_from_torch` convert their state dicts.

The GRU matches torch semantics exactly (gate order r,z,n; packed-sequence
behavior reproduced with length masks): forward-direction last hidden is
the state at each row's final valid step; backward-direction is the state
after scanning from the last valid step down to 0.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


# ----------------------------------------------------------------- GRU core

def gru_cell(x, h, w_ih, w_hh, b_ih, b_hh):
    """torch.nn.GRU cell: gates ordered (reset, update, new)."""
    gi = x @ w_ih.T + b_ih
    gh = h @ w_hh.T + b_hh
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def bigru_last(p: Params, x: jax.Array, lengths: jax.Array, h0: jax.Array):
    """Bidirectional GRU final hidden states.

    x: (B, T, D); lengths: (B,); h0: (2, 1, H) learned initial hidden
    (modules.py `self.hidden`). Returns (B, 2H): concat(fwd_last, bwd_last),
    matching `torch.cat([gru_last[0], gru_last[1]])` over packed sequences.
    """
    b, t, _ = x.shape
    h_f0 = jnp.broadcast_to(h0[0], (b, h0.shape[-1]))
    h_b0 = jnp.broadcast_to(h0[1], (b, h0.shape[-1]))

    def fwd_step(h, inp):
        x_t, idx = inp
        h_new = gru_cell(x_t, h, p["w_ih_f"], p["w_hh_f"], p["b_ih_f"], p["b_hh_f"])
        h = jnp.where((idx < lengths)[:, None], h_new, h)
        return h, None

    idxs = jnp.arange(t)
    h_fwd, _ = jax.lax.scan(fwd_step, h_f0, (x.transpose(1, 0, 2), idxs))

    def bwd_step(h, inp):
        x_t, idx = inp
        h_new = gru_cell(x_t, h, p["w_ih_b"], p["w_hh_b"], p["b_ih_b"], p["b_hh_b"])
        h = jnp.where((idx < lengths)[:, None], h_new, h)
        return h, None

    h_bwd, _ = jax.lax.scan(
        bwd_step, h_b0,
        (x[:, ::-1].transpose(1, 0, 2), idxs[::-1]),
    )
    return jnp.concatenate([h_fwd, h_bwd], axis=-1)


def _output_net(p: Params, x: jax.Array) -> jax.Array:
    """Linear → LayerNorm → LeakyReLU(0.2) → Linear (modules.py output_net)."""
    h = x @ p["fc1_w"].T + p["fc1_b"]
    mean = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    h = (h - mean) / jnp.sqrt(var + 1e-5)
    h = h * p["ln_w"] + p["ln_b"]
    h = jnp.where(h >= 0, h, 0.2 * h)
    return h @ p["fc2_w"].T + p["fc2_b"]


# ------------------------------------------------------------- text encoder

def text_encoder_forward(p: Params, word_embs, pos_onehot, cap_lens):
    """TextEncoderBiGRUCo (modules.py:36-74): GloVe word vecs + POS one-hots
    → BiGRU → projection."""
    pos = pos_onehot @ p["pos_emb_w"].T + p["pos_emb_b"]
    inputs = word_embs + pos
    embs = inputs @ p["input_emb_w"].T + p["input_emb_b"]
    last = bigru_last(p["gru"], embs, cap_lens, p["hidden"])
    return _output_net(p["out"], last)


def motion_encoder_forward(p: Params, motion_feats, m_lens):
    """MotionEncoderBiGRUCo (modules.py:77-109): movement features → BiGRU
    → projection."""
    embs = motion_feats @ p["input_emb_w"].T + p["input_emb_b"]
    last = bigru_last(p["gru"], embs, m_lens, p["hidden"])
    return _output_net(p["out"], last)


def movement_encoder_forward(p: Params, raw_feats):
    """MovementConvEncoder (modules.py:13-33): two stride-2 conv1d +
    LeakyReLU, then a linear. Input (B, T, D_pose-4) → (B, T/4, D_move)."""
    x = raw_feats
    for conv in ("conv1", "conv2"):
        x = jax.lax.conv_general_dilated(
            x, p[conv]["w"], window_strides=(2,), padding=[(1, 1)],
            dimension_numbers=("NTC", "TIO", "NTC"),
        ) + p[conv]["b"]
        x = jnp.where(x >= 0, x, 0.2 * x)
    return x @ p["out_w"].T + p["out_b"]


# --------------------------------------------------------------- torch import

def _gru_from_torch(state: Mapping, prefix: str) -> Params:
    g = lambda k: jnp.asarray(np.asarray(state[f"{prefix}.{k}"]))
    return {
        "w_ih_f": g("weight_ih_l0"), "w_hh_f": g("weight_hh_l0"),
        "b_ih_f": g("bias_ih_l0"), "b_hh_f": g("bias_hh_l0"),
        "w_ih_b": g("weight_ih_l0_reverse"), "w_hh_b": g("weight_hh_l0_reverse"),
        "b_ih_b": g("bias_ih_l0_reverse"), "b_hh_b": g("bias_hh_l0_reverse"),
    }


def _out_from_torch(state: Mapping, prefix: str) -> Params:
    g = lambda k: jnp.asarray(np.asarray(state[f"{prefix}.{k}"]))
    return {
        "fc1_w": g("0.weight"), "fc1_b": g("0.bias"),
        "ln_w": g("1.weight"), "ln_b": g("1.bias"),
        "fc2_w": g("3.weight"), "fc2_b": g("3.bias"),
    }


def text_encoder_from_torch(state: Mapping) -> Params:
    g = lambda k: jnp.asarray(np.asarray(state[k]))
    return {
        "pos_emb_w": g("pos_emb.weight"), "pos_emb_b": g("pos_emb.bias"),
        "input_emb_w": g("input_emb.weight"), "input_emb_b": g("input_emb.bias"),
        "gru": _gru_from_torch(state, "gru"),
        "out": _out_from_torch(state, "output_net"),
        "hidden": g("hidden"),
    }


def motion_encoder_from_torch(state: Mapping) -> Params:
    g = lambda k: jnp.asarray(np.asarray(state[k]))
    return {
        "input_emb_w": g("input_emb.weight"), "input_emb_b": g("input_emb.bias"),
        "gru": _gru_from_torch(state, "gru"),
        "out": _out_from_torch(state, "output_net"),
        "hidden": g("hidden"),
    }


def movement_encoder_from_torch(state: Mapping) -> Params:
    def conv(i):
        w = np.asarray(state[f"main.{i}.weight"]).transpose(2, 1, 0)
        return {"w": jnp.asarray(w), "b": jnp.asarray(np.asarray(state[f"main.{i}.bias"]))}

    return {
        "conv1": conv(0),
        "conv2": conv(3),
        "out_w": jnp.asarray(np.asarray(state["out_net.weight"])),
        "out_b": jnp.asarray(np.asarray(state["out_net.bias"])),
    }


@dataclasses.dataclass
class EvaluatorWrapper:
    """Bundled evaluators (models/evaluator_wrapper.py:8-90): raw motion →
    movement features → motion embedding; caption word vecs → text
    embedding. Unit length per reference convention (embeddings used
    directly in euclidean metric space)."""

    text_params: Params
    motion_params: Params
    movement_params: Params
    unit_length: int = 4

    def get_co_embeddings(self, word_embs, pos_onehot, cap_lens,
                          motions, m_lens):
        move = movement_encoder_forward(self.movement_params, motions[..., :-4])
        motion_emb = motion_encoder_forward(
            self.motion_params, move, m_lens // self.unit_length
        )
        text_emb = text_encoder_forward(
            self.text_params, word_embs, pos_onehot, cap_lens
        )
        return text_emb, motion_emb

    def get_motion_embeddings(self, motions, m_lens):
        move = movement_encoder_forward(self.movement_params, motions[..., :-4])
        return motion_encoder_forward(
            self.motion_params, move, m_lens // self.unit_length
        )

    @classmethod
    def from_torch_checkpoint(cls, text_state, motion_state, movement_state,
                              unit_length: int = 4):
        return cls(
            text_params=text_encoder_from_torch(text_state),
            motion_params=motion_encoder_from_torch(motion_state),
            movement_params=movement_encoder_from_torch(movement_state),
            unit_length=unit_length,
        )
