"""Import motion VQ-VAE torch checkpoints into the JAX pytree.

The reference modules are anonymous `nn.Sequential` stacks
(motion_vqvae/models/encdec.py), so state-dict keys are positional:

  encoder: model.0 conv_in | model.1 ReLU | model.{2..1+down_t}
           (.0 stride conv, .1.model.{d} res blocks) | model.{2+down_t} conv_out
  decoder: model.0 conv_in | model.1 ReLU | model.{2..1+down_t}
           (.0.model.{d} res blocks, .2 conv) | conv_mid | ReLU | conv_out

Conv1d kernels convert (out, in, k) → (k, in, out) for NTC convolutions.
Full `HumanVQVAE` checkpoints prefix these with `vqvae.encoder.` /
`vqvae.decoder.` and carry `vqvae.quantizer.codebook`.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from mmada_tpu.models.motion_vq import MotionVQConfig

Params = dict[str, Any]


def _conv(state, prefix: str, dtype) -> Params:
    w = np.asarray(state[f"{prefix}.weight"]).transpose(2, 1, 0)
    b = np.asarray(state[f"{prefix}.bias"])
    return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}


def _resnet(state, prefix: str, cfg: MotionVQConfig, dtype) -> list[Params]:
    return [
        {
            "conv1": _conv(state, f"{prefix}.model.{d}.conv1", dtype),
            "conv2": _conv(state, f"{prefix}.model.{d}.conv2", dtype),
        }
        for d in range(cfg.depth)
    ]


def encoder_from_torch(state: Mapping, cfg: MotionVQConfig, dtype=jnp.float32) -> Params:
    p: Params = {"conv_in": _conv(state, "model.0", dtype), "down": []}
    for i in range(cfg.down_t):
        base = f"model.{2 + i}"
        p["down"].append({
            "conv": _conv(state, f"{base}.0", dtype),
            "resnet": _resnet(state, f"{base}.1", cfg, dtype),
        })
    p["conv_out"] = _conv(state, f"model.{2 + cfg.down_t}", dtype)
    return p


def decoder_from_torch(state: Mapping, cfg: MotionVQConfig, dtype=jnp.float32) -> Params:
    p: Params = {"conv_in": _conv(state, "model.0", dtype), "up": []}
    for i in range(cfg.down_t):
        base = f"model.{2 + i}"
        p["up"].append({
            "resnet": _resnet(state, f"{base}.0", cfg, dtype),
            "conv": _conv(state, f"{base}.2", dtype),
        })
    p["conv_mid"] = _conv(state, f"model.{2 + cfg.down_t}", dtype)
    p["conv_out"] = _conv(state, f"model.{4 + cfg.down_t}", dtype)
    return p


def motion_vq_from_torch(
    state: Mapping, cfg: MotionVQConfig, dtype=jnp.float32
) -> Params:
    """Split a `HumanVQVAE` state dict (`vqvae.encoder.* / vqvae.decoder.* /
    vqvae.quantizer.codebook`, motion_vqvae/models/vqvae.py)."""

    def sub(prefix):
        return {
            k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)
        }

    params = {
        "encoder": encoder_from_torch(sub("vqvae.encoder."), cfg, dtype),
        "decoder": decoder_from_torch(sub("vqvae.decoder."), cfg, dtype),
    }
    for key in ("vqvae.quantizer.codebook", "quantizer.codebook", "codebook"):
        if key in state:
            params["codebook"] = jnp.asarray(np.asarray(state[key]), dtype)
            break
    else:
        params["codebook"] = jnp.zeros((cfg.nb_code, cfg.code_dim), dtype)
    return params
