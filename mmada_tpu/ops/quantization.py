"""Weight-only int8 quantization for serving.

The reference has no quantization story; on TPU it is the difference
between needing a multi-chip slice and serving the FULL 32-layer 8B model
on one 16 GB v5e chip (8B params: bf16 ≈ 16.2 GB > HBM; int8 ≈ 8.1 GB).

Scheme: symmetric per-output-channel int8 — for weight `W (in, out)`,
`scale[out] = max|W[:, out]| / 127`, `W_q = round(W / scale)`. Matmuls
dequantize inside the XLA dot fusion (`x @ (W_q · scale)` with the convert
fused into the MXU operand load), so HBM weight traffic halves too —
relevant because batch-1 denoising is weight-bandwidth-bound.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTensor:
    """int8 values + per-output-channel scales for a (in, out) weight
    (or (layers, in, out) stacked weights: scales broadcast on dim -2)."""

    values: jax.Array   # int8, same shape as original
    scales: jax.Array   # float32, original shape with dim -2 removed

    @property
    def shape(self):
        return self.values.shape

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        return (
            self.values.astype(jnp.float32) * self.scales[..., None, :]
        ).astype(dtype)


def quantize_tensor(w: jax.Array) -> QuantizedTensor:
    """Per-output-channel symmetric int8 over the contracting dim (-2)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)
    scales = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scales[..., None, :]), -127, 127)
    return QuantizedTensor(values=q.astype(jnp.int8), scales=scales)


def qmatmul(x: jax.Array, qw: QuantizedTensor) -> jax.Array:
    """x @ dequant(qw): int8→compute-dtype convert fuses into the dot."""
    w = qw.values.astype(x.dtype) * qw.scales[..., None, :].astype(x.dtype)
    return x @ w


QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "att_proj", "attn_out",
    "ff_proj", "up_proj", "ff_out",
)


def quantize_llada_params(params: Any, quantize_head: bool = True) -> Any:
    """Quantize block matmul weights (+optionally the vocab head/embedding
    output path). Norm weights, biases, and the input embedding stay in
    their original dtype (embedding lookups need full rows)."""
    out = dict(params)
    blocks = dict(params["blocks"])
    for name in QUANT_TARGETS:
        if name in blocks:
            blocks[name] = quantize_tensor(blocks[name])
    out["blocks"] = blocks
    if quantize_head and "ff_out" in params:
        out["ff_out"] = quantize_tensor(params["ff_out"])
    return out


def is_quantized(leaf) -> bool:
    return isinstance(leaf, QuantizedTensor)


def maybe_matmul(x: jax.Array, w) -> jax.Array:
    if isinstance(w, QuantizedTensor):
        return qmatmul(x, w)
    return x @ w


def quantization_error(w: jax.Array) -> float:
    """Relative L2 error of the quantize→dequantize roundtrip."""
    qw = quantize_tensor(w)
    deq = qw.dequantize(jnp.float32)
    return float(
        jnp.linalg.norm(w.astype(jnp.float32) - deq)
        / jnp.maximum(jnp.linalg.norm(w.astype(jnp.float32)), 1e-12)
    )
