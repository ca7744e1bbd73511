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


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class W8A8Tensor:
    """int8 weight whose matmuls also dynamically quantize activations
    (per-token symmetric int8), executing on the int8 MXU path — measured
    1.54× the bf16 dot on v5e at flagship shapes. Experimental: adds
    activation quantization error (~1-3% logits), opt-in via
    `model.mmada.quantize: w8a8`."""

    values: jax.Array   # int8 (in, out) or (L, in, out)
    scales: jax.Array   # float32 per output channel

    @property
    def shape(self):
        return self.values.shape


def quantize_activations(x: jax.Array):
    """Per-token symmetric int8: `(x_q int8, x_scale f32 keepdims)`.

    Split out so a block can quantize a shared input ONCE for several
    consuming matmuls (q/k/v share the attn-norm output; ff/up share the
    ff-norm output) — the quantize pass is 2 HBM reads + 1 write of the
    activation per call, pure VPU work, and was the largest non-MXU cost
    in the round-3 w8a8 profile."""
    xf = x.astype(jnp.float32)
    x_scale = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    return x_q, x_scale


def w8a8_matmul_prequant(
    x_q: jax.Array, x_scale: jax.Array, qw: "W8A8Tensor",
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """int8×int8 dot on pre-quantized activations; output rescaled by
    (token scale × channel scale)."""
    acc = jax.lax.dot_general(
        x_q, qw.values,
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * qw.scales
    return out.astype(out_dtype)


def w8a8_matmul(x: jax.Array, qw: "W8A8Tensor") -> jax.Array:
    """Per-token dynamic activation quantization + int8×int8 dot with int32
    accumulation; output rescaled by (token scale × channel scale)."""
    x_q, x_scale = quantize_activations(x)
    return w8a8_matmul_prequant(x_q, x_scale, qw, out_dtype=x.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Int4Tensor:
    """Grouped int4 weight (ops/int4_matmul.py layout: 2 nibbles/byte along
    the contracting dim, GROUP=128 rows per f32 scale). Serving-only, like
    the other quantized leaves; matmuls run the Pallas dequant-in-VMEM
    kernel on TPU (the XLA fallback materializes the bf16 weight, which
    costs MORE HBM traffic than int8 — kernel or don't bother). Measured a
    CAPACITY mode, not a speed mode: cached decode runs 0.61× int8
    (INT4_r03.json; see ops/int4_matmul.py for why)."""

    packed: jax.Array   # int8, (..., K/2, N)
    scales: jax.Array   # float32, (..., K/GROUP, N)

    @property
    def shape(self):
        s = self.packed.shape
        return (*s[:-2], s[-2] * 2, s[-1])

    def dequantize(self, dtype=jnp.bfloat16) -> jax.Array:
        from mmada_tpu.ops.int4_matmul import unpack_int4

        return unpack_int4(self.packed, self.scales, dtype)


_INTERPRET = False  # test hook: run the int4 kernel in interpret mode


def quantize_tensor_int4(w: jax.Array) -> Int4Tensor:
    from mmada_tpu.ops.int4_matmul import pack_int4

    packed, scales = pack_int4(w)
    return Int4Tensor(packed=packed, scales=scales)


def int4_matmul_dispatch(x: jax.Array, qw: Int4Tensor) -> jax.Array:
    """Kernel when the backend runs Mosaic and shapes are tile-aligned,
    else the XLA dequant fallback (correctness on CPU / odd shapes)."""
    from mmada_tpu.ops.attention import _is_tpu_backend

    k, n = qw.shape[-2], qw.shape[-1]
    kernel_layout = (
        k % 128 == 0 and n % 128 == 0
        and qw.scales.shape[-2] * 128 == k   # GROUP=128 packing, not the
    )                                        # per-channel small-K fallback
    if (_INTERPRET or _is_tpu_backend()) and kernel_layout:
        from mmada_tpu.ops.int4_matmul import int4_matmul

        return int4_matmul(x, qw.packed, qw.scales, interpret=_INTERPRET)
    return x @ qw.dequantize(x.dtype)


QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "att_proj", "attn_out",
    "ff_proj", "up_proj", "ff_out",
)


def quantize_llada_params(
    params: Any, quantize_head: bool = True, activations: bool = False,
    bits: int = 8,
) -> Any:
    """Quantize block matmul weights (+optionally the vocab head/embedding
    output path). Norm weights, biases, and the input embedding stay in
    their original dtype (embedding lookups need full rows).
    `activations=True` produces W8A8Tensors (int8 MXU execution);
    `bits=4` produces grouped Int4Tensors (halved weight stream — the
    cached-decode bandwidth lever; incompatible with `activations`)."""
    if bits == 4:
        if activations:
            raise ValueError("int4 weights have no activation-quant path")
        quant = quantize_tensor_int4
        wrap = lambda q: q  # noqa: E731
    elif bits == 8:
        quant = quantize_tensor
        wrap = _to_w8a8 if activations else (lambda q: q)
    else:
        raise ValueError(f"unsupported weight bits: {bits}")
    out = dict(params)
    blocks = dict(params["blocks"])
    for name in QUANT_TARGETS:
        if name in blocks:
            blocks[name] = wrap(quant(blocks[name]))
    out["blocks"] = blocks
    if quantize_head and "ff_out" in params:
        out["ff_out"] = wrap(quant(params["ff_out"]))
    return out


def _to_w8a8(q: QuantizedTensor) -> W8A8Tensor:
    return W8A8Tensor(values=q.values, scales=q.scales)


def multi_matmul(x: jax.Array, weights) -> list:
    """`[x @ w for w in weights]` with the activation quantization shared
    when every weight is a W8A8Tensor (identical numerics to per-matmul
    `w8a8_matmul`: same quantize, same dots — just one pass over x instead
    of len(weights))."""
    if all(isinstance(w, W8A8Tensor) for w in weights):
        x_q, x_scale = quantize_activations(x)
        return [
            w8a8_matmul_prequant(x_q, x_scale, w, out_dtype=x.dtype)
            for w in weights
        ]
    return [maybe_matmul(x, w) for w in weights]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class W8A8TrainTensor:
    """bf16 MASTER weight tagged for W8A8 forward execution during
    TRAINING (straight-through estimator). The leaf stays the trainable
    bf16 array — optimizer state, checkpoints and gradients are untouched
    — but every matmul that consumes it quantizes weight (per-channel)
    and activation (per-token) on the fly and runs the int8×int8 MXU dot;
    the backward pass differentiates the plain bf16 `x @ w` (STE). The
    TPU analog of fp8 forward training on H100-class GPUs; the reference
    has no quantized training at all. Tag/untag with `tag_w8a8_ste`
    inside the jitted step (zero-cost retagging, no copies)."""

    values: jax.Array   # bf16 (in, out) or (L, in, out) — TRAINABLE

    @property
    def shape(self):
        return self.values.shape


@jax.custom_vjp
def w8a8_ste_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """Forward: dynamic per-token + per-channel int8 quantize, int8 MXU
    dot, rescale. Backward: grads of the UNQUANTIZED `x @ w` (STE)."""
    qw = quantize_tensor(w)
    x_q, x_scale = quantize_activations(x)
    return w8a8_matmul_prequant(
        x_q, x_scale, W8A8Tensor(values=qw.values, scales=qw.scales),
        out_dtype=x.dtype,
    )


def _ste_fwd(x, w):
    return w8a8_ste_matmul(x, w), (x, w)


def _ste_bwd(res, g):
    x, w = res
    # dx = g @ w^T ; dw = x^T g (sum over all leading/batch dims of x)
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (w.ndim - 1,)), ((), ()))
    ).astype(x.dtype)
    batch_axes = tuple(range(x.ndim - 1))
    dw = jax.lax.dot_general(
        x, g, ((batch_axes, batch_axes), ((), ()))
    ).astype(w.dtype)
    return dx, dw


w8a8_ste_matmul.defvjp(_ste_fwd, _ste_bwd)


def tag_w8a8_ste(params: Any) -> Any:
    """Wrap the block matmul weights (QUANT_TARGETS) in W8A8TrainTensor so
    the forward runs them through the STE int8 path. Call INSIDE the
    jitted train step — tagging is pytree re-labeling, not a copy. The
    vocab head stays bf16 (its logits feed the loss directly; quantizing
    it trades loss fidelity for little speedup at loss_chunk head widths)."""
    out = dict(params)
    blocks = dict(params["blocks"])
    for name in QUANT_TARGETS:
        if name in blocks and isinstance(blocks[name], jax.Array):
            blocks[name] = W8A8TrainTensor(values=blocks[name])
    out["blocks"] = blocks
    return out


def is_quantized(leaf) -> bool:
    return isinstance(
        leaf, (QuantizedTensor, W8A8Tensor, Int4Tensor, W8A8TrainTensor)
    )


def maybe_matmul(x: jax.Array, w) -> jax.Array:
    if isinstance(w, W8A8Tensor):
        return w8a8_matmul(x, w)
    if isinstance(w, W8A8TrainTensor):
        return w8a8_ste_matmul(x, w.values)
    if isinstance(w, QuantizedTensor):
        return qmatmul(x, w)
    if isinstance(w, Int4Tensor):
        return int4_matmul_dispatch(x, w)
    return x @ w


def quantization_error(w: jax.Array) -> float:
    """Relative L2 error of the quantize→dequantize roundtrip."""
    qw = quantize_tensor(w)
    deq = qw.dequantize(jnp.float32)
    return float(
        jnp.linalg.norm(w.astype(jnp.float32) - deq)
        / jnp.maximum(jnp.linalg.norm(w.astype(jnp.float32)), 1e-12)
    )
