"""LLaDA bidirectional masked-diffusion transformer backbone, TPU-native.

Functionally equivalent to the reference's `LLaDAModel`
(models/modeling_llada.py:1161-1366): token embedding → N pre-norm
transformer blocks (non-causal attention with RoPE + gated MLP) → final
RMSNorm → vocab head. Re-designed for XLA:

  * Parameters are a pytree of layer-stacked arrays — one `(n_layers, ...)`
    array per weight kind — and the layer loop is a `lax.scan`, so the HLO is
    O(1) in depth, activation checkpointing is one `jax.checkpoint` on the
    scan body, and FSDP/TP shardings are a single PartitionSpec per kind.
  * No KV cache and no causal path: MDM attends bidirectionally and re-runs
    the full sequence every denoise step (reference asserts this,
    modeling_llada.py:1203-1205).
  * fp32 islands: RMSNorm and attention softmax compute in fp32, RoPE in
    fp32 (`rope_full_precision`), matching reference numerics.
  * Optional windowed vocab head: image/motion denoise steps only need an
    8k-wide slice of the 134k-row head — `logit_window` computes just that
    slice's matmul.

Block types mirror the reference: ``llama`` (split q/k/v + ff_proj/up_proj
gated MLP, modeling_llada.py:836-934) and ``sequential`` (fused att_proj +
SwiGLU chunking, :746-833).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mmada_tpu.core.precision import FP32, Policy
from mmada_tpu.ops.attention import (
    NEG_INF,
    _rotate_half,  # noqa: F401  (re-export: pre-refactor API location)
    apply_rope,
    bidirectional_attention,
    xla_attention,
)
from mmada_tpu.ops.quantization import (
    Int4Tensor,
    QuantizedTensor,
    W8A8Tensor,
    maybe_matmul,
    multi_matmul,
)
from mmada_tpu.ops.norms import layer_norm, rms_norm

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LLaDAConfig:
    """Backbone hyper-parameters (reference: models/configuration_llada.py:129-384)."""

    d_model: int = 4096
    n_heads: int = 32
    n_kv_heads: Optional[int] = None
    n_layers: int = 32
    mlp_hidden_size: Optional[int] = 12288
    mlp_ratio: int = 4
    vocab_size: int = 126464
    embedding_size: Optional[int] = 126464
    max_sequence_length: int = 4096
    rope_theta: float = 500000.0
    rope_full_precision: bool = True
    layer_norm_type: str = "rms"          # 'rms' | 'gemma_rms' | 'default'
    layer_norm_with_affine: bool = True
    rms_norm_eps: float = 1e-5
    activation_type: str = "silu"          # 'silu' | 'swiglu' | 'gelu' | 'relu'
    block_type: str = "llama"              # 'llama' | 'sequential'
    weight_tying: bool = False
    include_bias: bool = False
    include_qkv_bias: bool = False
    attention_layer_norm: bool = False     # q/k norm
    input_emb_norm: bool = False
    scale_logits: bool = False
    mask_token_id: int = 126336
    attention_bias_enabled: bool = False
    """Whether attention masks/biases actually gate attention.

    Default False is checkpoint-faithful: the reference builds pairwise
    biases everywhere (generate.py:59-60, modeling_mmada.py:162) but its
    attention always calls SDPA with `attn_mask=None`
    (modeling_llada.py:652-660) — the bias is dead code, and the released
    weights were trained with pads visible as [iPAD] embeddings. Verified:
    reference masked and unmasked logits are bit-identical
    (tests/goldens/forward_mha.npz). Set True to genuinely honor masks
    (recommended for training from scratch in this framework)."""

    @property
    def effective_n_kv_heads(self) -> int:
        return self.n_kv_heads if self.n_kv_heads is not None else self.n_heads

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def hidden_size(self) -> int:
        return (
            self.mlp_hidden_size
            if self.mlp_hidden_size is not None
            else self.mlp_ratio * self.d_model
        )

    @property
    def effective_hidden_size(self) -> int:
        """Width of the MLP activation entering ff_out (SwiGLU halves it)."""
        if self.block_type == "sequential" and self.activation_type == "swiglu":
            return self.hidden_size // 2
        return self.hidden_size

    @property
    def effective_vocab_size(self) -> int:
        return self.embedding_size if self.embedding_size is not None else self.vocab_size


def llada_8b(vocab_size: int = 134656) -> LLaDAConfig:
    """Flagship 8B config with the fused multimodal vocabulary
    (reference: configs/mmada_demo.yaml:17-24 resizes embeddings to 134,656)."""
    return LLaDAConfig(vocab_size=vocab_size, embedding_size=vocab_size)


def tiny_config(
    vocab_size: int = 320,
    d_model: int = 64,
    n_heads: int = 4,
    n_kv_heads: Optional[int] = None,
    n_layers: int = 2,
    mlp_hidden_size: int = 128,
    block_type: str = "llama",
    activation_type: str = "silu",
    weight_tying: bool = False,
    max_sequence_length: int = 256,
    attention_layer_norm: bool = False,
) -> LLaDAConfig:
    return LLaDAConfig(
        d_model=d_model,
        n_heads=n_heads,
        n_kv_heads=n_kv_heads,
        n_layers=n_layers,
        mlp_hidden_size=mlp_hidden_size,
        vocab_size=vocab_size,
        embedding_size=vocab_size,
        max_sequence_length=max_sequence_length,
        rope_theta=10000.0,
        block_type=block_type,
        activation_type=activation_type,
        weight_tying=weight_tying,
        attention_layer_norm=attention_layer_norm,
        mask_token_id=vocab_size - 1,
    )


# --------------------------------------------------------------------------
# Initialization
# --------------------------------------------------------------------------

def init_params(
    key: jax.Array, cfg: LLaDAConfig, dtype: jnp.dtype = jnp.float32
) -> Params:
    """Random init (normal 0.02, reference 'mitchell'/'normal' variants are
    only relevant for from-scratch pretraining; fine-tuning loads weights)."""
    d, nh, kvh, hd = cfg.d_model, cfg.n_heads, cfg.effective_n_kv_heads, cfg.head_dim
    f, f_out = cfg.hidden_size, cfg.effective_hidden_size
    v = cfg.effective_vocab_size
    n = cfg.n_layers
    std = 0.02

    keys = jax.random.split(key, 16)

    def w(k, *shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    blocks: Params = {
        "attn_norm": jnp.ones((n, d), dtype),
        "ff_norm": jnp.ones((n, d), dtype),
        "attn_out": w(keys[0], n, d, d),
        "ff_out": w(keys[1], n, f_out, d),
    }
    if cfg.block_type == "llama":
        blocks.update(
            q_proj=w(keys[2], n, d, nh * hd),
            k_proj=w(keys[3], n, d, kvh * hd),
            v_proj=w(keys[4], n, d, kvh * hd),
            ff_proj=w(keys[5], n, d, f),
            up_proj=w(keys[6], n, d, f),
        )
        if cfg.include_bias or cfg.include_qkv_bias:
            blocks.update(
                q_bias=jnp.zeros((n, nh * hd), dtype),
                k_bias=jnp.zeros((n, kvh * hd), dtype),
                v_bias=jnp.zeros((n, kvh * hd), dtype),
            )
    elif cfg.block_type == "sequential":
        fused = d + 2 * kvh * hd
        blocks.update(
            att_proj=w(keys[2], n, d, fused),
            ff_proj=w(keys[5], n, d, f),
        )
        if cfg.include_bias or cfg.include_qkv_bias:
            blocks["att_proj_bias"] = jnp.zeros((n, fused), dtype)
    else:
        raise ValueError(f"unknown block_type: {cfg.block_type}")

    if cfg.attention_layer_norm:
        blocks["q_norm"] = jnp.ones((n, d), dtype)
        blocks["k_norm"] = jnp.ones((n, kvh * hd), dtype)

    params: Params = {
        "wte": w(keys[7], v, d),
        "ln_f": jnp.ones((d,), dtype),
        "blocks": blocks,
    }
    if not cfg.weight_tying:
        params["ff_out"] = w(keys[8], d, v)
    return params


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _norm(cfg: LLaDAConfig, x: jax.Array, weight: Optional[jax.Array]) -> jax.Array:
    if cfg.layer_norm_type == "rms":
        return rms_norm(x, weight, eps=cfg.rms_norm_eps)
    if cfg.layer_norm_type == "gemma_rms":
        return rms_norm(x, weight, eps=cfg.rms_norm_eps, gemma_style=True)
    return layer_norm(x, weight, None, eps=1e-5)


def _activation(cfg: LLaDAConfig, x: jax.Array) -> jax.Array:
    act = cfg.activation_type
    if act == "silu":
        return jax.nn.silu(x)
    if act == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if act == "relu":
        return jax.nn.relu(x)
    if act == "swiglu":
        # reference SwiGLU chunks [value, gate] (modeling_llada.py:475-482)
        val, gate = jnp.split(x, 2, axis=-1)
        return jax.nn.silu(gate) * val
    raise ValueError(f"unknown activation: {act}")


def rope_sin_cos(
    seq_len: int, head_dim: int, theta: float, dtype: jnp.dtype = jnp.float32
) -> tuple[jax.Array, jax.Array]:
    """Neox-style rotary tables, full head_dim with duplicated halves
    (reference: modeling_llada.py:363-428 caches cat(freqs, freqs))."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    pos = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(pos, inv_freq)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.sin(emb).astype(dtype), jnp.cos(emb).astype(dtype)


# NOTE: `_rotate_half` / `apply_rope` live beside the attention dispatch
# (ops/attention.py) so the Pallas kernel can fuse the rotation into its
# tile loads; they are re-exported above for API continuity.


def _dispatch_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    softmax_dtype: jnp.dtype,
    attn_impl: str,
    mesh,
    tp_axis: str,
    rope_sin: Optional[jax.Array] = None,  # (L, D): q/k arrive UN-roped
    rope_cos: Optional[jax.Array] = None,
) -> jax.Array:
    """Pick the mesh-aware path when a mesh is provided.

    Under multi-device pjit a bare `pallas_call` has no GSPMD partitioning
    rule (ops/attention._pallas_eligible), so the plain path silently falls
    back to XLA attention. With a mesh we instead run the Pallas kernel
    per-shard via shard_map: heads over the tensor axis, batch over
    data×fsdp (parallel/tp_attention). All decisions here are on static
    shapes — jit-safe. Falls back to the plain dispatch when the head or
    batch counts don't divide the mesh.

    `attn_impl='ring'` (with a mesh, unbiased) instead shards the SEQUENCE
    over the fsdp axis — sequence parallelism for contexts that outgrow a
    chip's activations (parallel/ring_attention; the reference has no
    long-context story at all, SURVEY §5)."""
    if mesh is not None and attn_impl == "ring" and bias is None:
        from mmada_tpu.parallel.ring_attention import ring_attention

        sp_axis = "fsdp"
        sp = mesh.shape.get(sp_axis, 1)
        if sp > 1 and q.shape[2] % sp == 0:
            if rope_sin is not None:
                # ring shards the sequence: rotate before the permute ring
                q, k = apply_rope(q, k, rope_sin, rope_cos)
                rope_sin = rope_cos = None
            if k.shape[1] != q.shape[1]:  # GQA: ring kernel wants equal heads
                rep = q.shape[1] // k.shape[1]
                k = jnp.repeat(k, rep, axis=1)
                v = jnp.repeat(v, rep, axis=1)
            return ring_attention(q, k, v, mesh, axis_name=sp_axis)
    if mesh is not None:
        from mmada_tpu.parallel.tp_attention import best_batch_axes, tp_attention

        ts = mesh.shape.get(tp_axis, 1)
        heads_ok = q.shape[1] % ts == 0 and k.shape[1] % ts == 0
        batch_axes = best_batch_axes(q.shape[0], mesh)
        if heads_ok and (ts > 1 or batch_axes):
            return tp_attention(
                q, k, v, mesh, axis_name=tp_axis, bias=bias,
                softmax_dtype=softmax_dtype,
                impl="auto" if attn_impl == "ring" else attn_impl,
                batch_axes=batch_axes,
                rope_sin=rope_sin, rope_cos=rope_cos,
            )
    if attn_impl == "ring":
        attn_impl = "auto"  # no mesh / indivisible: plain single-device path
    return bidirectional_attention(
        q, k, v, bias=bias, softmax_dtype=softmax_dtype, impl=attn_impl,
        rope_sin=rope_sin, rope_cos=rope_cos,
    )


def _qkv(cfg: LLaDAConfig, lp: Params, h: jax.Array):
    """Project normed hidden states to per-head q/k/v `(B, H, L, D)`
    (un-roped). Shared by the full forward and the KV-cached block step."""
    b, l, d = h.shape
    nh, kvh, hd = cfg.n_heads, cfg.effective_n_kv_heads, cfg.head_dim
    if cfg.block_type == "llama":
        # multi_matmul shares one activation-quantize pass across q/k/v
        # under w8a8 (identical numerics; bf16 weights take the plain path)
        q, k, v = multi_matmul(h, (lp["q_proj"], lp["k_proj"], lp["v_proj"]))
        if "q_bias" in lp:
            q, k, v = q + lp["q_bias"], k + lp["k_bias"], v + lp["v_bias"]
    else:
        fused = maybe_matmul(h, lp["att_proj"])
        if "att_proj_bias" in lp:
            fused = fused + lp["att_proj_bias"]
        q, k, v = jnp.split(fused, [d, d + kvh * hd], axis=-1)

    # Optional q/k norm applied on flat projections (modeling_llada.py:675-677).
    if "q_norm" in lp:
        q = _norm(cfg, q, lp["q_norm"])
        k = _norm(cfg, k, lp["k_norm"])

    q = q.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, l, kvh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, kvh, hd).transpose(0, 2, 1, 3)
    return q, k, v


def _mlp(cfg: LLaDAConfig, lp: Params, x: jax.Array) -> jax.Array:
    h = _norm(cfg, x, lp.get("ff_norm"))
    if cfg.block_type == "llama":
        # act(ff_proj(h)) * up_proj(h) — llama-style gated MLP
        # (modeling_llada.py:924-930: ff_proj is the gate input).
        gate, up = multi_matmul(h, (lp["ff_proj"], lp["up_proj"]))
        h = _activation(cfg, gate) * up
    else:
        h = _activation(cfg, maybe_matmul(h, lp["ff_proj"]))
    return x + maybe_matmul(h, lp["ff_out"])


def _block(
    cfg: LLaDAConfig,
    policy: Policy,
    x: jax.Array,          # (B, L, D)
    lp: Params,            # one layer's params (no leading layer axis)
    bias: Optional[jax.Array],
    sin: jax.Array,
    cos: jax.Array,
    attn_impl: str,
    mesh=None,
    tp_axis: str = "tensor",
    return_kv: bool = False,
):
    b, l, d = x.shape

    h = _norm(cfg, x, lp.get("attn_norm"))
    q, k, v = _qkv(cfg, lp, h)

    kv = None
    if return_kv:
        # capture pass for the block-cached decode: rope must be applied
        # here (not fused into the kernel) so the cached K is post-rope
        q, k = apply_rope(q, k, sin, cos, full_precision=cfg.rope_full_precision)
        att = _dispatch_attention(
            q, k, v, bias, policy.softmax_dtype, attn_impl, mesh, tp_axis
        )
        kv = (k, v)
    elif cfg.rope_full_precision:
        # rope rides into the attention dispatch: the Pallas one-pass kernel
        # rotates q/k tiles in VMEM (fp32), other paths run apply_rope
        att = _dispatch_attention(
            q, k, v, bias, policy.softmax_dtype, attn_impl, mesh, tp_axis,
            rope_sin=sin, rope_cos=cos,
        )
    else:
        q, k = apply_rope(q, k, sin, cos, full_precision=False)
        att = _dispatch_attention(
            q, k, v, bias, policy.softmax_dtype, attn_impl, mesh, tp_axis
        )
    att = att.transpose(0, 2, 1, 3).reshape(b, l, d)
    x = x + maybe_matmul(att, lp["attn_out"])
    x = _mlp(cfg, lp, x)
    return (x, kv) if return_kv else x


def prepare_attention_bias(
    attention_mask: Optional[jax.Array] = None,  # (B, L) 1=keep 0=pad
    attention_bias: Optional[jax.Array] = None,  # (B|1, 1, L, L) bool/float
) -> Optional[jax.Array]:
    """Merge mask/bias into one additive fp32 bias, reference semantics
    (modeling_llada.py:1242-1286; pairwise construction generate.py:59-60)."""
    out = None
    if attention_bias is not None:
        if attention_bias.dtype == jnp.bool_:
            out = jnp.where(attention_bias, 0.0, NEG_INF).astype(jnp.float32)
        else:
            out = attention_bias.astype(jnp.float32)
    if attention_mask is not None:
        pair = (attention_mask[:, :, None] * attention_mask[:, None, :]) > 0
        mask_bias = jnp.where(pair, 0.0, NEG_INF).astype(jnp.float32)[:, None]
        out = mask_bias if out is None else out + mask_bias
    if out is not None:
        # dtype.min + dtype.min would be -inf; clamp like `ensure_finite_`
        # (modeling_llada.py:158-166).
        out = jnp.maximum(out, NEG_INF)
    return out


def _wrap_remat(body, remat):
    """Activation-checkpointing modes for the layer-scan body.

    False      — save everything (inference / shallow-depth training).
    True/"full" — recompute the whole layer in backward: minimal memory,
                 one extra layer-stack forward of MXU work (~25% at
                 stage-1 shapes, utils/flops.train_step_flops).
    "dots"     — jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
                 every matmul output (qkv/o/mlp projections) is saved, the
                 backward recomputes only elementwise ops plus the
                 flash-attention forward (the custom_vjp is opaque to the
                 policy, so its residuals rematerialize by re-running the
                 kernel — exactly flash attention's own trade). Costs
                 ~7x the full-remat activation memory, buys back nearly
                 the whole recompute tax.
    """
    if not remat:
        return body
    if remat is True or remat in ("full", "auto"):
        # unresolved "auto" (forward used outside the Trainer, which is
        # where the dots-vs-full memory fit is decided) behaves as "full"
        # — in forward-only graphs the checkpoint is a no-op after DCE
        return jax.checkpoint(body, prevent_cse=False)
    if remat == "dots":
        return jax.checkpoint(
            body, prevent_cse=False,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    raise ValueError(f"remat must be False/True/'full'/'dots', got {remat!r}")


def forward(
    params: Params,
    cfg: LLaDAConfig,
    input_ids: jax.Array,                        # (B, L) int32
    attention_mask: Optional[jax.Array] = None,  # (B, L)
    attention_bias: Optional[jax.Array] = None,  # (B|1, 1, L, L)
    input_embeddings: Optional[jax.Array] = None,
    policy: Policy = FP32,
    logit_window: Optional[tuple[int, int]] = None,
    logit_positions: Optional[tuple[int, int]] = None,
    remat=False,  # False | True | "full" | "dots" (_wrap_remat)
    attn_impl: str = "auto",
    output_hidden_states: bool = False,
    mesh=None,
    tp_axis: str = "tensor",
    return_normed_hidden: bool = False,
):
    """Compute logits `(B, L, V)` (or `(B, L, window)` with `logit_window`;
    `logit_positions=(start, length)` additionally restricts the head to
    that position span, returning `(B, length, ...)`; `start` may be a
    Python int or a traced scalar).

    `return_normed_hidden=True` stops after the final norm and returns the
    `(B, L, D)` hidden states WITHOUT the vocab-head matmul — the
    position-chunked training loss (training/losses.chunked_weighted_ce)
    applies the head per chunk so the `(B, L, 134k)` logits tensor never
    materializes.

    Equivalent to `LLaDAModel.forward` (modeling_llada.py:1161-1366) minus
    the KV-cache/causal paths that MDM forbids.
    """
    if input_embeddings is None:
        x = params["wte"][input_ids]
    else:
        x = input_embeddings
    x = x.astype(policy.compute_dtype)
    if cfg.input_emb_norm:
        x = x * math.sqrt(cfg.d_model)

    if cfg.attention_bias_enabled:
        bias = prepare_attention_bias(attention_mask, attention_bias)
    else:
        bias = None  # reference-faithful: masks never reach attention

    seq_len = x.shape[1]
    sin, cos = rope_sin_cos(seq_len, cfg.head_dim, cfg.rope_theta)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as _P

        from mmada_tpu.parallel.tp_attention import best_batch_axes

        b_ax = best_batch_axes(x.shape[0], mesh)
        act_sharding = NamedSharding(mesh, _P(b_ax or None, None, None))

        def pin(h):
            # pin the residual stream to batch-over-(data×fsdp), replicated
            # on hidden: without this GSPMD sometimes picks a hidden-dim
            # resharding for the qkv matmuls inside remat and falls back to
            # "involuntary full rematerialization" (replicate-then-slice)
            return jax.lax.with_sharding_constraint(h, act_sharding)

        x = pin(x)
    else:
        def pin(h):
            return h

    def body(carry, lp):
        h = _block(
            cfg, policy, carry, lp, bias, sin, cos, attn_impl,
            mesh=mesh, tp_axis=tp_axis,
        )
        h = pin(h)
        return h, (h if output_hidden_states else None)

    body = _wrap_remat(body, remat)

    x, hidden = jax.lax.scan(body, x, params["blocks"])

    if logit_positions is not None:
        # denoise loops only consume a contiguous span's logits (the image /
        # motion window, or the semi-AR current block): slice the hidden
        # states BEFORE the final norm and vocab-head matmul, skipping their
        # FLOPs and HBM traffic for the positions outside the span. One
        # convention for both forms — (start, LENGTH), where start may be a
        # Python int or a traced scalar (spans that move inside a scan).
        p_start, p_len = logit_positions
        x = jax.lax.dynamic_slice_in_dim(x, p_start, p_len, axis=1)

    x = _norm(cfg, x, params["ln_f"])
    if return_normed_hidden:
        return (x, hidden) if output_hidden_states else x
    logits = _head(params, cfg, x, logit_window, policy)

    if output_hidden_states:
        return logits, hidden
    return logits


def _head(
    params: Params,
    cfg: LLaDAConfig,
    x: jax.Array,                                # normed hidden (B, L', D)
    logit_window: Optional[tuple[int, int]],
    policy: Policy,
) -> jax.Array:
    head = params["wte"].T if cfg.weight_tying else params["ff_out"]
    if isinstance(head, (QuantizedTensor, W8A8Tensor, Int4Tensor)):
        if logit_window is not None:
            # window the head's OUTPUT channels (vocab ids) — last dim of
            # both the quantized values and their per-channel/group scales
            start, stop = logit_window
            if isinstance(head, Int4Tensor):
                head = Int4Tensor(
                    packed=head.packed[..., :, start:stop],
                    scales=head.scales[..., :, start:stop],
                )
            else:
                head = type(head)(
                    values=head.values[..., :, start:stop],
                    scales=head.scales[..., start:stop],
                )
        logits = maybe_matmul(x, head).astype(policy.logits_dtype)
    else:
        if logit_window is not None:
            start, stop = logit_window
            head = head[:, start:stop]
        logits = (x @ head.astype(x.dtype)).astype(policy.logits_dtype)
    if cfg.scale_logits:
        logits = logits * (1.0 / math.sqrt(cfg.d_model))
    return logits


# --------------------------------------------------------------------------
# Block-cached decode (Fast-dLLM-style DualCache for semi-AR sampling)
# --------------------------------------------------------------------------

def _quantize_kv(t: jax.Array):
    """Per-(batch, head, position) symmetric int8 quantization of a K/V
    tensor `(B, H, L, D)` — one fp32 scale per 128-wide head vector.
    Halves the cache's HBM footprint (the batch-8+CFG cached t2i fits
    because of this); measured per-value error ~0.4% of the vector amax."""
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(t.astype(jnp.float32) / scale).astype(jnp.int8)
    return q, scale


def _dequantize_kv(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)

def forward_kv_capture(
    params: Params,
    cfg: LLaDAConfig,
    input_ids: jax.Array,          # (B, L) int32
    policy: Policy = FP32,
    remat=False,  # False | True | "full" | "dots" (_wrap_remat)
    attn_impl: str = "auto",
    mesh=None,
    tp_axis: str = "tensor",
    drop_span: Optional[tuple[int, int]] = None,
    cache_dtype: Optional[str] = None,
):
    """Run the backbone over the full sequence and return per-layer
    post-RoPE K and V — `(k, v)`, each `(n_layers, B, kv_heads, L, head_dim)`
    in the compute dtype. No vocab head (that is the expensive 134k-row
    matmul the cached decode avoids re-running outside the block).

    Cache semantics: a semi-AR sampler captures this once per BLOCK, then
    runs `forward_kv_step` per denoise step with only the active block's
    tokens as queries. Out-of-block K/V are frozen within a block — exact
    for the suffix (still all [MASK]) and for committed earlier blocks
    (tokens unchanged), approximate for their attention *responses* to the
    block's intermediate commits. The no-bias (checkpoint-faithful)
    attention path only.

    `drop_span=(lo, hi)` (STATIC ints) removes that position range from
    the returned cache — attention is permutation-invariant over keys, and
    the span's K/V are recomputed fresh every step, so a sampler whose
    span is static (MaskGIT t2i/t2m) never needs them cached. At the t2i
    bench shape this is a 3x cache-memory cut (1536 -> 512 positions),
    the difference between fitting HBM and OOM at batch 4 + CFG.

    `cache_dtype='int8'` stores the cache quantized (per-head-vector
    scales, `_quantize_kv`) — another 2x HBM cut on top of `drop_span`;
    `forward_kv_step` dequantizes per layer in the step.
    """
    x = params["wte"][input_ids].astype(policy.compute_dtype)
    if cfg.input_emb_norm:
        x = x * math.sqrt(cfg.d_model)
    sin, cos = rope_sin_cos(x.shape[1], cfg.head_dim, cfg.rope_theta)

    def body(carry, lp):
        h, kv = _block(
            cfg, policy, carry, lp, None, sin, cos, attn_impl,
            mesh=mesh, tp_axis=tp_axis, return_kv=True,
        )
        if drop_span is not None:
            lo, hi = drop_span
            kv = tuple(
                jnp.concatenate([t[:, :, :lo], t[:, :, hi:]], axis=2)
                for t in kv
            )
        if cache_dtype == "int8":
            kv = tuple(_quantize_kv(t) for t in kv)
        return h, kv

    body = _wrap_remat(body, remat)

    _, (k_cache, v_cache) = jax.lax.scan(body, x, params["blocks"])
    return k_cache, v_cache


def forward_kv_step(
    params: Params,
    cfg: LLaDAConfig,
    block_ids: jax.Array,          # (B, blk) int32 — the active block only
    kv_cache,                      # from forward_kv_capture (same B)
    block_start: jax.Array,        # traced scalar — block offset in the seq
    policy: Policy = FP32,
    logit_window: Optional[tuple[int, int]] = None,
    cache_is_compact: bool = False,
    attn_impl: str = "auto",
) -> jax.Array:
    """Forward ONLY the active block's tokens against cached K/V.

    Per layer: q/k/v are computed for the block's `blk` positions (RoPE at
    their absolute offsets), the fresh block K/V overwrite their slice of
    the cache (or, with `cache_is_compact` — a `drop_span` capture — are
    concatenated to it: softmax attention is permutation-invariant over
    keys), and the block's queries attend to the FULL sequence through the
    result — rectangular attention `(blk queries × L keys)`, one-pass
    Pallas when the span is ≥256 (the t2i/t2m cached decode) and XLA
    einsum otherwise (small semi-AR blocks; also the GSPMD multi-device
    path). MLP, final norm, and the vocab head run over the block
    positions only. Returns `(B, blk, V|window)` logits.

    Cost per step ≈ blk/L of the dense forward + O(blk·L) attention,
    instead of the full O(L) forward the uncached sampler pays."""
    k_cache, v_cache = kv_cache
    quantized = isinstance(k_cache, tuple)
    cache_len = (k_cache[0] if quantized else k_cache).shape[3]
    blk = block_ids.shape[1]
    seq_len = cache_len + (blk if cache_is_compact else 0)

    x = params["wte"][block_ids].astype(policy.compute_dtype)
    if cfg.input_emb_norm:
        x = x * math.sqrt(cfg.d_model)

    sin, cos = rope_sin_cos(seq_len, cfg.head_dim, cfg.rope_theta)
    sin_blk = jax.lax.dynamic_slice_in_dim(sin, block_start, blk, axis=0)
    cos_blk = jax.lax.dynamic_slice_in_dim(cos, block_start, blk, axis=0)

    def body(carry, xs):
        lp, kc, vc = xs
        if quantized:
            kc = _dequantize_kv(*kc, dtype=carry.dtype)
            vc = _dequantize_kv(*vc, dtype=carry.dtype)
        h = _norm(cfg, carry, lp.get("attn_norm"))
        q, k, v = _qkv(cfg, lp, h)
        q, k = apply_rope(
            q, k, sin_blk, cos_blk, full_precision=cfg.rope_full_precision
        )
        if cache_is_compact:
            k_full = jnp.concatenate([k.astype(kc.dtype), kc], axis=2)
            v_full = jnp.concatenate([v.astype(vc.dtype), vc], axis=2)
        else:
            k_full = jax.lax.dynamic_update_slice_in_dim(
                kc, k.astype(kc.dtype), block_start, axis=2
            )
            v_full = jax.lax.dynamic_update_slice_in_dim(
                vc, v.astype(vc.dtype), block_start, axis=2
            )
        att = bidirectional_attention(
            q, k_full, v_full, softmax_dtype=policy.softmax_dtype,
            impl=attn_impl,
        )
        att = att.transpose(0, 2, 1, 3).reshape(carry.shape)
        h2 = carry + maybe_matmul(att, lp["attn_out"])
        return _mlp(cfg, lp, h2), None

    x, _ = jax.lax.scan(body, x, (params["blocks"], k_cache, v_cache))
    x = _norm(cfg, x, params["ln_f"])
    return _head(params, cfg, x, logit_window, policy)


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
