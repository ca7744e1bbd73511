"""SmoothQuant scale migration for W8A8 serving.

W8A8 (`ops/quantization.w8a8_matmul`) quantizes activations per-token
dynamically; its error is dominated by channel outliers — one hot channel
sets the token's scale and crushes everyone else's resolution. SmoothQuant
(Xiao et al. 2022, arXiv:2211.10438) migrates that difficulty into the
weights with a per-input-channel factor `s`: the matmul input becomes
`x / s` and the weight `s * W` — mathematically a no-op in fp, but the
activation quantizer now sees a flattened channel profile while the
per-output-channel weight quantizer barely notices the row rescale.

On this architecture EVERY migration fold is exact (no runtime division
survives into the serving graph):

  q/k/v (or att_proj)  <- attn_norm affine (RMS/LN affines are per-channel
                          multiplies applied after normalization)
  attn_out             <- v_proj output channels (attention is linear in
                          v; scales shared across each GQA group: kv head
                          j serves query heads [j*rep, (j+1)*rep) —
                          ops/attention.py:46-50 `jnp.repeat`)
  ff_proj / up_proj    <- ff_norm affine
  ff_out               <- up_proj output channels (the SwiGLU gate
                          multiplies elementwise; 'llama' blocks only —
                          the 'sequential' MLP has no second branch and
                          its nonlinearity blocks the fold)
  vocab-head ff_out    <- ln_f affine (skipped under weight_tying; the
                          chunked training loss and every sampler apply
                          the head from the same migrated params, so the
                          rescaled normed-hidden convention is internal)

Biases are unaffected by input-side folds (added after the matmul);
q/k-norms sit after q/k projections and are untouched; v_bias and the
att_proj v-slice bias ARE output-side of the v fold and divide by s.

The torch reference has no quantization story at all — this is part of
the TPU serving stack (int8 MXU at 1.54x the bf16 dot on v5e).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from mmada_tpu.core.precision import FP32, Policy
from mmada_tpu.ops import quantization as Q

Params = Any

# s outside this range means one side of the migration is degenerate
# (dead channel / zero weight column); clamp rather than blow up the
# weight quantizer's dynamic range.
_S_MIN, _S_MAX = 1e-2, 1e2


# ------------------------------------------------------------------------
# Calibration: per-site, per-input-channel activation absmax
# ------------------------------------------------------------------------

def _amax(t: jax.Array) -> jax.Array:
    """Channel absmax over (batch, seq) in fp32."""
    return jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(0, 1))


def _stats_once(params, cfg, input_ids, policy: Policy):
    """One calibration forward; returns per-site input absmax.

    Mirrors `llada.forward`'s block math (same helpers: `_norm`, `_qkv`,
    `_dispatch_attention`, `_activation`) with taps at each quantized
    matmul's input. Stats only steer the *choice* of s — migration
    exactness never depends on them (any s>0 folds exactly), so a drift
    from the real forward degrades quality, not correctness; the
    migration-exactness test pins the part that must match.
    """
    from mmada_tpu.models import llada

    x = params["wte"][input_ids].astype(policy.compute_dtype)
    if cfg.input_emb_norm:
        x = x * math.sqrt(cfg.d_model)
    sin, cos = llada.rope_sin_cos(x.shape[1], cfg.head_dim, cfg.rope_theta)
    b, l, d = x.shape

    def body(carry, lp):
        x = carry
        h = llada._norm(cfg, x, lp.get("attn_norm"))
        qkv_in = _amax(h)
        q, k, v = llada._qkv(cfg, lp, h)
        q, k = llada.apply_rope(
            q, k, sin, cos, full_precision=cfg.rope_full_precision
        )
        att = llada._dispatch_attention(
            q, k, v, None, policy.softmax_dtype, "auto", None, "tensor"
        )
        att = att.transpose(0, 2, 1, 3).reshape(b, l, d)
        ctx = _amax(att)
        x = x + Q.maybe_matmul(att, lp["attn_out"])
        h2 = llada._norm(cfg, x, lp.get("ff_norm"))
        mlp_in = _amax(h2)
        gate = llada._activation(cfg, Q.maybe_matmul(h2, lp["ff_proj"]))
        if cfg.block_type == "llama":
            mid = gate * Q.maybe_matmul(h2, lp["up_proj"])
        else:
            mid = gate
        mlp_mid = _amax(mid)
        x = x + Q.maybe_matmul(mid, lp["ff_out"])
        return x, {
            "qkv_in": qkv_in, "ctx": ctx,
            "mlp_in": mlp_in, "mlp_mid": mlp_mid,
        }

    x, per_layer = jax.lax.scan(body, x, params["blocks"])
    per_layer["head_in"] = _amax(llada._norm(cfg, x, params["ln_f"]))
    return per_layer


def collect_stats(
    params: Params,
    cfg,
    calib_batches: Sequence[jax.Array],
    policy: Policy = FP32,
) -> dict:
    """Max-reduce `_stats_once` over calibration batches of (B, L) ids.

    Returns {qkv_in/mlp_in (n, d), ctx (n, d), mlp_mid (n, f_out),
    head_in (d,)} as fp32 host-side arrays.
    """
    fn = jax.jit(partial(_stats_once, cfg=cfg, policy=policy))
    acc = None
    for ids in calib_batches:
        s = jax.device_get(fn(params, input_ids=jnp.asarray(ids, jnp.int32)))
        acc = s if acc is None else jax.tree.map(jnp.maximum, acc, s)
    return acc


# ------------------------------------------------------------------------
# Migration
# ------------------------------------------------------------------------

def _smooth_scales(act_amax, w_amax, alpha: float) -> jax.Array:
    a = jnp.maximum(act_amax.astype(jnp.float32), 1e-6)
    w = jnp.maximum(w_amax.astype(jnp.float32), 1e-6)
    return jnp.clip(a ** alpha / w ** (1.0 - alpha), _S_MIN, _S_MAX)


def _row_amax(w: jax.Array) -> jax.Array:
    """Per-input-channel (contracting-dim row) absmax: (..., in, out) ->
    (..., in)."""
    return jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1)


def _scale_norm(weight: jax.Array, s: jax.Array, gemma: bool) -> jax.Array:
    """Fold 1/s into a norm affine: plain affines multiply by w, Gemma-RMS
    by (1+w) (ops/norms.py)."""
    wf = weight.astype(jnp.float32)
    out = ((1.0 + wf) / s - 1.0) if gemma else wf / s
    return out.astype(weight.dtype)


def _scale_rows(w: jax.Array, s: jax.Array) -> jax.Array:
    """w[..., i, :] *= s[..., i]."""
    return (w.astype(jnp.float32) * s[..., :, None]).astype(w.dtype)


def _scale_cols(w: jax.Array, inv_s: jax.Array) -> jax.Array:
    """w[..., :, j] *= inv_s[..., j]."""
    return (w.astype(jnp.float32) * inv_s[..., None, :]).astype(w.dtype)


def migrate_params(
    params: Params, cfg, stats: dict, alpha: float = 0.5
) -> Params:
    """Return new params with SmoothQuant scales folded in — the forward
    is (fp-)identical; only where magnitudes live changes. Safe to apply
    before either weight-only int8 or W8A8 quantization."""
    gemma = cfg.layer_norm_type == "gemma_rms"
    blocks = dict(params["blocks"])
    out = dict(params)
    n = cfg.n_layers
    nh, kvh, hd = cfg.n_heads, cfg.effective_n_kv_heads, cfg.head_dim
    rep = nh // kvh
    d = cfg.d_model

    # -- site 1: attn_norm -> q/k/v (or fused att_proj) -----------------
    qkv_names = (
        ("q_proj", "k_proj", "v_proj")
        if cfg.block_type == "llama" else ("att_proj",)
    )
    if "attn_norm" in blocks and all(nm in blocks for nm in qkv_names):
        w_amax = jnp.stack(
            [_row_amax(blocks[nm]) for nm in qkv_names]
        ).max(axis=0)                                      # (n, d)
        s = _smooth_scales(stats["qkv_in"], w_amax, alpha)
        blocks["attn_norm"] = _scale_norm(blocks["attn_norm"], s, gemma)
        for nm in qkv_names:
            blocks[nm] = _scale_rows(blocks[nm], s)

    # -- site 2: v output channels -> attn_out --------------------------
    # Context channel c = h*hd + j comes from kv head h//rep (jnp.repeat
    # interleave, ops/attention.py:46-50): share s within each group so
    # the v-side fold is well-defined.
    if "attn_out" in blocks:
        ctx = stats["ctx"].reshape(n, kvh, rep, hd).max(axis=2)   # (n,kvh,hd)
        w_amax = (
            _row_amax(blocks["attn_out"])
            .reshape(n, kvh, rep, hd).max(axis=2)
        )
        s_v = _smooth_scales(ctx, w_amax, alpha)                  # (n,kvh,hd)
        s_flat = s_v.reshape(n, kvh * hd)
        s_ctx = jnp.broadcast_to(
            s_v[:, :, None, :], (n, kvh, rep, hd)
        ).reshape(n, d)
        inv = 1.0 / s_flat
        if cfg.block_type == "llama":
            blocks["v_proj"] = _scale_cols(blocks["v_proj"], inv)
            if "v_bias" in blocks:
                blocks["v_bias"] = (
                    blocks["v_bias"].astype(jnp.float32) * inv
                ).astype(blocks["v_bias"].dtype)
        else:
            fused = blocks["att_proj"].astype(jnp.float32)
            v_cols = fused[..., :, d + kvh * hd:] * inv[..., None, :]
            fused = fused.at[..., :, d + kvh * hd:].set(v_cols)
            blocks["att_proj"] = fused.astype(blocks["att_proj"].dtype)
            if "att_proj_bias" in blocks:
                fb = blocks["att_proj_bias"].astype(jnp.float32)
                fb = fb.at[..., d + kvh * hd:].mul(inv)
                blocks["att_proj_bias"] = fb.astype(
                    blocks["att_proj_bias"].dtype
                )
        blocks["attn_out"] = _scale_rows(blocks["attn_out"], s_ctx)

    # -- site 3: ff_norm -> ff_proj (+ up_proj) -------------------------
    ff_names = (
        ("ff_proj", "up_proj") if cfg.block_type == "llama" else ("ff_proj",)
    )
    if "ff_norm" in blocks and all(nm in blocks for nm in ff_names):
        w_amax = jnp.stack(
            [_row_amax(blocks[nm]) for nm in ff_names]
        ).max(axis=0)
        s = _smooth_scales(stats["mlp_in"], w_amax, alpha)
        blocks["ff_norm"] = _scale_norm(blocks["ff_norm"], s, gemma)
        for nm in ff_names:
            blocks[nm] = _scale_rows(blocks[nm], s)

    # -- site 4: up_proj output channels -> block ff_out (llama only) ---
    if cfg.block_type == "llama" and "up_proj" in blocks:
        s = _smooth_scales(
            stats["mlp_mid"], _row_amax(blocks["ff_out"]), alpha
        )
        blocks["up_proj"] = _scale_cols(blocks["up_proj"], 1.0 / s)
        blocks["ff_out"] = _scale_rows(blocks["ff_out"], s)

    # -- site 5: ln_f -> vocab head (untied only) -----------------------
    if not cfg.weight_tying and "ff_out" in params and "ln_f" in params:
        s = _smooth_scales(
            stats["head_in"], _row_amax(params["ff_out"]), alpha
        )
        out["ln_f"] = _scale_norm(params["ln_f"], s, gemma)
        out["ff_out"] = _scale_rows(params["ff_out"], s)

    out["blocks"] = blocks
    return out


def smooth_quantize(
    params: Params,
    cfg,
    calib_batches: Sequence[jax.Array],
    alpha: float = 0.5,
    activations: bool = True,
    quantize_head: bool = True,
    policy: Policy = FP32,
    stats: Optional[dict] = None,
) -> Params:
    """Calibrate -> migrate -> quantize. `activations=True` yields W8A8
    (the scheme migration exists for); False gives weight-only int8 on the
    migrated weights (useful as an ablation control)."""
    if stats is None:
        stats = collect_stats(params, cfg, calib_batches, policy=policy)
    migrated = migrate_params(params, cfg, stats, alpha=alpha)
    return Q.quantize_llada_params(
        migrated, quantize_head=quantize_head, activations=activations
    )
