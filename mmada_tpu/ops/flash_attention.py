"""Pallas fused bidirectional attention for TPU.

Replaces the reference's CUDA flash-attn / SDPA calls
(models/modeling_llada.py:574-581, 624-660) with a TPU kernel. MMaDA
sequences are short (≤ ~2.1k fused tokens: 512 text + 1026 image frame, see
SURVEY.md §5 long-context notes), so the whole K/V row for one (batch, head)
fits comfortably in VMEM (2k × 128 × bf16 = 512 KB). Three variants, picked
by ops/attention.bidirectional_attention:

  * one-pass (`flash_attention`, L ≤ 4096): scores in fp32 on the MXU,
    softmax on the VPU, weighted sum back on the MXU — no online-softmax
    carry, which beats a flash-style two-pass at MMaDA's shapes;
  * online (`flash_attention_online`, L ≤ 8192 unbiased): K/V whole in VMEM,
    fori_loop over K blocks with a running (max, sum, acc);
  * staged (`flash_attention_staged`, unbounded L, biased or not): K is a
    sequential grid axis; K/V and the bias stream through VMEM per
    (block_q, block_k) tile with the carry in VMEM scratch.

GQA is expressed through BlockSpec index maps (q head h reads kv head
h // rep) so grouped K/V are never materialized, unlike the reference's
`repeat_interleave` (modeling_llada.py:646-650).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rope_tile(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    """Neox rotate-half RoPE on a (n, D) q/k tile: fp32 math, cast back to
    the tile dtype — value-matching llada.apply_rope(full_precision=True),
    but executed in VMEM so the rotation costs zero extra HBM traffic
    (measured ~5% of the flagship forward when done as a separate XLA pass)."""
    xf = x.astype(jnp.float32)
    d2 = xf.shape[-1] // 2
    rot = jnp.concatenate([-xf[:, d2:], xf[:, :d2]], axis=-1)
    return (xf * cos + rot * sin).astype(x.dtype)


_NEG_F32 = float(jnp.finfo(jnp.float32).min)


def _mask_padded_cols(s: jax.Array, valid_len) -> jax.Array:
    """Mask key columns >= valid_len (sequence padded up to a 128 multiple).
    Finite min instead of -inf so all-padded QUERY rows (discarded by the
    caller's slice) stay NaN-free through the softmax."""
    if valid_len is None or valid_len >= s.shape[-1]:
        return s
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(col < valid_len, s, _NEG_F32)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 rope_refs=(), valid_len=None):
    q_in = q_ref[0, 0]                             # (bq, D)
    k_in = k_ref[0, 0]                             # (L, D)
    if rope_refs:
        sin_q, cos_q, sin_k, cos_k = rope_refs
        q_in = _rope_tile(q_in, sin_q[...], cos_q[...])
        k_in = _rope_tile(k_in, sin_k[...], cos_k[...])
    q = q_in.astype(jnp.float32)
    k = k_in.astype(jnp.float32)
    v = v_ref[0, 0]                                # (L, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                      # (bq, L)
    s = _mask_padded_cols(s, valid_len)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    # normalize BEFORE the bf16 cast: end-normalization (divide the
    # (bq, D) output instead of the (bq, L) probabilities) saves 12x the
    # VPU divides but changes which values round under bf16 — measured
    # ~49% of outputs differ, which breaks the token-exact T=0 sampler
    # invariant and desyncs this forward from its XLA-recompute backward
    # (ADVICE r4). Keep the exact order; revisit only behind an opt-in
    # flag plus an on-chip T=0 regate.
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _attn_rope_kernel(q_ref, k_ref, v_ref, sq_ref, cq_ref, sk_ref, ck_ref,
                      o_ref, *, scale: float, valid_len=None):
    _attn_kernel(q_ref, k_ref, v_ref, o_ref, scale=scale,
                 rope_refs=(sq_ref, cq_ref, sk_ref, ck_ref),
                 valid_len=valid_len)


def _attn_kernel_interleaved(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                             rope_refs=(), valid_len=None):
    """One-pass kernel with the q block split in two interleaved halves.

    Same math as _attn_kernel (bit-identical per half). The point is
    SCHEDULING: the fp32 softmax of half 0 has no data dependence on
    half 1's QK^T dot, and half 1's softmax none on half 0's PV dot —
    written straight-line, Mosaic's VLIW scheduler may overlap VPU
    (exp/reduce) with MXU (dot) work that the single-block body
    serializes (the profiled one-pass kernel reaches only 63% of bf16
    peak at the t2i shape, and the gap is softmax-shaped). Opt-in via
    flash_attention(interleave=True); promoted only if the chip A/B
    (tools/bench_attn_interleave.py) wins."""
    q_in = q_ref[0, 0]
    k_in = k_ref[0, 0]
    if rope_refs:
        sin_q, cos_q, sin_k, cos_k = rope_refs
        q_in = _rope_tile(q_in, sin_q[...], cos_q[...])
        k_in = _rope_tile(k_in, sin_k[...], cos_k[...])
    q = q_in.astype(jnp.float32)
    k = k_in.astype(jnp.float32)
    v = v_ref[0, 0]
    h = q.shape[0] // 2
    q0, q1 = q[:h], q[h:]

    s0 = jax.lax.dot_general(
        q0, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                       # MXU
    s1 = jax.lax.dot_general(
        q1, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                       # MXU (independent)
    s0 = _mask_padded_cols(s0, valid_len)
    p0 = jnp.exp(s0 - jnp.max(s0, axis=-1, keepdims=True))   # VPU
    p0 = p0 / jnp.sum(p0, axis=-1, keepdims=True)
    o0 = jnp.dot(p0.astype(v.dtype), v,
                 preferred_element_type=jnp.float32)         # MXU
    s1 = _mask_padded_cols(s1, valid_len)
    p1 = jnp.exp(s1 - jnp.max(s1, axis=-1, keepdims=True))   # VPU ∥ o0 dot
    p1 = p1 / jnp.sum(p1, axis=-1, keepdims=True)
    o1 = jnp.dot(p1.astype(v.dtype), v,
                 preferred_element_type=jnp.float32)
    o_ref[0, 0] = jnp.concatenate(
        [o0, o1], axis=0).astype(o_ref.dtype)


def _attn_rope_kernel_interleaved(q_ref, k_ref, v_ref, sq_ref, cq_ref,
                                  sk_ref, ck_ref, o_ref, *, scale: float,
                                  valid_len=None):
    _attn_kernel_interleaved(q_ref, k_ref, v_ref, o_ref, scale=scale,
                             rope_refs=(sq_ref, cq_ref, sk_ref, ck_ref),
                             valid_len=valid_len)


def _attn_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float,
                      rope_refs=(), valid_len=None):
    q_in = q_ref[0, 0]
    k_in = k_ref[0, 0]
    if rope_refs:
        sin_q, cos_q, sin_k, cos_k = rope_refs
        q_in = _rope_tile(q_in, sin_q[...], cos_q[...])
        k_in = _rope_tile(k_in, sin_k[...], cos_k[...])
    q = q_in.astype(jnp.float32)
    k = k_in.astype(jnp.float32)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + b_ref[0, 0].astype(jnp.float32)
    s = _mask_padded_cols(s, valid_len)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    # normalize before the cast, as in _attn_kernel (bf16-exact order)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _attn_rope_bias_kernel(q_ref, k_ref, v_ref, b_ref, sq_ref, cq_ref,
                           sk_ref, ck_ref, o_ref, *, scale: float,
                           valid_len=None):
    _attn_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, scale=scale,
                      rope_refs=(sq_ref, cq_ref, sk_ref, ck_ref),
                      valid_len=valid_len)


def _fit_block(preferred: int, l: int) -> int:
    """Largest power-of-two block ≤ preferred that divides l (min 128)."""
    blk = min(preferred, l)
    while blk > 128 and l % blk:
        blk //= 2
    if l % blk:
        raise ValueError(f"seq_len {l} not divisible by any block ≥128")
    return blk


_SCORE_TILE_BUDGET = 10 << 20  # bytes of VMEM for the (block_q, Lk) fp32 tile


def _overpad_lq(lq: int, lk: int) -> int:
    """Query rows may pad BEYOND the 128 tile when a slightly longer Lq
    admits a much larger row block. Divisor-poor lengths are otherwise
    stuck at tiny blocks — the MMU frame's 2176 = 128·17 runs bq=128,
    while 2304 = 2·1152 runs a 9x larger block 6% faster INCLUDING the
    extra rows (r05 chip A/B; bitwise-identical — padded rows are sliced
    off the output and attend nothing that exists). Candidates up to
    ~+12.5% rows are priced with a measured per-row cost model
    (c(bq) ≈ 1 + 16/bq, fit to the r05 block sweeps)."""
    def cost(cand):
        return cand * (1.0 + 16.0 / _auto_block_q(cand, lk))

    best = lq
    for cand in range(lq, lq + max(128, lq // 8) + 1, 128):
        if cost(cand) < cost(best):
            best = cand
    return best


def _auto_block_q(lq: int, lk: int) -> int:
    """Largest 128-multiple divisor of lq whose fp32 score tile against
    lk keys fits the VMEM budget (see the r05 sweep note at the call
    site). Falls back to 128 when lq has no larger aligned divisor
    (e.g. 2176 = 128·17)."""
    best = 128
    for bq in range(128, lq + 1, 128):
        if lq % bq == 0 and bq * lk * 4 <= _SCORE_TILE_BUDGET:
            best = bq
    return best


def _attn_online_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                        block_k: int, seq_len: int):
    """Online-softmax (flash) variant: K/V walked in blocks with running
    (max, sum, accumulator) — VMEM use is O(block_q · block_k), so sequence
    length is unbounded. Used beyond the one-pass kernel's L ≤ 4096 range."""
    q = q_ref[0, 0].astype(jnp.float32) * scale        # (bq, D)
    bq, d = q.shape
    num_kb = seq_len // block_k

    def body(i, carry):
        acc, m, s = carry
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                               # (bq, bk)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        s_new = s * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return acc_new, m_new, s_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, s = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, s0))
    # same 1e-30 denominator guard as the bias/staged kernels: the no-bias
    # path cannot produce an all -inf row today, but keep the three kernels
    # numerically interchangeable
    o_ref[0, 0] = (acc / jnp.maximum(s, 1e-30)).astype(o_ref.dtype)


def _attn_online_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *,
                             scale: float, block_k: int, seq_len: int):
    """Online-softmax with an additive fp32 bias row block (bq, L) walked in
    (bq, block_k) tiles alongside K/V."""
    q = q_ref[0, 0].astype(jnp.float32) * scale
    bq, d = q.shape
    num_kb = seq_len // block_k

    def body(i, carry):
        acc, m, s = carry
        k = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        bias = b_ref[0, 0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) + bias
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        s_new = s * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return acc_new, m_new, s_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, s = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, s0))
    o_ref[0, 0] = (acc / jnp.maximum(s, 1e-30)).astype(o_ref.dtype)


def _attn_staged_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, s_ref,
                        *, scale: float, num_kb: int, bias_ref=None):
    """Fully staged flash kernel: the K axis is a sequential grid dimension,
    so K/V AND the optional bias are staged per (block_q, block_k) tile —
    VMEM is O(block_q·(block_k + D)) regardless of L. Running (max, sum,
    accumulator) live in VMEM scratch across the sequential ki steps (m/s
    broadcast over 128 lanes — Mosaic-friendly store shape)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[...] = jnp.zeros_like(s_ref)

    q = q_ref[0, 0].astype(jnp.float32) * scale        # (bq, D)
    k = k_ref[0, 0].astype(jnp.float32)                # (bk, D)
    v = v_ref[0, 0].astype(jnp.float32)                # (bk, D)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                  # (bq, bk)
    if bias_ref is not None:
        scores = scores + bias_ref[0, 0].astype(jnp.float32)

    m_prev = m_ref[:, :1]                              # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)
    s_new = s_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    s_ref[...] = jnp.broadcast_to(s_new, s_ref.shape)

    @pl.when(ki == num_kb - 1)
    def _final():
        o_ref[0, 0] = (
            acc_ref[...] / jnp.maximum(s_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


def _attn_staged_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref,
                             acc_ref, m_ref, s_ref, *, scale, num_kb):
    _attn_staged_kernel(
        q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, s_ref,
        scale=scale, num_kb=num_kb, bias_ref=b_ref,
    )


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_staged(
    q: jax.Array,  # (B, H, L, D)
    k: jax.Array,  # (B, KVH, L, D)
    v: jax.Array,
    bias: Optional[jax.Array] = None,  # (B|1, 1|H, L, L) bool or float
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with K as a sequential grid axis: K/V and bias tiles
    stream through VMEM block-by-block, so both sequence length and biased
    sequence length are unbounded (the variant `flash_attention_online`'s
    (block_q, L) bias tile could not reach past ~4k). Default blocks from
    the r05 chip sweep at L=8192: (512, 1024) is +79% over the old
    (256, 512) (86.1 vs 48.0 TFLOP/s) — the per-(bq, bk) carry update
    cost dominates at small tiles; compiles through L=16384+."""
    b, h, l, d = q.shape
    kvh = k.shape[1]
    rep = h // kvh
    block_q = _fit_block(block_q, l)
    block_k = _fit_block(block_k, l)
    scale = 1.0 / (d ** 0.5)
    num_kb = l // block_k
    grid = (b, h, l // block_q, num_kb)

    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi // rep, ki, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    scratch = [
        pltpu.VMEM((block_q, d), jnp.float32),    # acc
        pltpu.VMEM((block_q, 128), jnp.float32),  # running max
        pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
    ]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )

    if bias is None:
        return pl.pallas_call(
            functools.partial(_attn_staged_kernel, scale=scale, num_kb=num_kb),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(q, k, v)

    if bias.dtype == jnp.bool_:
        bias = jnp.where(bias, 0.0, float(jnp.finfo(jnp.float32).min))
    bias = bias.astype(jnp.float32)
    bias_b = 0 if bias.shape[0] == 1 else None
    bias_h = 0 if bias.shape[1] == 1 else None
    b_spec = pl.BlockSpec(
        (1, 1, block_q, block_k),
        lambda bi, hi, qi, ki: (
            bias_b if bias_b is not None else bi,
            bias_h if bias_h is not None else hi,
            qi,
            ki,
        ),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _attn_staged_bias_kernel, scale=scale, num_kb=num_kb
        ),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, b_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention_online(
    q: jax.Array,  # (B, H, L, D)
    k: jax.Array,  # (B, KVH, L, D)
    v: jax.Array,
    bias: Optional[jax.Array] = None,  # (B|1, 1|H, L, L) bool or float
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Length-unbounded flash attention (online softmax over K blocks),
    with optional additive/boolean bias. Default blocks from the r05
    chip sweep at L=8192: (512, 1024) is +13% over the old (256, 512)
    (97.2 vs 86.0 TFLOP/s); (1024, 2048) fails to compile. Past 8192
    the whole-in-VMEM K/V plus these tiles exceed VMEM — the dispatch
    routes L > 8192 to the staged tier, which at the same blocks
    matches this tier's OLD rate."""
    b, h, l, d = q.shape
    kvh = k.shape[1]
    rep = h // kvh
    block_q = _fit_block(block_q, l)
    block_k = _fit_block(block_k, l)
    scale = 1.0 / (d ** 0.5)
    grid = (b, h, l // block_q)
    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    # K/V stay whole in VMEM (2 MB per (b,h) at L=8k,D=128,bf16); the online
    # softmax removes the (block_q, L) score tile that capped the one-pass
    # kernel, extending usable L to 8192 at the r05 blocks (the staged
    # tier takes over beyond — same rate as this tier's old blocks).
    kv_spec = pl.BlockSpec((1, 1, l, d), lambda bi, hi, qi: (bi, hi // rep, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)

    if bias is None:
        return pl.pallas_call(
            functools.partial(
                _attn_online_kernel, scale=scale, block_k=block_k, seq_len=l
            ),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(q, k, v)

    if bias.dtype == jnp.bool_:
        bias = jnp.where(bias, 0.0, float(jnp.finfo(jnp.float32).min))
    bias = bias.astype(jnp.float32)
    bias_b = 0 if bias.shape[0] == 1 else None
    bias_h = 0 if bias.shape[1] == 1 else None
    b_spec = pl.BlockSpec(
        (1, 1, block_q, l),
        lambda bi, hi, qi: (
            bias_b if bias_b is not None else bi,
            bias_h if bias_h is not None else hi,
            qi,
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(
            _attn_online_bias_kernel, scale=scale, block_k=block_k, seq_len=l
        ),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, b_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret", "interleave"))
def flash_attention(
    q: jax.Array,  # (B, H, L, D)
    k: jax.Array,  # (B, KVH, L, D)
    v: jax.Array,  # (B, KVH, L, D)
    bias: Optional[jax.Array] = None,  # (B|1, 1|H, L, L) float32 additive
    block_q: Optional[int] = None,
    interpret: bool = False,
    rope_sin: Optional[jax.Array] = None,  # (L, D) fp32 — fuse RoPE on q/k
    rope_cos: Optional[jax.Array] = None,
    interleave: bool = False,  # experimental 2-half MXU/VPU overlap body
) -> jax.Array:
    b, h, lq_in, d = q.shape
    lk_in = k.shape[2]
    kvh = k.shape[1]
    rep = h // kvh

    # Rectangular shapes (q_len != kv_len) are first-class: the KV-cached
    # decode (llada.forward_kv_step) attends a span of fresh queries to the
    # full cached sequence. The score tile is (block_q, Lk); only padded
    # KEY columns need masking.
    #
    # Unaligned sequence lengths (serving prompts are arbitrary): pad each
    # axis up to the 128 tile, mask the padded KEY columns in-kernel
    # (finite min), and slice the padded QUERY rows off the output.
    # Semantics match the unpadded kernel exactly; without this every
    # non-multiple-of-128 sequence (e.g. the 1194-token MMU frame) lost
    # the kernel AND the fused rope to the XLA fallback.
    lq = -(-lq_in // 128) * 128
    lk = -(-lk_in // 128) * 128
    if block_q is None and bias is None:
        # divisor-poor Lq may pad BEYOND the 128 tile when a slightly
        # longer frame admits a much larger row block (see _overpad_lq)
        lq = _overpad_lq(lq, lk)
    valid_len = lk_in if lk != lk_in else None
    # rope tables pad per-axis: q tables to the (possibly over-padded)
    # Lq, k tables to Lk — padded q rows are sliced off the output, so
    # their zero-rotation is never observed
    rope_sin_k, rope_cos_k = rope_sin, rope_cos
    if lq != lq_in:
        pad_q = ((0, 0), (0, 0), (0, lq - lq_in), (0, 0))
        q = jnp.pad(q, pad_q)
        if rope_sin is not None:
            rope_sin = jnp.pad(rope_sin, ((0, lq - lq_in), (0, 0)))
            rope_cos = jnp.pad(rope_cos, ((0, lq - lq_in), (0, 0)))
    if lk != lk_in:
        pad_k = ((0, 0), (0, 0), (0, lk - lk_in), (0, 0))
        k, v = jnp.pad(k, pad_k), jnp.pad(v, pad_k)
        if rope_sin_k is not None:
            rope_sin_k = jnp.pad(rope_sin_k, ((0, lk - lk_in), (0, 0)))
            rope_cos_k = jnp.pad(rope_cos_k, ((0, lk - lk_in), (0, 0)))
    if bias is not None and (lq != lq_in or lk != lk_in):
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, lq - lq_in), (0, lk - lk_in)),
            constant_values=True if bias.dtype == jnp.bool_ else 0.0,
        )
    if rope_sin is not None and lq_in != lk_in:
        # compare INPUT lengths: rectangular q/k that pad up to the same
        # tile must still be rejected, or trailing real keys would be
        # rotated by the zero-padded table rows
        raise ValueError(
            "fused rope requires square attention (one (L, D) table for "
            "both q and k); rectangular callers pre-rotate"
        )

    if block_q is None:
        if bias is None:
            # r05 chip sweep (rope-fused, B8 H32 D128): the largest
            # row-block whose fp32 score tile fits a 10 MB VMEM budget
            # wins — whole-row bq=1536 beats 512 by 8.8% at L=1536
            # (3.210 vs 3.496 ms/call), bq=1024 beats 512 by 4.8% at
            # L=2048; past the budget Mosaic fails to compile (bq=2048
            # at L=2048). Fewer blocks = fewer softmax reduction passes
            # (the reductions are 23% of kernel time, ATTN_PARTS_r05).
            # Block choice is pure row-partitioning — outputs are
            # bitwise-identical across block sizes (chip-verified).
            block_q = _auto_block_q(lq, lk)
        else:
            # bias path stages a second (block_q, Lk) fp32 tile —
            # conservative r03 defaults
            block_q = 512 if lq <= 2048 else 256
    block_q = _fit_block(block_q, lq)
    scale = 1.0 / (d ** 0.5)
    grid = (b, h, lq // block_q)

    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(
        (1, 1, lk, d), lambda bi, hi, qi: (bi, hi // rep, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    flops = 4 * b * h * lq * lk * d
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(q.size + k.size * rep + v.size * rep + q.size) * q.dtype.itemsize,
        transcendentals=b * h * lq * lk,
    )

    def unpad(out):
        return out[:, :, :lq_in, :] if lq != lq_in else out

    rope_args: tuple = ()
    rope_specs: list = []
    if rope_sin is not None:
        assert rope_sin.shape == (lq, d) and rope_cos.shape == (lq, d)
        assert rope_sin_k.shape == (lk, d) and rope_cos_k.shape == (lk, d)
        sin32 = rope_sin.astype(jnp.float32)
        cos32 = rope_cos.astype(jnp.float32)
        sink32 = rope_sin_k.astype(jnp.float32)
        cosk32 = rope_cos_k.astype(jnp.float32)
        # q rotates per (block_q, D) tile; k is whole-in-VMEM so its tables
        # ride along whole too — at their OWN length (lq may over-pad)
        sq_spec = pl.BlockSpec(
            (block_q, d), lambda bi, hi, qi: (qi, 0), memory_space=pltpu.VMEM
        )
        sk_spec = pl.BlockSpec(
            (lk, d), lambda bi, hi, qi: (0, 0), memory_space=pltpu.VMEM
        )
        rope_args = (sin32, cos32, sink32, cosk32)
        rope_specs = [sq_spec, sq_spec, sk_spec, sk_spec]

    if bias is None:
        use_il = interleave and block_q % 2 == 0
        kernel = (
            functools.partial(
                _attn_rope_kernel_interleaved if use_il
                else _attn_rope_kernel, scale=scale, valid_len=valid_len
            )
            if rope_args
            else functools.partial(
                _attn_kernel_interleaved if use_il else _attn_kernel,
                scale=scale, valid_len=valid_len
            )
        )
        return unpad(pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, *rope_specs],
            out_specs=out_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v, *rope_args))

    if bias.dtype == jnp.bool_:
        # boolean bias marks ALLOWED pairs (ops/attention.py contract);
        # astype would turn it into a +0/+1 additive bias
        bias = jnp.where(bias, 0.0, float(jnp.finfo(jnp.float32).min))
    bias = bias.astype(jnp.float32)
    bias_b = 0 if bias.shape[0] == 1 else None
    bias_h = 0 if bias.shape[1] == 1 else None
    b_spec = pl.BlockSpec(
        (1, 1, block_q, lk),
        lambda bi, hi, qi: (
            bias_b if bias_b is not None else bi,
            bias_h if bias_h is not None else hi,
            qi,
            0,
        ),
        memory_space=pltpu.VMEM,
    )
    kernel = (
        functools.partial(
            _attn_rope_bias_kernel, scale=scale, valid_len=valid_len
        )
        if rope_args
        else functools.partial(
            _attn_bias_kernel, scale=scale, valid_len=valid_len
        )
    )
    return unpad(pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, b_spec, *rope_specs],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v, bias, *rope_args))


# ---------------------------------------------------------------------------
# Backward kernels (one-pass tier). The reference trains with CUDA
# flash-attn in the hot path (modeling_llada.py:574-581); until round 3 this
# build's backward re-computed attention in XLA (ops/attention custom_vjp),
# paying the full attention twice. These kernels implement the classic
# split flash backward:
#
#   dq kernel  — grid (B, H, Lq/bq): recomputes its score rows against the
#                whole K (same one-pass regime as the forward), forms
#                p = softmax(s), dp = dO V^T, ds = p (dp - delta),
#                dq = ds K · scale; ALSO emits each row's logsumexp, which
#                the dkv kernel needs for its column slices.
#   dkv kernel — grid (B, H, Lk/bk): p columns against the whole Q via the
#                saved lse, dv = p^T dO, dk = ds^T Q · scale.
#
# delta = rowsum(dO ⊙ O) is computed once in XLA from the saved forward
# output (cheap elementwise). Unaligned L is padded to the 128 tile with
# zero dO rows — all padded contributions vanish identically (p rows stay
# finite via the same finite-min column mask as the forward).
# ---------------------------------------------------------------------------


def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, delta_ref,
                        dq_ref, lse_ref, *, scale: float, bias_ref=None,
                        valid_len=None):
    q = q_ref[0, 0].astype(jnp.float32)        # (bq, D)
    k = k_ref[0, 0].astype(jnp.float32)        # (L, D)
    v = v_ref[0, 0].astype(jnp.float32)        # (L, D)
    do = do_ref[0, 0].astype(jnp.float32)      # (bq, D)
    delta = delta_ref[0, 0].astype(jnp.float32)  # (bq, 128) broadcast lanes
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # (bq, L)
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    s = _mask_padded_cols(s, valid_len)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # (bq, L)
    ds = p * (dp - delta[:, :1])
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l), lse_ref.shape[2:])


def _attn_bwd_dq_bias_kernel(q_ref, k_ref, v_ref, do_ref, delta_ref, b_ref,
                             dq_ref, lse_ref, *, scale, valid_len=None):
    _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, delta_ref,
                        dq_ref, lse_ref, scale=scale, bias_ref=b_ref,
                        valid_len=valid_len)


def _attn_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dk_ref, dv_ref, *, scale: float, group: int = 1,
                         bias_ref=None):
    q = q_ref[0, 0].astype(jnp.float32)        # (Lq, D)
    k = k_ref[0, 0].astype(jnp.float32)        # (bk, D)
    v = v_ref[0, 0].astype(jnp.float32)        # (bk, D)
    do = do_ref[0, 0].astype(jnp.float32)      # (Lq, D)
    lse = lse_ref[0, 0].astype(jnp.float32)    # (Lq, 128) broadcast lanes
    delta = delta_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # (Lq, bk)
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    # no column mask needed: padded KEY rows of this block get p from
    # finite scores, but their dk/dv rows are sliced off by the caller;
    # padded QUERY rows carry zero dO and zero delta, so ds vanishes.
    p = jnp.exp(s - lse[:, :1])                # (Lq, bk)
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # (bk, D)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)  # (Lq, bk)
    ds = p * (dp - delta[:, :1])
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                  # (bk, D)
    if group == 1:
        dk_ref[0, 0] = dk.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    else:
        # GQA: the innermost grid axis walks the `group` query heads that
        # share this KV head; the output block is revisited across those
        # iterations (index map ignores gi) and accumulates in fp32
        gi = pl.program_id(3)

        @pl.when(gi == 0)
        def _first():
            dk_ref[0, 0] = dk.astype(dk_ref.dtype)
            dv_ref[0, 0] = dv.astype(dv_ref.dtype)

        @pl.when(gi > 0)
        def _rest():
            dk_ref[0, 0] += dk.astype(dk_ref.dtype)
            dv_ref[0, 0] += dv.astype(dv_ref.dtype)


def _attn_bwd_dkv_bias_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                              delta_ref, b_ref, dk_ref, dv_ref, *, scale,
                              group: int = 1):
    _attn_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dk_ref, dv_ref, scale=scale, group=group,
                         bias_ref=b_ref)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention_bwd(
    q: jax.Array,   # (B, H, L, D) — ROPED (callers pre-rotate; the rope
    k: jax.Array,   #   pullback happens outside, see ops/attention.py)
    v: jax.Array,
    out: jax.Array,  # saved forward output
    ct: jax.Array,   # output cotangent
    bias: Optional[jax.Array] = None,  # (B|1, 1|H, L, L) float32 additive
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
):
    """(dq, dk, dv) for the one-pass-tier regime (whole-K rows in VMEM for
    dq, whole-Q rows for dkv). Handles rectangular Lq != Lk (independent
    128-padding per axis, like the forward one-pass tier) and GQA
    (n_kv_heads < n_heads: the dq kernel index-maps each query head to its
    shared KV head; the dkv grid walks the `group` query heads of a KV head
    on its innermost axis and accumulates dk/dv in fp32 — the
    q-head→kv-head reduction the reference's flash-attn backward performs,
    modeling_llada.py:646-650)."""
    b, h, lq_in, d = q.shape
    kvh, lk_in = k.shape[1], k.shape[2]
    assert h % kvh == 0, "query heads must evenly group over kv heads"
    group = h // kvh
    if block_q is None:
        block_q = 512 if lq_in <= 2048 else 256
    if block_k is None:
        block_k = 512 if lk_in <= 2048 else 256

    lq = -(-lq_in // 128) * 128
    lk = -(-lk_in // 128) * 128
    valid_len = lk_in if lk != lk_in else None
    if lq != lq_in:
        pad_q = ((0, 0), (0, 0), (0, lq - lq_in), (0, 0))
        q = jnp.pad(q, pad_q)
        out, ct = jnp.pad(out, pad_q), jnp.pad(ct, pad_q)
    if lk != lk_in:
        pad_k = ((0, 0), (0, 0), (0, lk - lk_in), (0, 0))
        k, v = jnp.pad(k, pad_k), jnp.pad(v, pad_k)
    if bias is not None and (lq != lq_in or lk != lk_in):
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, lq - lq_in),
                              (0, lk - lk_in)))
    block_q = _fit_block(block_q, lq)
    block_k = _fit_block(block_k, lk)
    scale = 1.0 / (d ** 0.5)

    # delta_i = sum_d dO_id O_id, broadcast over 128 lanes for a
    # Mosaic-friendly (sublane, lane) layout (same trick as the staged
    # kernel's running max/sum scratch)
    delta = jnp.sum(
        ct.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[..., None]                                    # (B, H, Lq, 1)
    delta = jnp.broadcast_to(delta, (b, h, lq, 128))

    row_spec_q = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    full_spec_k = pl.BlockSpec(  # whole K/V rows for this q head's KV head
        (1, 1, lk, d), lambda bi, hi, qi: (bi, hi // group, 0, 0),
        memory_space=pltpu.VMEM,
    )
    stat_blk_spec = pl.BlockSpec(
        (1, 1, block_q, 128), lambda bi, hi, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    bias_args, bias_specs = (), []
    if bias is not None:
        bias = bias.astype(jnp.float32)
        bias_b = 0 if bias.shape[0] == 1 else None
        bias_h = 0 if bias.shape[1] == 1 else None
        bias_args = (bias,)
        bias_specs = [pl.BlockSpec(
            (1, 1, block_q, lk),
            lambda bi, hi, qi: (
                bias_b if bias_b is not None else bi,
                bias_h if bias_h is not None else hi, qi, 0,
            ),
            memory_space=pltpu.VMEM,
        )]

    dq_kernel = (
        functools.partial(_attn_bwd_dq_bias_kernel, scale=scale,
                          valid_len=valid_len)
        if bias is not None
        else functools.partial(_attn_bwd_dq_kernel, scale=scale,
                               valid_len=valid_len)
    )
    dq, lse = pl.pallas_call(
        dq_kernel,
        grid=(b, h, lq // block_q),
        in_specs=[row_spec_q, full_spec_k, full_spec_k, row_spec_q,
                  stat_blk_spec, *bias_specs],
        out_specs=[row_spec_q, stat_blk_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, lq, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * lq * lk * d,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=interpret,
    )(q, k, v, ct, delta, *bias_args)

    # dkv grid: (batch, kv head, k block, [q-head group]) — the group axis
    # exists only under GQA; its iterations revisit the same output block
    dkv_grid = (b, kvh, lk // block_k) + ((group,) if group > 1 else ())
    if group > 1:
        def _kvmap(bi, hi, ki, gi):
            return (bi, hi, ki, 0)

        def _qmap(bi, hi, ki, gi):
            return (bi, hi * group + gi, 0, 0)

        def _outmap(bi, hi, ki, gi):
            return (bi, hi, ki, 0)
    else:
        def _kvmap(bi, hi, ki):
            return (bi, hi, ki, 0)

        def _qmap(bi, hi, ki):
            return (bi, hi, 0, 0)

        _outmap = _kvmap
    row_spec_k = pl.BlockSpec((1, 1, block_k, d), _kvmap,
                              memory_space=pltpu.VMEM)
    out_spec_k = pl.BlockSpec((1, 1, block_k, d), _outmap,
                              memory_space=pltpu.VMEM)
    full_spec_q = pl.BlockSpec((1, 1, lq, d), _qmap,
                               memory_space=pltpu.VMEM)
    stat_full_spec = pl.BlockSpec((1, 1, lq, 128), _qmap,
                                  memory_space=pltpu.VMEM)
    dkv_bias_specs = []
    if bias is not None:
        if group > 1:
            def _bmap(bi, hi, ki, gi):
                return (bias_b if bias_b is not None else bi,
                        bias_h if bias_h is not None else hi * group + gi,
                        0, ki)
        else:
            def _bmap(bi, hi, ki):
                return (bias_b if bias_b is not None else bi,
                        bias_h if bias_h is not None else hi, 0, ki)
        dkv_bias_specs = [pl.BlockSpec((1, 1, lq, block_k), _bmap,
                                       memory_space=pltpu.VMEM)]
    dkv_kernel = (
        functools.partial(_attn_bwd_dkv_bias_kernel, scale=scale,
                          group=group)
        if bias is not None
        else functools.partial(_attn_bwd_dkv_kernel, scale=scale,
                               group=group)
    )
    # GQA accumulates across the group axis — keep those outputs fp32
    kv_dtype = k.dtype if group == 1 else jnp.float32
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=dkv_grid,
        in_specs=[full_spec_q, row_spec_k, row_spec_k, full_spec_q,
                  stat_full_spec, stat_full_spec, *dkv_bias_specs],
        out_specs=[out_spec_k, out_spec_k],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, kv_dtype),
            jax.ShapeDtypeStruct(v.shape, kv_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * lq * lk * d,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=interpret,
    )(q, k, v, ct, lse, delta, *bias_args)
    if group > 1:
        dk, dv = dk.astype(k.dtype), dv.astype(v.dtype)

    if lq != lq_in:
        dq = dq[:, :, :lq_in, :]
    if lk != lk_in:
        dk = dk[:, :, :lk_in, :]
        dv = dv[:, :, :lk_in, :]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Staged backward (unbounded L) — VERDICT r4 #5. The one-pass backward
# above holds whole K rows (dq kernel) / whole Q rows (dkv kernel) in
# VMEM, capping both sequence lengths at 4096; past that the forward's
# streamed tiers used to pair with an XLA-recompute backward (silent
# ~12% training-step cliff for long-seq experiments). These kernels
# stream the reduction axis as a sequential grid dimension with fp32
# accumulators in VMEM scratch, so VMEM is O(block_q·block_k) and L is
# unbounded:
#
#   dq kernel  — grid (B, H, Lq/bq, Lk/bk), K sequential. Online-softmax
#                carry (m, l) like the staged forward, with the dq
#                accumulator rescaled by alpha each step (the same trick
#                the forward applies to its output accumulator works for
#                dq because delta_i is row-constant); emits lse for the
#                dkv pass at the final step — no separate LSE pass.
#   dkv kernel — grid (B, KVH, Lk/bk, G·Lq/bq), the query axis (folded
#                with the GQA group) sequential. p columns from the saved
#                lse; dk/dv accumulate in scratch across the whole walk
#                and write once at the end (no fp32-output revisit trick
#                needed).
#
# Both require 128-aligned Lq/Lk (the long-sequence callers control
# their shapes — same contract as the forward online/staged tiers).
# ---------------------------------------------------------------------------


def _attn_bwd_dq_staged_kernel(q_ref, k_ref, v_ref, do_ref, delta_ref,
                               dq_ref, lse_ref, dqacc_ref, m_ref, s_ref,
                               *, scale: float, num_kb: int, bias_ref=None):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dqacc_ref[...] = jnp.zeros_like(dqacc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[...] = jnp.zeros_like(s_ref)

    q = q_ref[0, 0].astype(jnp.float32)            # (bq, D)
    k = k_ref[0, 0].astype(jnp.float32)            # (bk, D)
    v = v_ref[0, 0].astype(jnp.float32)            # (bk, D)
    do = do_ref[0, 0].astype(jnp.float32)          # (bq, D)
    delta = delta_ref[0, 0].astype(jnp.float32)    # (bq, 128)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                      # (bq, bk)
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                         # unnormalized probs
    s_ref[...] = jnp.broadcast_to(
        s_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
        s_ref.shape)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # (bq, bk)
    t = p * (dp - delta[:, :1])
    dqacc_ref[...] = dqacc_ref[...] * alpha + jnp.dot(
        t, k, preferred_element_type=jnp.float32)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ki == num_kb - 1)
    def _final():
        l = jnp.maximum(s_ref[:, :1], 1e-30)
        dq_ref[0, 0] = (dqacc_ref[...] / l * scale).astype(dq_ref.dtype)
        lse_ref[0, 0] = jnp.broadcast_to(
            m_ref[:, :1] + jnp.log(l), lse_ref.shape[2:])


def _attn_bwd_dq_staged_bias_kernel(q_ref, k_ref, v_ref, do_ref, delta_ref,
                                    b_ref, dq_ref, lse_ref, dqacc_ref,
                                    m_ref, s_ref, *, scale, num_kb):
    _attn_bwd_dq_staged_kernel(q_ref, k_ref, v_ref, do_ref, delta_ref,
                               dq_ref, lse_ref, dqacc_ref, m_ref, s_ref,
                               scale=scale, num_kb=num_kb, bias_ref=b_ref)


def _attn_bwd_dkv_staged_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                                delta_ref, dk_ref, dv_ref, dkacc_ref,
                                dvacc_ref, *, scale: float, num_jb: int,
                                bias_ref=None):
    ji = pl.program_id(3)

    @pl.when(ji == 0)
    def _init():
        dkacc_ref[...] = jnp.zeros_like(dkacc_ref)
        dvacc_ref[...] = jnp.zeros_like(dvacc_ref)

    q = q_ref[0, 0].astype(jnp.float32)            # (bq, D)
    k = k_ref[0, 0].astype(jnp.float32)            # (bk, D)
    v = v_ref[0, 0].astype(jnp.float32)            # (bk, D)
    do = do_ref[0, 0].astype(jnp.float32)          # (bq, D)
    lse = lse_ref[0, 0].astype(jnp.float32)        # (bq, 128)
    delta = delta_ref[0, 0].astype(jnp.float32)    # (bq, 128)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                      # (bq, bk)
    if bias_ref is not None:
        s = s + bias_ref[0, 0].astype(jnp.float32)
    p = jnp.exp(s - lse[:, :1])                    # (bq, bk) normalized
    dvacc_ref[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # (bk, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # (bq, bk)
    ds = p * (dp - delta[:, :1])
    dkacc_ref[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                      # (bk, D)

    @pl.when(ji == num_jb - 1)
    def _final():
        dk_ref[0, 0] = dkacc_ref[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dvacc_ref[...].astype(dv_ref.dtype)


def _attn_bwd_dkv_staged_bias_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                                     delta_ref, b_ref, dk_ref, dv_ref,
                                     dkacc_ref, dvacc_ref, *, scale, num_jb):
    _attn_bwd_dkv_staged_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                                delta_ref, dk_ref, dv_ref, dkacc_ref,
                                dvacc_ref, scale=scale, num_jb=num_jb,
                                bias_ref=b_ref)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "interpret"))
def flash_attention_bwd_staged(
    q: jax.Array,   # (B, H, Lq, D) — ROPED, 128-aligned Lq
    k: jax.Array,   # (B, KVH, Lk, D) — 128-aligned Lk
    v: jax.Array,
    out: jax.Array,
    ct: jax.Array,
    bias: Optional[jax.Array] = None,  # (B|1, 1|H, Lq, Lk) float32
    block_q: int = 512,
    block_k: int = 1024,  # r05 chip A/B at L=8192: (512,1024) 58.8
    interpret: bool = False,  # TFLOP/s vs (512,512) 50.1 — +17%
):
    """(dq, dk, dv) with the reduction axes streamed — unbounded Lq/Lk.
    Same GQA contract as flash_attention_bwd (dk/dv reduce over the
    query-head group); the reference's long-context story is flash-attn's
    own streamed backward (modeling_llada.py:574-581)."""
    b, h, lq, d = q.shape
    kvh, lk = k.shape[1], k.shape[2]
    assert h % kvh == 0, "query heads must evenly group over kv heads"
    if lq % 128 or lk % 128:
        raise ValueError(
            f"staged backward requires 128-aligned seq lens, got {lq}/{lk}")
    group = h // kvh
    block_q = _fit_block(block_q, lq)
    block_k = _fit_block(block_k, lk)
    scale = 1.0 / (d ** 0.5)
    num_qb, num_kb = lq // block_q, lk // block_k

    delta = jnp.sum(
        ct.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[..., None]
    delta = jnp.broadcast_to(delta, (b, h, lq, 128))

    if bias is not None:
        bias = bias.astype(jnp.float32)
        bias_b = 0 if bias.shape[0] == 1 else None
        bias_h = 0 if bias.shape[1] == 1 else None

    # ---- dq pass: K sequential ----------------------------------------
    q_spec = pl.BlockSpec((1, 1, block_q, d),
                          lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, block_k, d),
                           lambda bi, hi, qi, ki: (bi, hi // group, ki, 0),
                           memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, block_q, 128),
                             lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                             memory_space=pltpu.VMEM)
    dq_bias_args, dq_bias_specs = (), []
    if bias is not None:
        dq_bias_args = (bias,)
        dq_bias_specs = [pl.BlockSpec(
            (1, 1, block_q, block_k),
            lambda bi, hi, qi, ki: (
                bias_b if bias_b is not None else bi,
                bias_h if bias_h is not None else hi, qi, ki),
            memory_space=pltpu.VMEM)]
    dq_kernel = (
        functools.partial(_attn_bwd_dq_staged_bias_kernel, scale=scale,
                          num_kb=num_kb)
        if bias is not None else
        functools.partial(_attn_bwd_dq_staged_kernel, scale=scale,
                          num_kb=num_kb))
    params = pltpu.CompilerParams(dimension_semantics=(
        "parallel", "parallel", "parallel", "arbitrary"))
    dq, lse = pl.pallas_call(
        dq_kernel,
        grid=(b, h, num_qb, num_kb),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, stat_spec,
                  *dq_bias_specs],
        out_specs=[q_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, h, lq, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),    # dq accumulator
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running sum
        ],
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * lq * lk * d,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=interpret,
    )(q, k, v, ct, delta, *dq_bias_args)

    # ---- dkv pass: query axis (folded with the GQA group) sequential --
    num_jb = group * num_qb

    def _qmap(bi, hi, ki, ji):
        return (bi, hi * group + ji // num_qb, ji % num_qb, 0)

    def _kvmap(bi, hi, ki, ji):
        return (bi, hi, ki, 0)

    qrow_spec = pl.BlockSpec((1, 1, block_q, d), _qmap,
                             memory_space=pltpu.VMEM)
    krow_spec = pl.BlockSpec((1, 1, block_k, d), _kvmap,
                             memory_space=pltpu.VMEM)
    qstat_spec = pl.BlockSpec((1, 1, block_q, 128), _qmap,
                              memory_space=pltpu.VMEM)
    dkv_bias_args, dkv_bias_specs = (), []
    if bias is not None:
        dkv_bias_args = (bias,)
        dkv_bias_specs = [pl.BlockSpec(
            (1, 1, block_q, block_k),
            lambda bi, hi, ki, ji: (
                bias_b if bias_b is not None else bi,
                bias_h if bias_h is not None else hi * group + ji // num_qb,
                ji % num_qb, ki),
            memory_space=pltpu.VMEM)]
    dkv_kernel = (
        functools.partial(_attn_bwd_dkv_staged_bias_kernel, scale=scale,
                          num_jb=num_jb)
        if bias is not None else
        functools.partial(_attn_bwd_dkv_staged_kernel, scale=scale,
                          num_jb=num_jb))
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b, kvh, lk // block_k, num_jb),
        in_specs=[qrow_spec, krow_spec, krow_spec, qrow_spec, qstat_spec,
                  qstat_spec, *dkv_bias_specs],
        out_specs=[krow_spec, krow_spec],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),    # dk accumulator
            pltpu.VMEM((block_k, d), jnp.float32),    # dv accumulator
        ],
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * lq * lk * d,
            bytes_accessed=4 * q.size * q.dtype.itemsize,
            transcendentals=b * h * lq * lk,
        ),
        interpret=interpret,
    )(q, k, v, ct, lse, delta, *dkv_bias_args)
    return dq, dk, dv
