"""Pallas fused attention parity vs the XLA reference implementation.

Runs in Pallas interpret mode on CPU; the same kernel compiles natively on
TPU (exercised by bench/serving paths there).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.ops.attention import xla_attention, NEG_INF
from mmada_tpu.ops.flash_attention import flash_attention


def make_qkv(rng, b, h, kvh, l, d, dtype=jnp.float32):
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, kvh, l, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, kvh, l, d)), dtype)
    return q, k, v


def test_flash_matches_xla_basic(rng):
    q, k, v = make_qkv(rng, 2, 4, 4, 256, 64)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_matches_xla_gqa(rng):
    q, k, v = make_qkv(rng, 2, 8, 2, 128, 64)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_with_bias(rng):
    b, h, l, d = 2, 4, 128, 64
    q, k, v = make_qkv(rng, b, h, h, l, d)
    mask = np.ones((b, l))
    mask[0, :17] = 0
    pair = (mask[:, :, None] * mask[:, None, :]) > 0
    bias = jnp.asarray(
        np.where(pair, 0.0, NEG_INF).astype(np.float32)[:, None]
    )
    want = xla_attention(q, k, v, bias=bias)
    got = flash_attention(q, k, v, bias=bias, block_q=64, interpret=True)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1, 3)[valid],
        np.asarray(want).transpose(0, 2, 1, 3)[valid],
        atol=2e-5,
    )


def test_flash_bfloat16(rng):
    q, k, v = make_qkv(rng, 1, 2, 2, 128, 64, jnp.bfloat16)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_flash_ragged_seq_pads_and_matches(rng):
    # previously rejected; the kernel now pads unaligned L internally and
    # masks the padded keys
    q, k, v = make_qkv(rng, 1, 2, 2, 100, 64)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=64, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_online_flash_matches_xla(rng):
    from mmada_tpu.ops.flash_attention import flash_attention_online

    q, k, v = make_qkv(rng, 1, 2, 2, 512, 64)
    want = xla_attention(q, k, v)
    got = flash_attention_online(q, k, v, block_q=128, block_k=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_online_flash_gqa_long(rng):
    from mmada_tpu.ops.flash_attention import flash_attention_online

    q, k, v = make_qkv(rng, 1, 4, 2, 1024, 64)
    want = xla_attention(q, k, v)
    got = flash_attention_online(q, k, v, block_q=256, block_k=256,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_online_flash_with_bias(rng):
    from mmada_tpu.ops.flash_attention import flash_attention_online

    b, h, l, d = 1, 2, 256, 64
    q, k, v = make_qkv(rng, b, h, h, l, d)
    mask = np.ones((b, l))
    mask[0, :33] = 0
    pair = (mask[:, :, None] * mask[:, None, :]) > 0
    bias = jnp.asarray(pair[:, None])  # boolean allowed-pairs
    want = xla_attention(q, k, v, bias=jnp.where(
        bias, 0.0, NEG_INF).astype(jnp.float32))
    got = flash_attention_online(q, k, v, bias=bias, block_q=128,
                                 block_k=128, interpret=True)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1, 3)[valid],
        np.asarray(want).transpose(0, 2, 1, 3)[valid],
        atol=3e-5,
    )


# ------------------------------------------------------- staged (4-D grid)
def test_staged_flash_matches_xla(rng):
    from mmada_tpu.ops.flash_attention import flash_attention_staged

    q, k, v = make_qkv(rng, 2, 4, 4, 512, 64)
    want = xla_attention(q, k, v)
    got = flash_attention_staged(q, k, v, block_q=128, block_k=128,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_staged_flash_gqa(rng):
    from mmada_tpu.ops.flash_attention import flash_attention_staged

    q, k, v = make_qkv(rng, 1, 8, 2, 512, 64)
    want = xla_attention(q, k, v)
    got = flash_attention_staged(q, k, v, block_q=128, block_k=256,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_staged_flash_with_bias_tiles(rng):
    """The bias is staged per (block_q, block_k) tile — multiple ki steps
    must reassemble exactly the XLA biased result (this is the kernel that
    unlocks biased L>4k on Pallas)."""
    from mmada_tpu.ops.flash_attention import flash_attention_staged

    b, h, l, d = 1, 2, 512, 64
    q, k, v = make_qkv(rng, b, h, h, l, d)
    mask = np.ones((b, l))
    mask[0, :50] = 0
    pair = (mask[:, :, None] * mask[:, None, :]) > 0
    bias = jnp.asarray(pair[:, None])  # boolean allowed-pairs, (B,1,L,L)
    want = xla_attention(q, k, v, bias=jnp.where(
        bias, 0.0, NEG_INF).astype(jnp.float32))
    got = flash_attention_staged(q, k, v, bias=bias, block_q=128,
                                 block_k=128, interpret=True)
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1, 3)[valid],
        np.asarray(want).transpose(0, 2, 1, 3)[valid],
        atol=3e-5,
    )


def test_staged_flash_per_head_float_bias(rng):
    from mmada_tpu.ops.flash_attention import flash_attention_staged

    b, h, l, d = 1, 4, 256, 64
    q, k, v = make_qkv(rng, b, h, h, l, d)
    bias = jnp.asarray(rng.normal(size=(b, h, l, l)), jnp.float32)
    want = xla_attention(q, k, v, bias=bias)
    got = flash_attention_staged(q, k, v, bias=bias, block_q=128,
                                 block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_staged_flash_bf16(rng):
    from mmada_tpu.ops.flash_attention import flash_attention_staged

    q, k, v = make_qkv(rng, 1, 2, 2, 512, 64, jnp.bfloat16)
    want = xla_attention(q, k, v)
    got = flash_attention_staged(q, k, v, block_q=128, block_k=128,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


# --------------------------------------------------------------- fused RoPE

def _rope_tables(l, d):
    from mmada_tpu.models.llada import rope_sin_cos

    return rope_sin_cos(l, d, 500000.0)


def test_flash_fused_rope_matches_unfused(rng):
    from mmada_tpu.ops.attention import apply_rope

    q, k, v = make_qkv(rng, 2, 4, 4, 256, 128)
    sin, cos = _rope_tables(256, 128)
    q_r, k_r = apply_rope(q, k, sin, cos)
    want = flash_attention(q_r, k_r, v, block_q=128, interpret=True)
    got = flash_attention(q, k, v, block_q=128, interpret=True,
                          rope_sin=sin, rope_cos=cos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_fused_rope_gqa_bias_bf16(rng):
    from mmada_tpu.ops.attention import apply_rope

    b, h, kvh, l, d = 1, 4, 2, 256, 128
    q, k, v = make_qkv(rng, b, h, kvh, l, d, jnp.bfloat16)
    sin, cos = _rope_tables(l, d)
    bias = jnp.asarray(rng.normal(size=(b, 1, l, l)), jnp.float32)
    q_r, k_r = apply_rope(q, k, sin, cos)
    want = flash_attention(q_r, k_r, v, bias=bias, block_q=128,
                           interpret=True)
    got = flash_attention(q, k, v, bias=bias, block_q=128, interpret=True,
                          rope_sin=sin, rope_cos=cos)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=1e-3,  # 1 bf16 ulp: fp32 FMA contraction differs between the
        # fused (in-kernel) and standalone rope, flipping rounding ties
    )


def test_dispatch_applies_rope_on_xla_fallback(rng):
    """bidirectional_attention(rope_sin=...) must equal apply_rope-then-
    attention on the non-Pallas path (what CPU and multi-device auto use)."""
    from mmada_tpu.ops.attention import apply_rope, bidirectional_attention

    q, k, v = make_qkv(rng, 2, 4, 4, 256, 128)
    sin, cos = _rope_tables(256, 128)
    q_r, k_r = apply_rope(q, k, sin, cos)
    want = bidirectional_attention(q_r, k_r, v, impl="xla")
    got = bidirectional_attention(q, k, v, impl="xla",
                                  rope_sin=sin, rope_cos=cos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.0)


# ------------------------------------------------------- unaligned lengths

@pytest.mark.parametrize("l", [300, 1194])
def test_flash_unaligned_length_matches_xla(rng, l):
    """Serving prompts are arbitrary lengths (the MMU frame is 1194): the
    one-pass kernel pads to the 128 tile and masks padded keys."""
    q, k, v = make_qkv(rng, 2, 4, 4, l, 128)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_unaligned_with_rope_and_bias(rng):
    from mmada_tpu.ops.attention import apply_rope

    l = 1194
    q, k, v = make_qkv(rng, 1, 2, 2, l, 128)
    sin, cos = _rope_tables(l, 128)
    bias = jnp.asarray(rng.normal(size=(1, 1, l, l)), jnp.float32)
    q_r, k_r = apply_rope(q, k, sin, cos)
    want = xla_attention(q_r, k_r, v, bias=bias)
    got = flash_attention(q, k, v, bias=bias, interpret=True,
                          rope_sin=sin, rope_cos=cos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_flash_unaligned_bool_bias(rng):
    l = 300
    q, k, v = make_qkv(rng, 1, 2, 2, l, 128)
    allowed = jnp.asarray(rng.random((1, 1, l, l)) > 0.1)
    want = xla_attention(q, k, v, bias=allowed)
    got = flash_attention(q, k, v, bias=allowed, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_flash_rectangular_matches_xla(rng):
    """q_len != kv_len (the KV-cached span decode shape): span queries
    against the full cached sequence."""
    b, h, d = 2, 4, 128
    q = jnp.asarray(rng.normal(size=(b, h, 256, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, 384, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, 384, d)), jnp.float32)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_rectangular_gqa_unaligned(rng):
    """Rectangular + GQA + both axes unaligned (padding on q rows and
    masked padding on k columns)."""
    b, h, kvh, d = 1, 8, 2, 128
    q = jnp.asarray(rng.normal(size=(b, h, 200, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, kvh, 333, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, kvh, 333, d)), jnp.float32)
    want = xla_attention(q, k, v)
    got = flash_attention(q, k, v, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_rectangular_bias(rng):
    """Rectangular additive bias (B, 1, Lq, Lk) pads on both axes."""
    b, h, d = 1, 2, 128
    q = jnp.asarray(rng.normal(size=(b, h, 130, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, 300, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, 300, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(b, 1, 130, 300)), jnp.float32)
    want = xla_attention(q, k, v, bias=bias)
    got = flash_attention(q, k, v, bias=bias, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_dispatch_rectangular_eligibility():
    """auto dispatch: rectangular spans >=256 with kv<=4096 take the
    one-pass kernel; smaller spans keep the XLA path."""
    from mmada_tpu.ops.attention import _pallas_shape_eligible

    def qkv(lq, lk, d=128):
        q = jnp.zeros((1, 2, lq, d))
        k = jnp.zeros((1, 2, lk, d))
        return q, k

    q, k = qkv(1024, 1536)
    assert _pallas_shape_eligible(q, k, None)
    q, k = qkv(64, 640)            # small semi-AR block -> XLA
    assert not _pallas_shape_eligible(q, k, None)
    q, k = qkv(1024, 8192)         # cached kv too long for one-pass
    assert not _pallas_shape_eligible(q, k, None)
    q, k = qkv(1024, 1536, d=64)   # head dim not tile-aligned
    assert not _pallas_shape_eligible(q, k, None)


def test_pallas_path_is_differentiable(rng, monkeypatch):
    """Training regression guard: pallas_call has no reverse-mode rule, so
    the dispatch wraps the kernel tiers in a custom_vjp (kernel forward,
    XLA-recompute backward). Grads through the pallas path must match the
    XLA path's."""
    import mmada_tpu.ops.attention as A

    q = jnp.asarray(rng.normal(size=(1, 4, 256, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 4, 256, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 4, 256, 128)), jnp.float32)

    monkeypatch.setattr(A, "_INTERPRET", True)

    def loss_pallas(q, k, v):
        return (A.bidirectional_attention(q, k, v, impl="pallas") ** 2).sum()

    def loss_xla(q, k, v):
        return (A.bidirectional_attention(q, k, v, impl="xla") ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_path_differentiable_with_rope(rng, monkeypatch):
    import mmada_tpu.ops.attention as A
    from mmada_tpu.models.llada import rope_sin_cos

    q = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.float32)
    sin, cos = rope_sin_cos(256, 128, 10000.0)

    monkeypatch.setattr(A, "_INTERPRET", True)

    def loss(impl):
        def f(q, k, v):
            return (A.bidirectional_attention(
                q, k, v, impl=impl, rope_sin=sin, rope_cos=cos) ** 2).sum()
        return f

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def _grad_pair(A, q, k, v, **kw):
    def loss(impl):
        def f(q, k, v):
            return (A.bidirectional_attention(
                q, k, v, impl=impl, **kw) ** 2).sum()
        return f

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    return gp, gx


def test_kernel_backward_with_bias(rng, monkeypatch):
    """The flash backward kernels (dq/dkv, ops/flash_attention) handle the
    additive-bias path — bias adds to scores pre-softmax in both kernels;
    no gradient flows to the bias itself."""
    import mmada_tpu.ops.attention as A

    q = jnp.asarray(rng.normal(size=(2, 2, 256, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 256, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, 256, 128)), jnp.float32)
    allowed = jnp.asarray(rng.random((2, 1, 256, 256)) > 0.2)

    monkeypatch.setattr(A, "_INTERPRET", True)
    gp, gx = _grad_pair(A, q, k, v, bias=allowed)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_kernel_backward_unaligned_training_shape(rng, monkeypatch):
    """seq 388 — the stage-1 training shape that made the forward kernel
    eligible (and crashed jax.grad before the custom_vjp). The backward
    kernels pad to the 128 tile with zero-dO rows; padded contributions
    must vanish identically."""
    import mmada_tpu.ops.attention as A
    from mmada_tpu.models.llada import rope_sin_cos

    q = jnp.asarray(rng.normal(size=(2, 2, 388, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 388, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, 388, 128)), jnp.float32)
    sin, cos = rope_sin_cos(388, 128, 500000.0)

    monkeypatch.setattr(A, "_INTERPRET", True)
    gp, gx = _grad_pair(A, q, k, v, rope_sin=sin, rope_cos=cos)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_kernel_backward_bf16(rng, monkeypatch):
    import mmada_tpu.ops.attention as A

    q = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.bfloat16)

    monkeypatch.setattr(A, "_INTERPRET", True)
    gp, gx = _grad_pair(A, q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.15,
        )


def test_kernel_backward_gqa(rng, monkeypatch):
    """GQA shapes now run the backward kernels (r3 weak #4): the dq kernel
    index-maps each query head to its shared KV head; the dkv kernel
    accumulates dk/dv over the query-head group on its innermost grid
    axis. Grads must match the XLA backward."""
    import mmada_tpu.ops.attention as A

    assert A._kernel_bwd_eligible(
        jnp.zeros((1, 4, 256, 128)), jnp.zeros((1, 2, 256, 128))
    )
    q = jnp.asarray(rng.normal(size=(1, 4, 256, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 128)), jnp.float32)

    monkeypatch.setattr(A, "_INTERPRET", True)
    gp, gx = _grad_pair(A, q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_kernel_backward_gqa_bias_rope_unaligned(rng, monkeypatch):
    """GQA backward composed with everything at once: additive bias,
    fused rope, and a non-128-aligned training length."""
    import mmada_tpu.ops.attention as A
    from mmada_tpu.models.llada import rope_sin_cos

    q = jnp.asarray(rng.normal(size=(2, 4, 390, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 2, 390, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 2, 390, 128)), jnp.float32)
    allowed = jnp.asarray(rng.random((2, 1, 390, 390)) > 0.2)
    sin, cos = rope_sin_cos(390, 128, 500000.0)

    monkeypatch.setattr(A, "_INTERPRET", True)
    gp, gx = _grad_pair(A, q, k, v, bias=allowed, rope_sin=sin, rope_cos=cos)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_kernel_backward_fallback_warns(rng, monkeypatch, caplog):
    """Out-of-regime shapes (seq < 256) take the XLA-recompute fallback,
    give correct grads, and log a warning (the r3 silent -12%)."""
    import logging

    import mmada_tpu.ops.attention as A

    q = jnp.asarray(rng.normal(size=(1, 2, 128, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 128, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 128, 128)), jnp.float32)
    assert not A._kernel_bwd_eligible(q, k)

    monkeypatch.setattr(A, "_INTERPRET", True)
    monkeypatch.setattr(A, "_bwd_fallback_warned", False)
    with caplog.at_level(logging.WARNING, "mmada_tpu.ops.attention"):
        gp, gx = _grad_pair(A, q, k, v, bias=None)
    assert any("falling back" in r.message for r in caplog.records)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_attention_bwd_rectangular(rng):
    """Direct kernel parity on Lq != Lk (both padded independently to the
    128 tile) with GQA on top — the cached-span training regime."""
    from mmada_tpu.ops.attention import xla_attention
    from mmada_tpu.ops.flash_attention import flash_attention_bwd

    q = jnp.asarray(rng.normal(size=(1, 4, 500, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 330, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 330, 128)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    out, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v), q, k, v)
    want = vjp(ct)
    got = flash_attention_bwd(q, k, v, out, ct, interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_attention_bwd_direct(rng):
    """Direct kernel-vs-autodiff parity on flash_attention_bwd itself."""
    from mmada_tpu.ops.attention import xla_attention
    from mmada_tpu.ops.flash_attention import flash_attention_bwd

    q = jnp.asarray(rng.normal(size=(1, 2, 384, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 384, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 384, 128)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    out, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v), q, k, v)
    want = vjp(ct)
    got = flash_attention_bwd(q, k, v, out, ct, interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_interleaved_bitwise_equal(rng):
    """The 2-half interleaved body (scheduling experiment) is the SAME
    math — bitwise-equal to the baseline kernel, with and without fused
    rope, including padded-key masking."""
    from mmada_tpu.models.llada import rope_sin_cos

    q, k, v = make_qkv(rng, 2, 4, 4, 256, 64)
    base = flash_attention(q, k, v, block_q=128, interpret=True)
    il = flash_attention(q, k, v, block_q=128, interpret=True,
                         interleave=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(il))

    sin, cos = rope_sin_cos(256, 64, 10000.0)
    base_r = flash_attention(q, k, v, block_q=128, interpret=True,
                             rope_sin=sin, rope_cos=cos)
    il_r = flash_attention(q, k, v, block_q=128, interpret=True,
                           rope_sin=sin, rope_cos=cos, interleave=True)
    np.testing.assert_array_equal(np.asarray(base_r), np.asarray(il_r))

    # unaligned L exercises the padded-col mask inside both halves
    qu, ku, vu = make_qkv(rng, 1, 2, 2, 200, 64)
    base_u = flash_attention(qu, ku, vu, block_q=128, interpret=True)
    il_u = flash_attention(qu, ku, vu, block_q=128, interpret=True,
                           interleave=True)
    np.testing.assert_array_equal(np.asarray(base_u), np.asarray(il_u))


# ---- staged backward (L > 4096, VERDICT r4 #5) ----------------------------


def test_flash_attention_bwd_staged_direct_8192(rng):
    """Direct staged-kernel parity at L=8192 — past the one-pass backward's
    VMEM cap; the reduction axes stream with scratch accumulators."""
    from mmada_tpu.ops.attention import xla_attention
    from mmada_tpu.ops.flash_attention import flash_attention_bwd_staged

    q = jnp.asarray(rng.normal(size=(1, 1, 8192, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, 8192, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1, 8192, 128)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    out, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v), q, k, v)
    want = vjp(ct)
    got = flash_attention_bwd_staged(q, k, v, out, ct, interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_attention_bwd_staged_gqa_rectangular(rng):
    """Staged backward with GQA (group folded into the sequential query
    walk) and rectangular Lq != Lk, both just past the one-pass range."""
    from mmada_tpu.ops.attention import xla_attention
    from mmada_tpu.ops.flash_attention import flash_attention_bwd_staged

    q = jnp.asarray(rng.normal(size=(1, 4, 4224, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 4352, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 4352, 128)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    out, vjp = jax.vjp(lambda q, k, v: xla_attention(q, k, v), q, k, v)
    want = vjp(ct)
    got = flash_attention_bwd_staged(q, k, v, out, ct, interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_flash_attention_bwd_staged_bias(rng):
    """Staged backward streams bias tiles on both passes."""
    from mmada_tpu.ops.attention import xla_attention
    from mmada_tpu.ops.flash_attention import flash_attention_bwd_staged

    l = 4224
    q = jnp.asarray(rng.normal(size=(1, 2, l, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, l, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, l, 128)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(1, 1, l, l)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    out, vjp = jax.vjp(
        lambda q, k, v: xla_attention(q, k, v, bias=bias), q, k, v)
    want = vjp(ct)
    got = flash_attention_bwd_staged(q, k, v, out, ct, bias=bias,
                                     interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_kernel_backward_dispatch_past_4096(rng, monkeypatch):
    """bidirectional_attention grads at an aligned L > 4096 go through the
    staged backward kernels (no XLA-recompute warning), with fused rope."""
    import logging

    import mmada_tpu.ops.attention as A
    from mmada_tpu.models.llada import rope_sin_cos

    assert A._kernel_bwd_eligible(
        jnp.zeros((1, 2, 8192, 128)), jnp.zeros((1, 2, 8192, 128)))
    assert A._kernel_bwd_eligible(
        jnp.zeros((1, 2, 4224, 128)), jnp.zeros((1, 2, 4224, 128)))
    # unaligned past the one-pass range stays on the fallback
    assert not A._kernel_bwd_eligible(
        jnp.zeros((1, 2, 4200, 128)), jnp.zeros((1, 2, 4200, 128)))

    l = 4352
    q = jnp.asarray(rng.normal(size=(1, 2, l, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, l, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, l, 128)), jnp.float32)
    sin, cos = rope_sin_cos(l, 128, 500000.0)

    monkeypatch.setattr(A, "_INTERPRET", True)
    monkeypatch.setattr(A, "_bwd_fallback_warned", False)
    logged = []
    handler = logging.Handler()
    handler.emit = lambda rec: logged.append(rec)
    logging.getLogger("mmada_tpu.ops.attention").addHandler(handler)
    try:
        gp, gx = _grad_pair(A, q, k, v, rope_sin=sin, rope_cos=cos)
    finally:
        logging.getLogger("mmada_tpu.ops.attention").removeHandler(handler)
    assert not any("falling back" in r.getMessage() for r in logged)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_auto_block_q_policy():
    """The r05 auto-block policy: largest 128-multiple divisor of Lq whose
    fp32 score tile against Lk fits the VMEM budget — whole-row at the
    t2i shape, 1024 at 2048, 512 at 4096, and the 128 floor for
    divisor-poor lengths (2176 = 128*17)."""
    from mmada_tpu.ops.flash_attention import _auto_block_q

    assert _auto_block_q(1536, 1536) == 1536   # 9.4 MB tile — whole-row
    assert _auto_block_q(2048, 2048) == 1024   # 16.8 MB whole fails budget
    assert _auto_block_q(4096, 4096) == 512
    assert _auto_block_q(2176, 2176) == 128    # 17 is prime — only 128 divides
    assert _auto_block_q(640, 640) == 640      # text-decode padded frame
    assert _auto_block_q(1024, 2176) == 1024   # rectangular cached-span decode
    # block choice never exceeds Lq and is always a divisor
    for lq in (256, 384, 1152, 2304, 8192):
        bq = _auto_block_q(lq, lq)
        assert lq % bq == 0 and bq * lq * 4 <= (10 << 20) or bq == 128


def test_overpad_lq_policy():
    """Divisor-poor Lq over-pads to admit a large row block; good lengths
    are left alone (the extra rows must pay for themselves under the
    measured per-row cost model)."""
    from mmada_tpu.ops.flash_attention import _auto_block_q, _overpad_lq

    assert _overpad_lq(2176, 2176) == 2304          # 128*17 -> 2*1152
    assert _auto_block_q(2304, 2176) == 1152
    for l in (1536, 2048, 640, 4096, 256):          # already well-blocked
        assert _overpad_lq(l, l) == l


def test_flash_overpadded_query_rope_gqa(rng):
    """The MMU-frame regime: unaligned Lq that pads past the 128 tile to
    a block-friendlier length, with fused rope (whose k tables now pad to
    Lk, not the over-padded Lq) and GQA. Must match XLA exactly like any
    other padding case."""
    from mmada_tpu.ops.attention import apply_rope, xla_attention
    from mmada_tpu.models.llada import rope_sin_cos

    l = 2150                     # pads 2176 -> over-pads 2304
    q = jnp.asarray(rng.normal(size=(1, 4, l, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, l, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, l, 128)), jnp.float32)
    sin, cos = rope_sin_cos(l, 128, 500000.0)
    q_r, k_r = apply_rope(q, k, sin, cos)
    want = xla_attention(q_r, k_r, v)
    got = flash_attention(q, k, v, rope_sin=sin, rope_cos=cos,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5)
