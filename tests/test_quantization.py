"""int8 weight-only quantization tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.models import llada
from mmada_tpu.ops import quantization as Q


def test_roundtrip_error_small():
    w = jax.random.normal(jax.random.key(0), (64, 128)) * 0.05
    err = Q.quantization_error(w)
    assert err < 0.01  # per-channel int8 on gaussian weights


def test_qmatmul_close_to_fp():
    key = jax.random.key(1)
    w = jax.random.normal(key, (64, 128)) * 0.05
    x = jax.random.normal(jax.random.key(2), (4, 64))
    qw = Q.quantize_tensor(w)
    got = Q.qmatmul(x, qw)
    want = x @ w
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.02


def test_stacked_layer_quantization():
    w = jax.random.normal(jax.random.key(3), (3, 16, 32)) * 0.1
    qw = Q.quantize_tensor(w)
    assert qw.values.shape == (3, 16, 32)
    assert qw.scales.shape == (3, 32)
    deq = qw.dequantize(jnp.float32)
    rel = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
    assert rel < 0.01


def test_quantized_forward_close_and_memory_halved():
    cfg = llada.tiny_config(vocab_size=128, d_model=64, n_heads=4,
                            n_layers=2, mlp_hidden_size=128)
    params = llada.init_params(jax.random.key(0), cfg)
    qparams = Q.quantize_llada_params(params)

    ids = jnp.arange(16, dtype=jnp.int32)[None] % 100
    full = llada.forward(params, cfg, ids)
    quant = llada.forward(qparams, cfg, ids)
    # logits track closely; argmax predictions essentially unchanged
    rel = float(jnp.linalg.norm(quant - full) / jnp.linalg.norm(full))
    assert rel < 0.05
    agree = float((jnp.argmax(full, -1) == jnp.argmax(quant, -1)).mean())
    assert agree > 0.9

    def nbytes(tree):
        return sum(
            leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(tree)
        )

    blocks_fp = nbytes(params["blocks"])
    blocks_q = nbytes(qparams["blocks"])
    assert blocks_q < blocks_fp * 0.35  # fp32 -> int8 + small scales


def test_quantized_windowed_head():
    cfg = llada.tiny_config(vocab_size=128, d_model=64, n_heads=4,
                            n_layers=2, mlp_hidden_size=128)
    params = llada.init_params(jax.random.key(0), cfg)
    qparams = Q.quantize_llada_params(params)
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 100
    win = llada.forward(qparams, cfg, ids, logit_window=(32, 96))
    full = llada.forward(qparams, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(win), np.asarray(full[..., 32:96]), rtol=1e-5, atol=1e-5
    )


def test_position_windowed_head():
    """logit_positions slices hidden states before norm+head: logits for the
    span are bit-identical to the corresponding slice of the full forward,
    for both plain and quantized heads."""
    cfg = llada.tiny_config(vocab_size=128, d_model=64, n_heads=4,
                            n_layers=2, mlp_hidden_size=128)
    params = llada.init_params(jax.random.key(0), cfg)
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 100
    full = llada.forward(params, cfg, ids)
    span = llada.forward(params, cfg, ids, logit_positions=(4, 8))
    np.testing.assert_array_equal(np.asarray(span), np.asarray(full[:, 4:12]))

    qparams = Q.quantize_llada_params(params)
    qfull = llada.forward(qparams, cfg, ids, logit_window=(32, 96))
    qspan = llada.forward(
        qparams, cfg, ids, logit_window=(32, 96), logit_positions=(4, 8)
    )
    np.testing.assert_array_equal(np.asarray(qspan), np.asarray(qfull[:, 4:12]))


def test_quantized_sampler_runs():
    from mmada_tpu.core.vocab import tiny_layout
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.sampling.text import SemiARConfig, generate

    vocab = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vocab.total_vocab_size)
    cfg = dataclasses.replace(cfg, mask_token_id=vocab.mask_token_id)
    params = Q.quantize_llada_params(llada.init_params(jax.random.key(0), cfg))
    model = MMadaModel(cfg=cfg, params=params, vocab=vocab)
    out = model.generate(
        jnp.arange(8, dtype=jnp.int32)[None] + 3,
        gen_length=16, steps=8, block_length=16,
    )
    assert out.shape == (1, 24)
    assert (np.asarray(out) != vocab.mask_token_id).all()


def test_w8a8_matmul_close():
    from mmada_tpu.ops.quantization import W8A8Tensor, quantize_tensor, w8a8_matmul

    key = jax.random.key(5)
    w = jax.random.normal(key, (64, 128)) * 0.05
    x = jax.random.normal(jax.random.key(6), (4, 64))
    q = quantize_tensor(w)
    got = w8a8_matmul(x, W8A8Tensor(values=q.values, scales=q.scales))
    want = x @ w
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.03, rel


def test_w8a8_forward_and_sampler():
    cfg = llada.tiny_config(vocab_size=128, d_model=64, n_heads=4,
                            n_layers=2, mlp_hidden_size=128)
    params = llada.init_params(jax.random.key(0), cfg)
    qparams = Q.quantize_llada_params(params, activations=True)
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 100
    full = llada.forward(params, cfg, ids)
    quant = llada.forward(qparams, cfg, ids)
    agree = float((jnp.argmax(full, -1) == jnp.argmax(quant, -1)).mean())
    assert agree > 0.85, agree
    # windowed head consistent with full
    win = llada.forward(qparams, cfg, ids, logit_window=(32, 96))
    np.testing.assert_allclose(
        np.asarray(win), np.asarray(llada.forward(qparams, cfg, ids)[..., 32:96]),
        rtol=1e-4, atol=1e-4,
    )


# ---------------------------------------------------------------- int4 ----

def test_int4_pack_unpack_roundtrip_exact_on_grid():
    """Values already on the quantization grid survive pack→unpack exactly."""
    from mmada_tpu.ops.int4_matmul import GROUP, pack_int4, unpack_int4

    key = jax.random.key(0)
    scales = jax.random.uniform(key, (2, 256), minval=0.01, maxval=0.1)
    nibbles = jax.random.randint(jax.random.key(1), (2, GROUP, 256), -7, 8)
    # pack_int4 recovers scale as absmax/7: pin one ±7 per (group, column)
    nibbles = nibbles.at[:, 0, :].set(7)
    w = (
        nibbles.astype(jnp.float32) * scales[:, None, :]
    ).reshape(2 * GROUP, 256)
    packed, s = pack_int4(w)
    assert packed.shape == (GROUP, 256) and s.shape == (2, 256)
    deq = unpack_int4(packed, s, jnp.float32)
    # grid points round-trip bit-near-exactly (one fp32 mul each way)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(w), rtol=1e-5)


def test_int4_quant_error_bounded():
    w = jax.random.normal(jax.random.key(2), (512, 256)) * 0.05
    qw = Q.quantize_tensor_int4(w)
    deq = qw.dequantize(jnp.float32)
    rel = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
    assert rel < 0.12, rel  # grouped int4 on gaussian weights
    assert qw.shape == (512, 256)
    # 2 nibbles per byte + 1 f32 scale per 128 weights
    assert qw.packed.size == w.size // 2
    assert qw.scales.size == w.size // 128


def test_int4_kernel_matches_xla_fallback():
    from mmada_tpu.ops.int4_matmul import int4_matmul

    w = jax.random.normal(jax.random.key(3), (512, 384)) * 0.05
    x = jax.random.normal(jax.random.key(4), (2, 5, 512)).astype(jnp.bfloat16)
    qw = Q.quantize_tensor_int4(w)
    got = int4_matmul(x, qw.packed, qw.scales, interpret=True)
    want = x @ qw.dequantize(jnp.bfloat16)
    assert got.shape == (2, 5, 384)
    rel = float(
        jnp.linalg.norm(got.astype(jnp.float32) - want.astype(jnp.float32))
        / jnp.linalg.norm(want.astype(jnp.float32))
    )
    assert rel < 2e-2, rel


def test_int4_kernel_k_tile_remainder_and_row_padding():
    """K=128 (single group, block_k falls back to GROUP) and M not a
    multiple of the row tile both take the padded path."""
    from mmada_tpu.ops.int4_matmul import int4_matmul

    w = jax.random.normal(jax.random.key(5), (128, 128)) * 0.05
    x = jax.random.normal(jax.random.key(6), (3, 128)).astype(jnp.bfloat16)
    qw = Q.quantize_tensor_int4(w)
    got = int4_matmul(x, qw.packed, qw.scales, interpret=True)
    want = x @ qw.dequantize(jnp.bfloat16)
    rel = float(
        jnp.linalg.norm(got.astype(jnp.float32) - want.astype(jnp.float32))
        / jnp.linalg.norm(want.astype(jnp.float32))
    )
    assert rel < 2e-2, rel


def test_int4_maybe_matmul_dispatch(monkeypatch):
    """maybe_matmul routes Int4Tensor through the kernel under _INTERPRET
    and through the XLA fallback for non-128-aligned N."""
    monkeypatch.setattr(Q, "_INTERPRET", True)
    w = jax.random.normal(jax.random.key(7), (256, 128)) * 0.05
    x = jax.random.normal(jax.random.key(8), (4, 256)).astype(jnp.bfloat16)
    qw = Q.quantize_tensor_int4(w)
    got = Q.maybe_matmul(x, qw)
    want = x @ qw.dequantize(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want, dtype=np.float32),
        rtol=2e-2, atol=1e-3,
    )


def test_int4_forward_and_sampler():
    """Full tiny-model forward + semi-AR sampler with int4 block weights
    (d_model 128 so every contracting dim is a GROUP multiple)."""
    from mmada_tpu.core.vocab import tiny_layout
    from mmada_tpu.models.mmada import MMadaModel

    vocab = tiny_layout()
    cfg = llada.tiny_config(
        vocab_size=vocab.total_vocab_size, d_model=128, mlp_hidden_size=256,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=vocab.mask_token_id)
    params = llada.init_params(jax.random.key(0), cfg)
    qparams = Q.quantize_llada_params(params, bits=4)
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 100
    full = llada.forward(params, cfg, ids)
    quant = llada.forward(qparams, cfg, ids)
    rel = float(jnp.linalg.norm(quant - full) / jnp.linalg.norm(full))
    assert rel < 0.25, rel

    model = MMadaModel(cfg=cfg, params=qparams, vocab=vocab)
    out = model.generate(
        jnp.arange(8, dtype=jnp.int32)[None] + 3,
        gen_length=16, steps=8, block_length=16,
    )
    assert out.shape == (1, 24)
    assert (np.asarray(out) != vocab.mask_token_id).all()


def test_int4_rejects_activation_quant():
    import pytest

    cfg = llada.tiny_config(d_model=128, mlp_hidden_size=256)
    params = llada.init_params(jax.random.key(0), cfg)
    with pytest.raises(ValueError):
        Q.quantize_llada_params(params, bits=4, activations=True)
    with pytest.raises(ValueError):
        Q.quantize_llada_params(params, bits=3)


def test_int4_small_k_per_channel_fallback():
    """K < GROUP packs per-channel and maybe_matmul uses the XLA path."""
    w = jax.random.normal(jax.random.key(9), (64, 128)) * 0.05
    qw = Q.quantize_tensor_int4(w)
    assert qw.scales.shape == (1, 128)
    got = Q.maybe_matmul(
        jax.random.normal(jax.random.key(10), (4, 64)).astype(jnp.bfloat16),
        qw,
    )
    assert got.shape == (4, 128)
    deq = qw.dequantize(jnp.float32)
    rel = float(jnp.linalg.norm(deq - w) / jnp.linalg.norm(w))
    assert rel < 0.2, rel


def test_int4_default_tiny_dims_quantize():
    """quantize_llada_params(bits=4) works at the default tiny dims
    (d_model 64) via the per-channel fallback — harness dryruns use this."""
    cfg = llada.tiny_config()
    params = llada.init_params(jax.random.key(0), cfg)
    qparams = Q.quantize_llada_params(params, bits=4)
    ids = jnp.arange(12, dtype=jnp.int32)[None] % 100
    full = llada.forward(params, cfg, ids)
    quant = llada.forward(qparams, cfg, ids)
    rel = float(jnp.linalg.norm(quant - full) / jnp.linalg.norm(full))
    assert rel < 0.35, rel


def test_int4_kernel_k_grid_accumulation():
    """K=2048 exercises the 8-group k-grid tile (1024) with accumulation
    across two k steps — the flagship-shape path."""
    from mmada_tpu.ops.int4_matmul import int4_matmul

    w = jax.random.normal(jax.random.key(11), (2048, 256)) * 0.05
    x = jax.random.normal(jax.random.key(12), (4, 2048)).astype(jnp.bfloat16)
    qw = Q.quantize_tensor_int4(w)
    got = int4_matmul(x, qw.packed, qw.scales, interpret=True)
    want = x @ qw.dequantize(jnp.bfloat16)
    rel = float(
        jnp.linalg.norm(got.astype(jnp.float32) - want.astype(jnp.float32))
        / jnp.linalg.norm(want.astype(jnp.float32))
    )
    assert rel < 2e-2, rel


def test_w8a8_ste_forward_matches_w8a8_backward_matches_bf16():
    """STE training matmul (ops/quantization.w8a8_ste_matmul): the
    forward equals the serving w8a8 path on the same weight; the
    gradients equal the plain bf16 matmul's (straight-through)."""
    kx, kw = jax.random.split(jax.random.key(11))
    x = jax.random.normal(kx, (2, 6, 32), jnp.float32)
    w = jax.random.normal(kw, (32, 48), jnp.float32)

    y_ste = Q.w8a8_ste_matmul(x, w)
    y_w8a8 = Q.w8a8_matmul(x, Q._to_w8a8(Q.quantize_tensor(w)))
    np.testing.assert_allclose(np.asarray(y_ste), np.asarray(y_w8a8),
                               rtol=1e-6, atol=1e-6)

    def loss_ste(x, w):
        return (Q.w8a8_ste_matmul(x, w) ** 2).sum()

    def loss_bf16(x, w):
        return ((x @ w) ** 2).sum()

    gx_ste, gw_ste = jax.grad(loss_ste, argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(loss_bf16, argnums=(0, 1))(x, w)
    # cotangents differ (quantized forward output vs exact), so compare
    # the STE grads against the bf16 rule applied to the STE cotangent:
    # d loss/dy = 2*y_ste; dx = g @ w.T, dw = x.T g
    g = 2.0 * np.asarray(y_ste)
    np.testing.assert_allclose(
        np.asarray(gx_ste), g @ np.asarray(w).T, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gw_ste),
        np.einsum("bld,blo->do", np.asarray(x), g), rtol=1e-4, atol=2e-4)
    # and sanity: same SHAPES/dtypes as the bf16 grads
    assert gx_ste.shape == gx_ref.shape and gw_ste.shape == gw_ref.shape


def test_tag_w8a8_ste_forward_and_grads():
    """Tagged params run the model forward through the STE path (output
    close to the w8a8 serving forward) and gradients land on the plain
    bf16 leaves with unchanged tree structure."""
    cfg = llada.tiny_config()
    params = llada.init_params(jax.random.key(0), cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.key(1), (2, 16), 0, cfg.vocab_size)

    tagged = Q.tag_w8a8_ste(params)
    out_ste = llada.forward(tagged, cfg, ids)
    out_w8a8 = llada.forward(
        Q.quantize_llada_params(params, quantize_head=False,
                                activations=True),
        cfg, ids)
    np.testing.assert_allclose(np.asarray(out_ste), np.asarray(out_w8a8),
                               rtol=2e-2, atol=2e-2)

    def loss(p):
        return (llada.forward(Q.tag_w8a8_ste(p), cfg, ids) ** 2).mean()

    grads = jax.grad(loss)(params)
    assert jax.tree_util.tree_structure(grads) == \
        jax.tree_util.tree_structure(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
