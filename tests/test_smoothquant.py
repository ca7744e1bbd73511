"""SmoothQuant scale migration (ops/smoothquant.py).

Two invariants:
  1. Migration is EXACT — fp32 forward of migrated params matches the
     original bitwise-tolerance-close, for both block types, GQA, biases,
     and q/k-norm. (A migration that changes the math is a bug no quality
     gate can excuse.)
  2. Migration HELPS the activation quantizer — on a model with an
     injected channel outlier, W8A8-after-migration has strictly lower
     logit error than plain W8A8. (The reason the code exists.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.core.precision import FP32
from mmada_tpu.models import llada
from mmada_tpu.ops import quantization as Q
from mmada_tpu.ops import smoothquant as SQ


def _calib(key, cfg, n=2, b=2, l=32):
    return [
        jax.random.randint(jax.random.key(7 + i), (b, l), 3,
                           cfg.vocab_size - 4, jnp.int32)
        for i in range(n)
    ]


def _fwd(params, cfg, ids):
    return np.asarray(
        jax.jit(lambda p: llada.forward(p, cfg, ids, policy=FP32))(params)
    )


@pytest.mark.parametrize(
    "block_type,kv,qknorm,bias",
    [
        ("llama", 2, False, False),      # GQA
        ("llama", None, True, True),     # MHA + q/k norm + qkv biases
        ("sequential", 2, False, True),  # fused att_proj + bias
    ],
)
def test_migration_exact(block_type, kv, qknorm, bias):
    cfg = llada.tiny_config(
        n_layers=3, block_type=block_type, n_kv_heads=kv,
        attention_layer_norm=qknorm,
    )
    if bias:
        cfg = dataclasses.replace(cfg, include_qkv_bias=True)
    params = llada.init_params(jax.random.key(0), cfg)
    # init biases are zeros — randomize so the fold is actually exercised
    for name in ("q_bias", "k_bias", "v_bias", "att_proj_bias"):
        if name in params["blocks"]:
            params["blocks"][name] = 0.1 * jax.random.normal(
                jax.random.key(hash(name) % 1000),
                params["blocks"][name].shape,
            )
    ids = jax.random.randint(jax.random.key(1), (2, 24), 3, 300, jnp.int32)
    ref = _fwd(params, cfg, ids)

    stats = SQ.collect_stats(params, cfg, _calib(0, cfg))
    migrated = SQ.migrate_params(params, cfg, stats, alpha=0.5)
    got = _fwd(migrated, cfg, ids)

    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    # and the scales were not trivially 1 everywhere
    assert not np.allclose(
        np.asarray(migrated["blocks"]["attn_norm"]),
        np.asarray(params["blocks"]["attn_norm"]),
    )


def test_migration_exact_gemma_norm():
    cfg = dataclasses.replace(
        llada.tiny_config(n_layers=2), layer_norm_type="gemma_rms"
    )
    params = llada.init_params(jax.random.key(0), cfg)
    ids = jax.random.randint(jax.random.key(1), (2, 16), 3, 300, jnp.int32)
    ref = _fwd(params, cfg, ids)
    stats = SQ.collect_stats(params, cfg, _calib(0, cfg, n=1))
    got = _fwd(SQ.migrate_params(params, cfg, stats), cfg, ids)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def _inject_outlier(params):
    """Make a handful of hidden channels run hot (the LLM.int8/SmoothQuant
    failure mode): scale the embedding columns so those channels dominate
    every per-token activation scale downstream."""
    p = dict(params)
    wte = p["wte"]
    boost = jnp.ones((wte.shape[-1],), wte.dtype).at[3].set(30.0).at[17].set(50.0)
    p["wte"] = wte * boost
    return p


def test_smoothquant_reduces_w8a8_error():
    cfg = llada.tiny_config(n_layers=3, n_kv_heads=2)
    params = _inject_outlier(llada.init_params(jax.random.key(0), cfg))
    ids = jax.random.randint(jax.random.key(1), (2, 32), 3, 300, jnp.int32)
    ref = _fwd(params, cfg, ids)

    calib = _calib(0, cfg)
    plain = Q.quantize_llada_params(params, activations=True)
    smooth = SQ.smooth_quantize(params, cfg, calib, alpha=0.5)

    def rel_l2(q):
        got = _fwd(q, cfg, ids)
        return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))

    e_plain, e_smooth = rel_l2(plain), rel_l2(smooth)
    assert e_smooth < e_plain, (e_plain, e_smooth)


def test_migrated_weight_only_int8_not_degraded():
    """Migration must not blow up the WEIGHT quantizer: weight-only int8
    on migrated params stays in the same error ballpark as unmigrated."""
    cfg = llada.tiny_config(n_layers=2)
    params = _inject_outlier(llada.init_params(jax.random.key(0), cfg))
    ids = jax.random.randint(jax.random.key(1), (2, 24), 3, 300, jnp.int32)
    ref = _fwd(params, cfg, ids)

    def rel_l2(q):
        got = _fwd(q, cfg, ids)
        return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))

    e_plain = rel_l2(Q.quantize_llada_params(params))
    e_smooth = rel_l2(
        SQ.smooth_quantize(params, cfg, _calib(0, cfg), activations=False)
    )
    assert e_smooth < 3.0 * e_plain + 1e-4, (e_plain, e_smooth)


def test_loader_w8a8_smooth_path(tmp_path):
    """model.mmada.quantize: w8a8_smooth loads, calibrates on the
    synthetic fallback batches, and yields W8A8 params that forward."""
    from mmada_tpu.checkpoints.manager import (
        export_hf_config, export_safetensors,
    )
    from mmada_tpu.core.config import Config
    from mmada_tpu.core.vocab import tiny_layout
    from mmada_tpu.serve.loader import build_model

    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    cfg = dataclasses.replace(cfg, mask_token_id=vl.mask_token_id)
    params = llada.init_params(jax.random.key(0), cfg)
    export_safetensors(str(tmp_path / "model.safetensors"), params, cfg)
    export_hf_config(str(tmp_path), cfg)

    ycfg = Config({"model": {"mmada": {
        "pretrained_model_path": str(tmp_path),
        "quantize": "w8a8_smooth",
        "smoothquant_alpha": 0.7,
    }}})
    model = build_model(ycfg, vl)
    assert any(
        isinstance(leaf, Q.W8A8Tensor)
        for leaf in jax.tree.leaves(model.params, is_leaf=Q.is_quantized)
    )
    ids = jax.random.randint(jax.random.key(1), (1, 16), 3, 100, jnp.int32)
    logits = model.forward(ids)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_stats_shapes():
    cfg = llada.tiny_config(n_layers=2, n_kv_heads=2)
    params = llada.init_params(jax.random.key(0), cfg)
    stats = SQ.collect_stats(params, cfg, _calib(0, cfg, n=1))
    n, d = cfg.n_layers, cfg.d_model
    assert stats["qkv_in"].shape == (n, d)
    assert stats["ctx"].shape == (n, d)
    assert stats["mlp_in"].shape == (n, d)
    assert stats["mlp_mid"].shape == (n, cfg.effective_hidden_size)
    assert stats["head_in"].shape == (d,)
    assert all(np.all(np.asarray(v) >= 0) for v in stats.values())
