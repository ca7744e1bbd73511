"""EMA, LoRA, and diagnostics tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.models import llada, lora
from mmada_tpu.training.diagnostics import mask_ratio_bucket_stats
from mmada_tpu.training.ema import EMAState, ema_decay, ema_update
from mmada_tpu.training.losses import IGNORE_ID


def tiny():
    cfg = llada.tiny_config(vocab_size=64, d_model=16, n_heads=2, n_layers=2,
                            mlp_hidden_size=32)
    return cfg, llada.init_params(jax.random.key(0), cfg)


# ------------------------------------------------------------------ EMA

def test_ema_decay_schedule():
    assert float(ema_decay(jnp.asarray(0))) == 0.0
    assert 0.0 < float(ema_decay(jnp.asarray(10))) < 0.9999
    assert abs(float(ema_decay(jnp.asarray(10**9))) - 0.9999) < 1e-4


def test_ema_tracks_params():
    cfg, params = tiny()
    state = EMAState.create(params)
    moved = jax.tree.map(lambda p: p + 1.0, params)
    for _ in range(200):
        state = ema_update(state, moved)
    # shadow should approach the moved params
    diff = jax.tree.map(
        lambda s, p: float(jnp.abs(s - p).max()), state.shadow, moved
    )
    assert max(jax.tree.leaves(diff)) < 0.2


# ----------------------------------------------------------------- LoRA

def test_lora_zero_init_is_identity():
    cfg, params = tiny()
    lcfg = lora.LoRAConfig(rank=4, alpha=8)
    adapters = lora.init_lora(jax.random.key(1), params, lcfg)
    merged = lora.merge(params, adapters, lcfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    out_base = llada.forward(params, cfg, ids)
    out_merged = llada.forward(merged, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(out_base), np.asarray(out_merged), atol=1e-6
    )


def test_lora_nonzero_changes_output_and_counts():
    cfg, params = tiny()
    lcfg = lora.LoRAConfig(rank=4, alpha=8)
    adapters = lora.init_lora(jax.random.key(1), params, lcfg)
    adapters["blocks"]["q_proj"]["b"] = (
        jnp.ones_like(adapters["blocks"]["q_proj"]["b"]) * 0.1
    )
    merged = lora.merge(params, adapters, lcfg)
    # distinct tokens: with identical tokens everywhere, attention output is
    # the value mean and query perturbations cancel in softmax
    ids = jnp.arange(8, dtype=jnp.int32)[None]
    assert not np.allclose(
        np.asarray(llada.forward(params, cfg, ids)),
        np.asarray(llada.forward(merged, cfg, ids)),
    )
    n_total = llada.param_count(params)
    n_lora = lora.param_count(adapters)
    # adapters scale with rank·(d_in+d_out), not d_in·d_out — tiny models
    # don't show a dramatic ratio, so just check strict reduction
    assert n_lora < n_total


def test_lora_trainable_roundtrip():
    cfg, params = tiny()
    lcfg = lora.LoRAConfig(rank=2, alpha=4, train_embeddings=True)
    adapters = lora.init_lora(jax.random.key(1), params, lcfg)
    trainable = lora.trainable_params(params, adapters, lcfg)
    rebuilt = lora.apply_trainable(params, trainable, lcfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(llada.forward(params, cfg, ids)),
        np.asarray(llada.forward(rebuilt, cfg, ids)),
        atol=1e-6,
    )


def test_lora_gradients_flow_only_to_trainable():
    cfg, params = tiny()
    lcfg = lora.LoRAConfig(rank=2, alpha=4)
    adapters = lora.init_lora(jax.random.key(1), params, lcfg)
    ids = jnp.zeros((2, 8), jnp.int32)

    def loss_fn(trainable):
        eff = lora.apply_trainable(params, trainable, lcfg)
        return llada.forward(eff, cfg, ids).sum()

    trainable = lora.trainable_params(params, adapters, lcfg)
    grads = jax.grad(loss_fn)(trainable)
    # adapter 'a' grads are nonzero only after b is nonzero; b grads nonzero
    gb = grads["lora"]["blocks"]["q_proj"]["b"]
    assert float(jnp.abs(gb).sum()) > 0


# ----------------------------------------------------------- diagnostics

def test_bucket_stats():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(4, 10, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 16, size=(4, 10)))
    masked = jnp.asarray(rng.random((4, 10)) < 0.5)
    labels = jnp.where(masked, labels, IGNORE_ID)
    stats = mask_ratio_bucket_stats(logits, labels, masked, num_buckets=5)
    assert stats["bucket_ce"].shape == (5,)
    total = float(stats["bucket_tokens"].sum())
    assert total == float(masked.sum())
    assert np.isfinite(np.asarray(stats["bucket_entropy"])).all()
