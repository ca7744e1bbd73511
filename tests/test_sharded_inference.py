"""Sharded (TP+FSDP) inference: samplers produce identical tokens with
sharded and replicated params on the 8-virtual-device CPU mesh — the
single-chip → slice serving path for the 8B model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.core.mesh import make_mesh
from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.parallel import sharding

VOCAB = tiny_layout(text_vocab_size=256, image_codebook_size=64)


def build(n_heads=4, d_model=64, mlp=128):
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=d_model, n_heads=n_heads,
        n_layers=2, mlp_hidden_size=mlp,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    params = llada.init_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.mark.parametrize("mesh_shape", [(1, 4, 2), (1, 1, 8), (1, 8, 1)])
def test_sharded_text_generation_matches(mesh_shape):
    cfg, params = build()
    data, fsdp, tensor = mesh_shape
    mesh = make_mesh(data=data, fsdp=fsdp, tensor=tensor)
    params_sh = sharding.shard_params(
        params, sharding.llada_param_specs(cfg), mesh
    )
    model = MMadaModel(cfg=cfg, params=params, vocab=VOCAB)
    model_sh = MMadaModel(cfg=cfg, params=params_sh, vocab=VOCAB)

    prompt = jnp.asarray(
        np.random.default_rng(0).integers(3, 200, (2, 8)), jnp.int32
    )

    @jax.jit
    def gen(model, prompt):
        return model.generate(prompt, gen_length=16, steps=8, block_length=8)

    out_ref = np.asarray(gen(model, prompt))
    out_sh = np.asarray(gen(model_sh, prompt))
    np.testing.assert_array_equal(out_ref, out_sh)


def test_sharded_t2i_generation_matches():
    cfg, params = build()
    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    params_sh = sharding.shard_params(
        params, sharding.llada_param_specs(cfg), mesh
    )
    model = MMadaModel(cfg=cfg, params=params, vocab=VOCAB)
    model_sh = MMadaModel(cfg=cfg, params=params_sh, vocab=VOCAB)

    n_img = 16
    frame = np.concatenate([
        np.full((2, 6), 5), np.full((2, 1), 230),
        np.full((2, n_img), VOCAB.mask_token_id), np.full((2, 1), 231),
    ], axis=1).astype(np.int32)
    uncond = frame.copy()
    uncond[:, :6] = VOCAB.pad_token_id

    @jax.jit
    def gen(model, frame, uncond, key):
        return model.t2i_generate(
            frame, uncond_input_ids=uncond, temperature=0.0, greedy=True,
            timesteps=4, guidance_scale=1.5, num_vq_tokens=n_img, key=key,
        )

    key = jax.random.key(0)
    out_ref = np.asarray(gen(model, jnp.asarray(frame), jnp.asarray(uncond), key))
    out_sh = np.asarray(gen(model_sh, jnp.asarray(frame), jnp.asarray(uncond), key))
    np.testing.assert_array_equal(out_ref, out_sh)


def test_quantized_params_shardable():
    """int8 QuantizedTensor leaves shard like their fp parents."""
    from mmada_tpu.ops import quantization as Q

    cfg, params = build()
    qparams = Q.quantize_llada_params(params)
    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    # shard_params handles quantized leaves (values sharded, scales replicated)
    qsharded = sharding.shard_params(
        qparams, sharding.llada_param_specs(cfg), mesh
    )
    model = MMadaModel(cfg=cfg, params=qparams, vocab=VOCAB)
    model_sh = MMadaModel(cfg=cfg, params=qsharded, vocab=VOCAB)
    ids = jnp.arange(12, dtype=jnp.int32)[None] % 200
    a = np.asarray(jax.jit(lambda m, i: m.forward(i))(model, ids))
    b = np.asarray(jax.jit(lambda m, i: m.forward(i))(model_sh, ids))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mesh_attention_forward_matches_unsharded():
    """With model.mesh set, attention dispatches to the shard_map path
    (heads over 'tensor', batch over data×fsdp) and the logits match the
    plain single-device forward."""
    cfg, params = build(n_heads=8, d_model=128)
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    params_sh = sharding.shard_params(
        params, sharding.llada_param_specs(cfg), mesh
    )
    model = MMadaModel(cfg=cfg, params=params, vocab=VOCAB)
    model_mesh = MMadaModel(cfg=cfg, params=params_sh, vocab=VOCAB, mesh=mesh)

    ids = jnp.asarray(
        np.random.default_rng(1).integers(3, 200, (4, 16)), jnp.int32
    )
    fwd = lambda m, i: m.forward(i)
    # the mesh model's program must actually contain the shard_map
    jaxpr = str(jax.make_jaxpr(fwd)(model_mesh, ids))
    assert "shard_map" in jaxpr
    assert "shard_map" not in str(jax.make_jaxpr(fwd)(model, ids))

    a = np.asarray(jax.jit(fwd)(model, ids))
    b = np.asarray(jax.jit(fwd)(model_mesh, ids))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_mesh_attention_generation_matches():
    """Samplers (semi-AR text + MaskGIT t2i with CFG batch-doubling)
    produce identical tokens with the mesh-aware attention path."""
    cfg, params = build(n_heads=8)
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    params_sh = sharding.shard_params(
        params, sharding.llada_param_specs(cfg), mesh
    )
    model = MMadaModel(cfg=cfg, params=params, vocab=VOCAB)
    model_mesh = MMadaModel(cfg=cfg, params=params_sh, vocab=VOCAB, mesh=mesh)

    prompt = jnp.asarray(
        np.random.default_rng(0).integers(3, 200, (4, 8)), jnp.int32
    )

    @jax.jit
    def gen(model, prompt):
        return model.generate(prompt, gen_length=16, steps=8, block_length=8)

    np.testing.assert_array_equal(
        np.asarray(gen(model, prompt)), np.asarray(gen(model_mesh, prompt))
    )

    n_img = 16
    frame = np.concatenate([
        np.full((2, 6), 5), np.full((2, 1), 230),
        np.full((2, n_img), VOCAB.mask_token_id), np.full((2, 1), 231),
    ], axis=1).astype(np.int32)
    uncond = frame.copy()
    uncond[:, :6] = VOCAB.pad_token_id

    @jax.jit
    def t2i(model, frame, uncond, key):
        return model.t2i_generate(
            frame, uncond_input_ids=uncond, temperature=0.0, greedy=True,
            timesteps=4, guidance_scale=1.5, num_vq_tokens=n_img, key=key,
        )

    key = jax.random.key(0)
    np.testing.assert_array_equal(
        np.asarray(t2i(model, jnp.asarray(frame), jnp.asarray(uncond), key)),
        np.asarray(t2i(model_mesh, jnp.asarray(frame), jnp.asarray(uncond), key)),
    )


def test_mesh_attention_indivisible_heads_falls_back():
    """3 heads on a tensor=2 axis: dispatch must fall back (no shard_map
    on the head axis) yet still produce correct logits."""
    cfg, params = build(n_heads=2, d_model=64)  # 2 heads, tensor=4 below
    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    model = MMadaModel(cfg=cfg, params=params, vocab=VOCAB)
    model_mesh = MMadaModel(cfg=cfg, params=params, vocab=VOCAB, mesh=mesh)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(3, 200, (2, 12)), jnp.int32
    )
    a = np.asarray(jax.jit(lambda m, i: m.forward(i))(model, ids))
    b = np.asarray(jax.jit(lambda m, i: m.forward(i))(model_mesh, ids))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_ring_attention_forward_matches():
    """attn_impl='ring' sequence-shards attention over the fsdp axis; the
    full forward matches the plain single-device forward (long-context
    path, llada._dispatch_attention)."""
    cfg, params = build(n_heads=4)
    mesh = make_mesh(data=1, fsdp=8, tensor=1)
    params_sh = sharding.shard_params(
        params, sharding.llada_param_specs(cfg), mesh
    )
    model = MMadaModel(cfg=cfg, params=params, vocab=VOCAB)
    model_ring = MMadaModel(
        cfg=cfg, params=params_sh, vocab=VOCAB, mesh=mesh, attn_impl="ring"
    )
    ids = jnp.asarray(
        np.random.default_rng(4).integers(3, 200, (2, 32)), jnp.int32
    )
    fwd = lambda m, i: m.forward(i)
    assert "ppermute" in str(jax.make_jaxpr(fwd)(model_ring, ids))
    a = np.asarray(jax.jit(fwd)(model, ids))
    b = np.asarray(jax.jit(fwd)(model_ring, ids))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_ring_attention_indivisible_seq_falls_back():
    cfg, params = build(n_heads=4)
    mesh = make_mesh(data=1, fsdp=8, tensor=1)
    model_ring = MMadaModel(
        cfg=cfg, params=params, vocab=VOCAB, mesh=mesh, attn_impl="ring"
    )
    ids = jnp.asarray(
        np.random.default_rng(4).integers(3, 200, (2, 12)), jnp.int32
    )  # 12 % 8 != 0 -> falls back, still correct
    model = MMadaModel(cfg=cfg, params=params, vocab=VOCAB)
    a = np.asarray(jax.jit(lambda m, i: m.forward(i))(model, ids))
    b = np.asarray(jax.jit(lambda m, i: m.forward(i))(model_ring, ids))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)
