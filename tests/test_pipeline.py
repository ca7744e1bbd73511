"""GPipe pipeline-parallel forward: logits equal to the plain forward.

The reference has no pipeline parallelism; parallel/pipeline.py shards the
layer-stacked block weights' LEADING axis over a mesh axis (stage
assignment for free) and runs the GPipe microbatch schedule with ppermute
activation transfers.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.core.mesh import make_mesh
from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.parallel import pipeline

VOCAB = tiny_layout(text_vocab_size=256, image_codebook_size=64)


def build(n_layers=8):
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=64, n_heads=4,
        n_layers=n_layers, mlp_hidden_size=128,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    params = llada.init_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.mark.parametrize("stages,microbatches", [(8, 4), (4, 2), (2, 1)])
def test_pipeline_forward_matches_plain(stages, microbatches):
    cfg, params = build(n_layers=8)
    mesh = make_mesh(data=8 // stages, fsdp=stages, tensor=1)
    want = np.asarray(llada.forward(params, cfg, ids := jnp.asarray(
        np.random.default_rng(0).integers(3, 200, (4, 16)), jnp.int32
    )))
    staged = pipeline.shard_stage_params(params, mesh)
    got = np.asarray(jax.jit(
        lambda p, i: pipeline.pipeline_forward(
            p, cfg, i, mesh, num_microbatches=microbatches
        )
    )(staged, ids))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_pipeline_contains_ring_transfers():
    cfg, params = build(n_layers=8)
    mesh = make_mesh(data=1, fsdp=8, tensor=1)
    staged = pipeline.shard_stage_params(params, mesh)
    ids = jnp.zeros((4, 8), jnp.int32)
    jaxpr = str(jax.make_jaxpr(
        lambda p, i: pipeline.pipeline_forward(p, cfg, i, mesh)
    )(staged, ids))
    assert "ppermute" in jaxpr


def test_pipeline_logit_window():
    cfg, params = build(n_layers=4)
    mesh = make_mesh(data=2, fsdp=4, tensor=1)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(3, 200, (2, 8)), jnp.int32
    )
    staged = pipeline.shard_stage_params(params, mesh)
    got = np.asarray(pipeline.pipeline_forward(
        staged, cfg, ids, mesh, logit_window=VOCAB.image_window
    ))
    want = np.asarray(llada.forward(
        params, cfg, ids, logit_window=VOCAB.image_window
    ))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    assert got.shape[-1] == VOCAB.image_codebook_size


def test_pipeline_rejects_indivisible_layers():
    cfg, params = build(n_layers=6)
    mesh = make_mesh(data=1, fsdp=8, tensor=1)
    with pytest.raises(ValueError):
        pipeline.pipeline_forward(
            pipeline.shard_stage_params(params, mesh), cfg,
            jnp.zeros((2, 8), jnp.int32), mesh,
        )


def test_pipeline_samplers_match_plain():
    """With pipeline_axis set, ALL samplers run through the GPipe forward
    and produce identical tokens to the plain model (the loader's
    parallel.serving=pipeline mode)."""
    from mmada_tpu.models.mmada import MMadaModel

    cfg, params = build(n_layers=8)
    mesh = make_mesh(data=1, fsdp=8, tensor=1)
    plain = MMadaModel(cfg=cfg, params=params, vocab=VOCAB)
    piped = MMadaModel(
        cfg=cfg, params=pipeline.shard_stage_params(params, mesh),
        vocab=VOCAB, mesh=mesh, pipeline_axis="fsdp",
    )
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(3, 200, (2, 8)), jnp.int32
    )

    @jax.jit
    def gen(m, p):
        return m.generate(p, gen_length=16, steps=8, block_length=8)

    np.testing.assert_array_equal(
        np.asarray(gen(plain, prompt)), np.asarray(gen(piped, prompt))
    )

    n_img = 16
    frame = np.concatenate([
        np.full((2, 6), 5), np.full((2, 1), 230),
        np.full((2, n_img), VOCAB.mask_token_id), np.full((2, 1), 231),
    ], axis=1).astype(np.int32)
    uncond = frame.copy()
    uncond[:, :6] = VOCAB.pad_token_id

    @jax.jit
    def t2i(m, f, u, k):
        return m.t2i_generate(
            f, uncond_input_ids=u, temperature=0.0, greedy=True,
            timesteps=4, guidance_scale=1.5, num_vq_tokens=n_img, key=k,
        )

    key = jax.random.key(0)
    np.testing.assert_array_equal(
        np.asarray(t2i(plain, jnp.asarray(frame), jnp.asarray(uncond), key)),
        np.asarray(t2i(piped, jnp.asarray(frame), jnp.asarray(uncond), key)),
    )


def test_loader_pipeline_mode():
    from mmada_tpu.core.config import load_config
    from mmada_tpu.serve.loader import build_model, build_vocab

    cfg = load_config("configs/tiny_test.yaml",
                      overrides=["parallel.serving=pipeline",
                                 "parallel.fsdp=2", "parallel.data=4"])
    m = build_model(cfg, build_vocab(cfg))
    assert m.pipeline_axis == "fsdp" and m.mesh is not None
