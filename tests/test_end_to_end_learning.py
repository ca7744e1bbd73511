"""End-to-end learning test: overfit a tiny model and verify the samplers
recover the memorized targets — the training loop, losses, corruption, and
generation working together, not just loss decreasing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.training import optimizers
from mmada_tpu.training.train_step import StepConfig, TrainState, make_train_step

VOCAB = tiny_layout(text_vocab_size=64, image_codebook_size=16)
SOI, EOI = 40, 41


@pytest.mark.slow
def test_overfit_t2i_then_generate_recovers_targets():
    """Train t2i on TWO fixed caption→image pairs until the model can
    regenerate each image grid from its caption."""
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=64, n_heads=4,
        n_layers=2, mlp_hidden_size=128,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    model = MMadaModel(
        cfg=cfg, params=llada.init_params(jax.random.key(0), cfg), vocab=VOCAB
    )

    n_img = 16
    text_len = 6
    rng = np.random.default_rng(0)
    captions = np.stack([
        np.asarray([1, 10, 11, 12, 13, 2]),   # caption A
        np.asarray([1, 20, 21, 22, 23, 2]),   # caption B
    ])
    images = rng.integers(0, VOCAB.image_codebook_size, size=(2, n_img))
    fused = images + VOCAB.image_offset

    frames = np.concatenate([
        captions, np.full((2, 1), SOI), fused, np.full((2, 1), EOI),
    ], axis=1)

    sc = StepConfig(
        batch_size_t2i=2, batch_size_lm=0, batch_size_mmu=0,
        max_seq_length=text_len - 1,  # span = [text_len, L-1) = image tokens
    )
    opt = optimizers.adamw(3e-3, params_for_mask=model.params)
    state = TrainState.create(model.params, opt)
    step = jax.jit(make_train_step(model, opt, sc))
    batch = {
        "t2i_input_ids": jnp.asarray(frames),
        "t2i_masks": jnp.ones_like(jnp.asarray(frames)),
    }
    for i in range(250):
        state, metrics = step(state, batch, jax.random.key(i))
    assert float(metrics["loss_t2i"]) < 0.15, float(metrics["loss_t2i"])

    # generate each image from its caption (all-masked image span)
    trained = dataclasses.replace(model, params=state.params)
    gen_frames = frames.copy()
    gen_frames[:, text_len + 1:-1] = VOCAB.mask_token_id
    codes = trained.t2i_generate(
        jnp.asarray(gen_frames), temperature=0.0, greedy=True, timesteps=8,
        guidance_scale=0.0, num_vq_tokens=n_img, key=jax.random.key(99),
    )
    match = (np.asarray(codes) == images).mean()
    assert match > 0.9, f"recovered only {match:.0%} of memorized image tokens"

    # cached decode on the trained model also recovers the memorized image
    # (quality evidence for the t2i approximation where confidence is real)
    cached = trained.t2i_generate(
        jnp.asarray(gen_frames), temperature=0.0, greedy=True, timesteps=8,
        guidance_scale=0.0, num_vq_tokens=n_img, key=jax.random.key(99),
        block_kv_cache=True,
    )
    cmatch = (np.asarray(cached) == images).mean()
    assert cmatch > 0.9, f"cached decode recovered only {cmatch:.0%}"


@pytest.mark.slow
def test_overfit_lm_then_generate_recovers_answer():
    """Train plain lm on one fixed sequence; semi-AR generation from its
    prefix reproduces the memorized continuation."""
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=64, n_heads=4,
        n_layers=2, mlp_hidden_size=128,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    model = MMadaModel(
        cfg=cfg, params=llada.init_params(jax.random.key(1), cfg), vocab=VOCAB
    )
    seq = np.asarray([[1, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 2]])

    sc = StepConfig(
        batch_size_t2i=0, batch_size_lm=1, batch_size_mmu=0, max_seq_length=0
    )
    opt = optimizers.adamw(3e-3, params_for_mask=model.params)
    state = TrainState.create(model.params, opt)
    step = jax.jit(make_train_step(model, opt, sc))
    batch = {
        "lm_input_ids": jnp.asarray(seq),
        "lm_labels": jnp.asarray(seq),
    }
    for i in range(800):
        state, metrics = step(state, batch, jax.random.key(i))

    trained = dataclasses.replace(model, params=state.params)
    prompt = jnp.asarray(seq[:, :4])
    out = trained.generate(
        prompt, gen_length=12, steps=12, block_length=12, temperature=0.0
    )
    match = (np.asarray(out)[0, 4:] == seq[0, 4:]).mean()
    assert match > 0.8, f"recovered only {match:.0%} of memorized continuation"


@pytest.mark.slow
def test_trained_model_fast_decode_agreement():
    """Quality evidence for the opt-in fast-decode modes on a model with
    real confidence structure (random weights are margin-starved): after
    overfitting, the kv-cached decode, the confidence-parallel decode,
    and their combination all recover the same memorized continuation the
    exact sampler does."""
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=64, n_heads=4,
        n_layers=2, mlp_hidden_size=128,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    model = MMadaModel(
        cfg=cfg, params=llada.init_params(jax.random.key(1), cfg), vocab=VOCAB
    )
    seq = np.asarray([[1, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 2]])

    sc = StepConfig(
        batch_size_t2i=0, batch_size_lm=1, batch_size_mmu=0, max_seq_length=0
    )
    opt = optimizers.adamw(3e-3, params_for_mask=model.params)
    state = TrainState.create(model.params, opt)
    step = jax.jit(make_train_step(model, opt, sc))
    batch = {
        "lm_input_ids": jnp.asarray(seq),
        "lm_labels": jnp.asarray(seq),
    }
    for i in range(800):
        state, _ = step(state, batch, jax.random.key(i))

    trained = dataclasses.replace(model, params=state.params)
    prompt = jnp.asarray(seq[:, :4])
    kw = dict(gen_length=12, steps=12, block_length=6, temperature=0.0)
    exact = np.asarray(trained.generate(prompt, **kw))

    for label, extra in [
        ("kv", dict(block_kv_cache=True)),
        ("kv-int8", dict(block_kv_cache="int8")),
        ("parallel", dict(parallel_threshold=0.9)),
        ("kv+parallel", dict(block_kv_cache=True, parallel_threshold=0.9)),
    ]:
        out = np.asarray(trained.generate(prompt, **kw, **extra))
        agree = (out[0, 4:] == exact[0, 4:]).mean()
        assert agree >= 0.9, f"{label}: agreement {agree:.0%} vs exact"
