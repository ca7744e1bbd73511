"""Training system tests: loss math, corruption laws, end-to-end train step,
and the sharded (FSDP+TP) step on the 8-virtual-device CPU mesh."""

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
from mmada_tpu.training import losses as L
from mmada_tpu.training import masking
from mmada_tpu.training import optimizers
from mmada_tpu.training.lr_schedules import get_scheduler
from mmada_tpu.training.train_step import (
    StepConfig,
    TrainState,
    make_train_step,
)

VOCAB = tiny_layout(text_vocab_size=256, image_codebook_size=64)


def tiny_model(key=0):
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=32, n_heads=2,
        n_layers=2, mlp_hidden_size=64,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    params = llada.init_params(jax.random.key(key), cfg)
    return MMadaModel(cfg=cfg, params=params, vocab=VOCAB)


# ----------------------------------------------------------------- losses

def test_masked_cross_entropy_matches_numpy():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 5, 7)).astype(np.float32)
    labels = rng.integers(0, 7, size=(2, 5))
    labels[0, :2] = L.IGNORE_ID
    ce, valid = L.masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    # reference computation
    e = np.exp(logits - logits.max(-1, keepdims=True))
    logp = np.log(e / e.sum(-1, keepdims=True))
    for b in range(2):
        for i in range(5):
            if labels[b, i] == L.IGNORE_ID:
                assert ce[b, i] == 0 and not valid[b, i]
            else:
                np.testing.assert_allclose(
                    float(ce[b, i]), -logp[b, i, labels[b, i]], rtol=1e-5
                )


def test_lm_loss_modes():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 8, size=(2, 4)))
    masked = jnp.asarray([[True, False, True, False], [False, True, False, False]])
    p_mask = jnp.full((2, 4), 0.5)
    ans = jnp.full((2, 4), 2.0)
    llada_loss = L.lm_loss(logits, labels, masked, p_mask)
    ce, _ = L.masked_cross_entropy(logits, labels)
    want = float((np.asarray(ce)[np.asarray(masked)] / 0.5).sum() / 8)
    np.testing.assert_allclose(float(llada_loss), want, rtol=1e-6)
    # answer-length mode
    chat = L.lm_loss(logits, labels, masked, p_mask, ans)
    want_chat = float((np.asarray(ce)[np.asarray(masked)] / 0.5 / 2.0).sum() / 2)
    np.testing.assert_allclose(float(chat), want_chat, rtol=1e-6)
    # reference stage-3 compounding formula
    ref = L.lm_loss(logits, labels, masked, p_mask, ans, mode="reference_stage3")
    scalar = want
    want_ref = scalar * (np.asarray(masked).sum() / 2.0) / 2
    np.testing.assert_allclose(float(ref), want_ref, rtol=1e-6)


# --------------------------------------------------------------- masking

def test_mask_image_tokens_counts():
    key = jax.random.key(0)
    tokens = jnp.arange(4 * 16).reshape(4, 16) % 64
    ids, labels, mask_prob = masking.mask_image_tokens(
        key, tokens, mask_id=999, mask_schedule=lambda t: t,
    )
    masked = np.asarray(ids == 999)
    want = np.clip(np.round(16 * np.asarray(mask_prob)), 1, None)
    np.testing.assert_array_equal(masked.sum(1), want.astype(int))
    # labels ignore unmasked
    lab = np.asarray(labels)
    assert (lab[~masked] == L.IGNORE_ID).all()
    np.testing.assert_array_equal(lab[masked], np.asarray(tokens)[masked])


def test_mask_contiguous_region():
    key = jax.random.key(1)
    tokens = jnp.zeros((3, 64), jnp.int32)
    ids, _, _ = masking.mask_image_tokens(
        key, tokens, mask_id=9, mask_schedule=lambda t: jnp.full_like(t, 0.5),
        mask_contiguous_region_prob=1.0,
    )
    m = np.asarray(ids == 9).reshape(3, 8, 8)
    for b in range(3):
        ys, xs = np.nonzero(m[b])
        # a filled rectangle: count == bbox area
        assert len(ys) == (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)


def test_mask_text_tokens_law():
    key = jax.random.key(2)
    ids = jnp.zeros((512, 128), jnp.int32) + 5
    noisy, p_mask = masking.mask_text_tokens(key, ids, mask_id=7)
    rate = np.asarray(noisy == 7).mean(axis=1)
    # iid Bernoulli(p) over 128 tokens: allow ~4.5 sigma at worst-case p=0.5
    np.testing.assert_allclose(rate, np.asarray(p_mask)[:, 0], atol=0.2)
    assert abs(rate.mean() - np.asarray(p_mask)[:, 0].mean()) < 0.02


def test_mask_answer_tokens_keeps_prompt():
    key = jax.random.key(3)
    ids = jnp.arange(2 * 10).reshape(2, 10) % 50 + 10
    prompt = jnp.zeros((2, 10), jnp.int32).at[:, :4].set(1)
    noisy, p_mask, ans = masking.mask_answer_tokens(key, ids, prompt, mask_id=7)
    np.testing.assert_array_equal(np.asarray(noisy)[:, :4], np.asarray(ids)[:, :4])
    assert (np.asarray(ans) == 6).all()


# ------------------------------------------------------------- train step

def _toy_batch(rng, model, sc, seq_lm=24, n_img=16):
    text_len = sc.max_seq_length
    l_t2i = text_len + 1 + n_img + 1
    t2i_ids = rng.integers(3, 250, size=(sc.batch_size_t2i, l_t2i))
    t2i_ids[:, text_len + 1:-1] = (
        rng.integers(0, 64, size=(sc.batch_size_t2i, n_img)) + VOCAB.image_offset
    )
    lm_ids = rng.integers(3, 250, size=(sc.batch_size_lm, seq_lm))
    mmu_ids = rng.integers(3, 250, size=(sc.batch_size_mmu, seq_lm))
    mmu_prompt = np.zeros((sc.batch_size_mmu, seq_lm), np.int32)
    mmu_prompt[:, :8] = 1
    # pad lm/mmu rows to t2i length for the concat batch
    def pad(x):
        return np.pad(x, ((0, 0), (0, l_t2i - x.shape[1])), constant_values=2)
    return {
        "t2i_input_ids": jnp.asarray(t2i_ids),
        "t2i_masks": jnp.ones((sc.batch_size_t2i, l_t2i), jnp.int32),
        "lm_input_ids": jnp.asarray(pad(lm_ids)),
        "lm_labels": jnp.asarray(pad(lm_ids)),
        "mmu_input_ids": jnp.asarray(pad(mmu_ids)),
        "mmu_labels": jnp.asarray(
            np.where(pad(mmu_prompt) == 1, L.IGNORE_ID, pad(mmu_ids))
        ),
        "mmu_prompt_masks": jnp.asarray(pad(mmu_prompt)),
    }


def test_train_step_decreases_loss():
    model = tiny_model()
    sc = StepConfig(
        batch_size_t2i=2, batch_size_lm=2, batch_size_mmu=2, max_seq_length=8
    )
    lr = get_scheduler("cosine", 5e-3, warmup_steps=2, total_steps=80)
    opt = optimizers.adamw(lr, params_for_mask=model.params)
    state = TrainState.create(model.params, opt)
    step = jax.jit(make_train_step(model, opt, sc))
    rng = np.random.default_rng(0)
    batch = _toy_batch(rng, model, sc)
    first = None
    for i in range(60):
        state, metrics = step(state, batch, jax.random.key(42))  # fixed noise
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first * 0.7, (first, last)
    assert int(state.step) == 60
    for k in ("loss_t2i", "loss_lm", "loss_mmu", "grad_norm"):
        assert np.isfinite(float(metrics[k]))


def test_train_step_sharded_matches_single():
    """FSDP+TP sharded step on the 8-device CPU mesh reproduces the
    unsharded result."""
    model = tiny_model()
    sc = StepConfig(
        batch_size_t2i=2, batch_size_lm=2, batch_size_mmu=4, max_seq_length=8
    )
    opt = optimizers.adamw(1e-3, params_for_mask=model.params)
    rng = np.random.default_rng(1)
    batch = _toy_batch(rng, model, sc)
    key = jax.random.key(7)

    # unsharded
    state0 = TrainState.create(model.params, opt)
    step_fn = make_train_step(model, opt, sc)
    state1, metrics1 = jax.jit(step_fn)(state0, batch, key)

    # sharded over (data=1, fsdp=4, tensor=2)
    mesh = make_mesh(data=1, fsdp=4, tensor=2)
    params_sh = sharding.shard_params(
        model.params, sharding.llada_param_specs(model.cfg), mesh
    )
    model_sh = dataclasses.replace(model, params=params_sh)
    state_sh = TrainState.create(params_sh, opt)
    # params carry NamedShardings; jit propagates them (GSPMD)
    state2, metrics2 = jax.jit(step_fn)(state_sh, batch, key)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics2["loss"]), rtol=2e-4
    )
    leaves1 = jax.tree.leaves(state1.params)
    leaves2 = jax.tree.leaves(state2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
        )


def test_decay_mask_excludes_norms_and_embeddings():
    model = tiny_model()
    mask = optimizers.decay_mask(model.params)
    assert mask["wte"] is False
    assert mask["ln_f"] is False
    assert mask["blocks"]["attn_norm"] is False
    assert mask["blocks"]["q_proj"] is True
    assert mask["blocks"]["ff_out"] is True


def test_lr_schedules_shapes():
    for name in ("constant", "linear", "cosine", "cosine_with_restarts", "polynomial"):
        fn = get_scheduler(name, 1e-4, warmup_steps=10, total_steps=100)
        assert float(fn(0)) == 0.0 if name != "constant" else True
        mid = float(fn(10))
        np.testing.assert_allclose(mid, 1e-4, rtol=1e-5)
        end = float(fn(100))
        assert end <= 1e-4


def test_per_param_grad_norms():
    import dataclasses as _dc

    from mmada_tpu.training.train_step import make_train_step

    model = tiny_model()
    sc = StepConfig(
        batch_size_t2i=2, batch_size_lm=0, batch_size_mmu=0, max_seq_length=8,
        log_param_grad_norms=True,
    )
    opt = optimizers.adamw(1e-3, params_for_mask=model.params)
    state = TrainState.create(model.params, opt)
    step = jax.jit(make_train_step(model, opt, sc))
    rng = np.random.default_rng(0)
    batch = {k: v for k, v in _toy_batch(rng, model, sc).items()
             if k.startswith("t2i")}
    state, metrics = step(state, batch, jax.random.key(0))
    kinds = [k for k in metrics if k.startswith("grad_norm/")]
    assert any("q_proj" in k for k in kinds)
    assert any(k.endswith("wte") for k in kinds)
    for k in kinds:
        assert np.isfinite(float(metrics[k]))


def test_nonfinite_batch_skipped_on_device():
    """A poison batch (NaN reaching the loss) must leave params and
    optimizer state untouched, flag skipped_nonfinite=1, and an unguarded
    step must demonstrably have poisoned the weights (the failure mode the
    guard prevents). Reference skips NaN-loss batches host-side
    (train_t2m.py:219-238); this skip is on device."""
    import dataclasses as dc

    model = tiny_model()
    sc = StepConfig(
        batch_size_t2i=1, batch_size_lm=1, batch_size_mmu=1, max_seq_length=8
    )
    opt = optimizers.adamw(1e-2, params_for_mask=model.params)
    step = jax.jit(make_train_step(model, opt, sc))
    rng = np.random.default_rng(0)
    batch = _toy_batch(rng, model, sc)

    state = TrainState.create(model.params, opt)
    state1, m1 = step(state, batch, jax.random.key(1))
    assert float(m1["skipped_nonfinite"]) == 0.0
    assert not np.allclose(np.asarray(state1.params["wte"]),
                           np.asarray(state.params["wte"]))

    # poison: NaN in the embedding table -> NaN loss -> no-op update
    bad_params = dict(state1.params)
    bad_params["wte"] = state1.params["wte"].at[5, 0].set(jnp.nan)
    bad_state = TrainState(params=bad_params, opt_state=state1.opt_state,
                           step=state1.step)
    state2, m2 = step(bad_state, batch, jax.random.key(2))
    assert float(m2["skipped_nonfinite"]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(state2.params["blocks"]["q_proj"]),
        np.asarray(bad_state.params["blocks"]["q_proj"]),
    )
    # the unguarded step spreads the NaN into unrelated weights
    unguarded = jax.jit(make_train_step(
        model, opt, dc.replace(sc, skip_nonfinite_updates=False)))
    state3, _ = unguarded(bad_state, batch, jax.random.key(2))
    assert np.isnan(np.asarray(state3.params["blocks"]["q_proj"])).any()


def test_chunked_loss_matches_unchunked():
    """forward_process(loss_chunk>0) — the position-chunked vocab head that
    never materializes (B, L, V) logits — must produce identical losses
    to the full-logits path, for every lm mode, including an L that does
    not divide the chunk size. Gradients must match too (the chunked path
    is a rematerialized scan)."""
    model = tiny_model()
    rng = np.random.default_rng(7)
    bt, bl, bm, Lseq, msl = 2, 2, 2, 21, 6
    b = bt + bl + bm
    ids = jnp.asarray(rng.integers(3, 200, size=(b, Lseq)))
    mask_pos = rng.random((b, Lseq)) < 0.4
    ids = jnp.where(jnp.asarray(mask_pos), VOCAB.mask_token_id, ids)
    labels = jnp.full((b, Lseq), L.IGNORE_ID)
    span = slice(msl + 1, Lseq - 1)
    labels = labels.at[:bt, span].set(
        jnp.asarray(rng.integers(0, 64, size=(bt, Lseq - msl - 2)))
        + VOCAB.image_offset
    )
    labels = labels.at[bt:].set(
        jnp.asarray(rng.integers(3, 200, size=(bl + bm, Lseq)))
    )
    p_lm = jnp.full((bl, Lseq), 0.5)
    p_mmu = jnp.full((bm, Lseq), 0.4)
    ans = jnp.full((bm, Lseq), 5.0)
    ans_lm = jnp.full((bl, Lseq), 3.0)

    for mode, alm in (("llada", None), ("llada", ans_lm),
                      ("reference_stage3", ans_lm)):
        kw = dict(
            batch_size_t2i=bt, batch_size_lm=bl, batch_size_mmu=bm,
            max_seq_length=msl, p_mask_lm=p_lm, p_mask_mmu=p_mmu,
            answer_lengths=ans, answer_lengths_lm=alm, lm_loss_mode=mode,
        )
        _, t0, l0, m0 = L.forward_process(model, ids, labels, **kw)
        none_logits, t1, l1, m1 = L.forward_process(
            model, ids, labels, loss_chunk=8, **kw
        )
        assert none_logits is None
        np.testing.assert_allclose(float(t0), float(t1), rtol=2e-5)
        np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5)
        np.testing.assert_allclose(float(m0), float(m1), rtol=2e-5)

    def loss_of(params, chunk):
        m = dataclasses.replace(model, params=params)
        _, t, l_, mm = L.forward_process(
            m, ids, labels, loss_chunk=chunk,
            batch_size_t2i=bt, batch_size_lm=bl, batch_size_mmu=bm,
            max_seq_length=msl, p_mask_lm=p_lm, p_mask_mmu=p_mmu,
            answer_lengths=ans,
        )
        return t + l_ + mm

    g0 = jax.grad(lambda p: loss_of(p, 0))(model.params)
    g1 = jax.grad(lambda p: loss_of(p, 8))(model.params)
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_train_step_chunked_loss_runs():
    """End-to-end train step with loss_chunk on (the proxy-training
    configuration) — finite loss, params update."""
    import optax

    model = tiny_model()
    sc = StepConfig(
        batch_size_t2i=2, batch_size_lm=1, batch_size_mmu=1,
        max_seq_length=6, loss_chunk=8,
    )
    rng = np.random.default_rng(0)
    n_img = 8
    l_total = sc.max_seq_length + 1 + n_img + 1
    t2i_ids = rng.integers(3, 250, size=(2, l_total))
    t2i_ids[:, sc.max_seq_length + 1:-1] = (
        rng.integers(0, 64, size=(2, n_img)) + VOCAB.image_offset
    )
    lm_ids = rng.integers(3, 250, size=(1, l_total))
    mmu_ids = rng.integers(3, 250, size=(1, l_total))
    mmu_prompt = np.zeros((1, l_total), np.int64)
    mmu_prompt[:, :4] = 1
    batch = {
        "t2i_input_ids": jnp.asarray(t2i_ids),
        "t2i_masks": jnp.ones((2, l_total), jnp.int32),
        "lm_input_ids": jnp.asarray(lm_ids),
        "lm_labels": jnp.asarray(lm_ids),
        "mmu_input_ids": jnp.asarray(mmu_ids),
        "mmu_labels": jnp.asarray(np.where(mmu_prompt == 1, -100, mmu_ids)),
        "mmu_prompt_masks": jnp.asarray(mmu_prompt),
    }
    opt = optimizers.adamw(1e-3, params_for_mask=model.params)
    state = TrainState.create(model.params, opt)
    step = jax.jit(make_train_step(model, opt, sc))
    state2, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_train_step_forward_quantize_w8a8_ste():
    """StepConfig(forward_quantize='w8a8'): the forward runs the STE int8
    path (ops/quantization.tag_w8a8_ste) while the optimizer updates the
    plain bf16 master weights — loss stays finite and DECREASES, proving
    gradients flow through the quantized forward."""
    model = tiny_model()
    sc = StepConfig(
        batch_size_t2i=2, batch_size_lm=2, batch_size_mmu=2,
        max_seq_length=8, forward_quantize="w8a8",
    )
    lr = get_scheduler("cosine", 5e-3, warmup_steps=2, total_steps=80)
    opt = optimizers.adamw(lr, params_for_mask=model.params)
    state = TrainState.create(model.params, opt)
    step = jax.jit(make_train_step(model, opt, sc))
    rng = np.random.default_rng(1)
    batch = _toy_batch(rng, model, sc)
    first = last = None
    for _ in range(40):
        state, metrics = step(state, batch, jax.random.key(42))
        last = float(metrics["loss"])
        if first is None:
            first = last
        assert np.isfinite(last)
    assert last < first
    # master weights stay plain arrays (no quantized leaves in state)
    from mmada_tpu.ops import quantization as Q
    assert not any(Q.is_quantized(l) for l in
                   jax.tree_util.tree_leaves(
                       state.params,
                       is_leaf=Q.is_quantized))
