"""T2M training path: token mapping, train step convergence, generation
sanity, motion datasets, word vectorizer."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.eval.word_vectorizer import RandomWordVectorizer, pos_onehot
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.prompting.universal import ByteTokenizer, SpecialIds, UniversalPrompting
from mmada_tpu.training import optimizers, t2m
from mmada_tpu.training.train_step import TrainState

VOCAB = tiny_layout(
    text_vocab_size=256, image_codebook_size=32,
    motion_codebook_size=16, motion_special=2,
)


def tiny_model():
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=32, n_heads=2, n_layers=2,
        mlp_hidden_size=64,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    params = llada.init_params(jax.random.key(0), cfg)
    return MMadaModel(cfg=cfg, params=params, vocab=VOCAB)


def make_prompting():
    sp = SpecialIds(
        soi=230, eoi=231, t2i=232, mmu=233, r2i=234, t2m=235, som=236,
        eom=237, pad=VOCAB.pad_token_id, bos=1, eos=2,
    )
    return UniversalPrompting(ByteTokenizer(), sp, max_text_len=8,
                              cond_dropout_prob=0.0)


def test_map_motion_tokens():
    codes = jnp.asarray([[0, 5, 15, 16, 17]])  # incl EOM=16, PAD=17
    fused = t2m.map_motion_tokens(codes, VOCAB)
    assert int(fused[0, 0]) == VOCAB.motion_offset
    assert int(fused[0, -1]) == VOCAB.motion_offset + 17
    assert int(fused.max()) < VOCAB.total_vocab_size


def test_t2m_train_step_decreases_loss():
    model = tiny_model()
    up = make_prompting()
    rng = np.random.default_rng(0)
    n_motion = 8
    codes = rng.integers(0, 16, size=(4, n_motion))
    fused = np.asarray(t2m.map_motion_tokens(jnp.asarray(codes), VOCAB))
    ids, masks, labels = up((["walk", "run", "sit", "hop"], fused, fused),
                            "t2m", dropout=False)

    sc = t2m.T2MStepConfig(
        batch_size=4, max_text_len=up.max_text_len, num_motion_tokens=n_motion,
    )
    opt = optimizers.adamw(5e-3, params_for_mask=model.params)
    state = TrainState.create(model.params, opt)
    step = jax.jit(t2m.make_t2m_train_step(model, opt, sc))
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.asarray(masks),
    }
    first = None
    for i in range(40):
        state, metrics = step(state, batch, jax.random.key(3))
        if first is None:
            first = float(metrics["loss"])
    assert np.isfinite(first)
    assert float(metrics["loss"]) < first * 0.8


def test_t2m_generate_range_sanity():
    model = tiny_model()
    up = make_prompting()
    n_motion = 8
    frame = np.concatenate([
        np.full((2, up.max_text_len), 5),
        np.full((2, 1), up.sp.som),
        np.full((2, n_motion), VOCAB.mask_token_id),
        np.full((2, 1), up.sp.eom),
    ], axis=1).astype(np.int64)
    out = model.t2m_generate(
        jnp.asarray(frame), timesteps=3, num_motion_tokens=n_motion,
        key=jax.random.key(0),
    )
    # note: window includes EOM/PAD rows; raw range check covers codes only
    stats = t2m.token_range_sanity(
        jnp.clip(out, 0, VOCAB.motion_codebook_size - 1), VOCAB
    )
    assert stats["in_range"]
    assert 0 < stats["mode_collapse_top_token_frac"] <= 1.0


def test_motion_token_dataset(tmp_path):
    from mmada_tpu.data.motion import MotionTokenDataset

    root = tmp_path
    (root / "toktest").mkdir()
    (root / "texts").mkdir()
    names = []
    rng = np.random.default_rng(0)
    for i in range(3):
        name = f"m{i:03d}"
        names.append(name)
        np.save(root / "toktest" / f"{name}.npy", rng.integers(0, 16, size=(6,)))
        (root / "texts" / f"{name}.txt").write_text(
            "a person walks#a/DET person/NOUN walks/VERB#0.0#0.0\n"
        )
    split = root / "train.txt"
    split.write_text("\n".join(names))

    ds = MotionTokenDataset(
        str(root), str(split), "toktest", nb_code=16, max_motion_length=10,
    )
    assert len(ds) == 3
    caption, tokens, m_len = ds[0]
    assert caption == "a person walks"
    assert tokens.shape == (10,)
    assert t2m.map_motion_tokens(jnp.asarray(tokens), VOCAB).max() < VOCAB.total_vocab_size
    # EOM terminates the real span
    assert tokens[m_len] == 16 or tokens[m_len - 1] == 16


def test_motion_eval_dataset(tmp_path):
    from mmada_tpu.data.motion import MotionEvalDataset

    root = tmp_path
    (root / "new_joint_vecs").mkdir()
    (root / "texts").mkdir()
    rng = np.random.default_rng(1)
    np.save(root / "new_joint_vecs" / "a.npy",
            rng.normal(size=(64, 11)).astype(np.float32))
    (root / "texts" / "a.txt").write_text(
        "someone jumps#someone/PRON jumps/VERB#0.0#0.0\n"
    )
    np.save(root / "Mean.npy", np.zeros(11, np.float32))
    np.save(root / "Std.npy", np.ones(11, np.float32))
    split = root / "val.txt"
    split.write_text("a\n")

    ds = MotionEvalDataset(
        str(root), str(split), RandomWordVectorizer(dim=12), max_text_len=6,
        min_motion_len=10, max_motion_length=80,
    )
    item = ds[0]
    assert item["word_embs"].shape[1] == 12
    assert item["pos_onehot"].shape[1] == 15
    assert item["motion"].shape == (80, 11)
    assert item["m_len"] == 64


def test_pos_onehot():
    assert pos_onehot("VERB")[0] == 1
    assert pos_onehot("NOPE")[14] == 1


def test_word_vectorizer_vip_override():
    wv = RandomWordVectorizer(dim=8)
    _, pos = wv["walk/NOUN"]
    assert pos[12] == 1  # Act_VIP wins over the provided POS


def test_t2m_lora_train_step():
    """LoRA t2m fine-tune: base frozen, adapters train, loss decreases."""
    from mmada_tpu.models import lora as lora_mod

    model = tiny_model()
    up = make_prompting()
    lcfg = lora_mod.LoRAConfig(rank=4, alpha=8, train_embeddings=False)
    adapters = lora_mod.init_lora(jax.random.key(1), model.params, lcfg)
    trainable = lora_mod.trainable_params(model.params, adapters, lcfg)

    rng = np.random.default_rng(0)
    n_motion = 8
    codes = rng.integers(0, 16, size=(4, n_motion))
    fused = np.asarray(t2m.map_motion_tokens(jnp.asarray(codes), VOCAB))
    ids, masks, labels = up((["walk", "run", "sit", "hop"], fused, fused),
                            "t2m", dropout=False)
    batch = {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.asarray(masks),
    }
    sc = t2m.T2MStepConfig(batch_size=4, max_text_len=up.max_text_len,
                           num_motion_tokens=n_motion)
    import optax
    opt = optax.adamw(5e-3)
    from mmada_tpu.training.train_step import TrainState
    state = TrainState.create(trainable, opt)
    step = jax.jit(t2m.make_t2m_lora_train_step(model, opt, sc, lcfg))
    first = None
    base_before = jax.tree.leaves(model.params)[2]
    for i in range(30):
        state, metrics = step(state, batch, jax.random.key(3))
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    # base params untouched
    np.testing.assert_array_equal(
        np.asarray(base_before), np.asarray(jax.tree.leaves(model.params)[2])
    )
    # adapters changed
    assert not np.allclose(
        np.asarray(state.params["lora"]["blocks"]["q_proj"]["b"]),
        np.asarray(adapters["blocks"]["q_proj"]["b"]),
    )
