"""Validation hook tests: artifacts produced for all four hooks."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada, magvit2
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.prompting.universal import ByteTokenizer, SpecialIds, UniversalPrompting
from mmada_tpu.training import validation as V

VOCAB = tiny_layout(text_vocab_size=256, image_codebook_size=32)


@pytest.fixture(scope="module")
def setup():
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=32, n_heads=2, n_layers=2,
        mlp_hidden_size=64,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    model = MMadaModel(
        cfg=cfg, params=llada.init_params(jax.random.key(0), cfg), vocab=VOCAB
    )
    vq_cfg = magvit2.VQGANConfig(
        ch=32, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
        dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1),
        attn_resolutions=(8,), resolution=16, z_channels=5, num_groups=32,
    )
    vq_params = magvit2.init_magvit2(jax.random.key(1), vq_cfg)
    sp = SpecialIds(
        soi=230, eoi=231, t2i=232, mmu=233, r2i=234, t2m=235, som=236,
        eom=237, pad=VOCAB.pad_token_id, bos=1, eos=2,
    )
    tok = ByteTokenizer()
    prompting = UniversalPrompting(tok, sp, max_text_len=8, cond_dropout_prob=0.0)
    return model, vq_params, vq_cfg, tok, prompting


def test_generate_images(setup, tmp_path):
    model, vq_params, vq_cfg, tok, prompting = setup
    px = V.generate_images(
        model, vq_params, vq_cfg, prompting, ["a", "b"], str(tmp_path), 7,
        num_vq_tokens=64, timesteps=2,
    )
    assert px.shape == (2, 16, 16, 3)
    out = tmp_path / "validation" / "step_7"
    assert (out / "t2i_000.png").exists() and (out / "t2i_prompts.jsonl").exists()


def test_visualize_predictions(setup, tmp_path):
    model, vq_params, vq_cfg, tok, prompting = setup
    imgs = np.random.default_rng(0).uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    recon, pred = V.visualize_predictions(
        model, vq_params, vq_cfg, prompting, imgs, ["x"], str(tmp_path), 3
    )
    assert recon.shape == imgs.shape and pred.shape == imgs.shape
    out = tmp_path / "validation" / "step_3"
    for suffix in ("original", "recon", "model"):
        assert (out / f"pred_000_{suffix}.png").exists()


def test_understanding_and_chat(setup, tmp_path):
    model, vq_params, vq_cfg, tok, prompting = setup
    imgs = np.random.default_rng(1).uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    answers = V.understanding_images(
        model, vq_params, vq_cfg, prompting, tok, imgs, "what?",
        str(tmp_path), 1, max_new_tokens=8, steps=4,
    )
    assert len(answers) == 1 and isinstance(answers[0], str)
    chat = V.generate_chat_text(
        model, tok, ["hello"], str(tmp_path), 1,
        gen_length=8, steps=4, block_length=8,
    )
    assert len(chat) == 1
    out = tmp_path / "validation" / "step_1"
    assert (out / "mmu_answers.jsonl").exists() and (out / "chat.jsonl").exists()


def test_understanding_task_typed_fixtures(setup, tmp_path):
    """Run understanding_images over the shipped mmu_validation/ fixtures
    with their per-image VQA questions (reference mmu_validation/ +
    prompts_with_vqa.json parity: one task-typed question per image)."""
    import json
    import pathlib

    from PIL import Image

    from mmada_tpu.data.transforms import image_transform

    model, vq_params, vq_cfg, tok, prompting = setup
    fix_dir = pathlib.Path(__file__).parent.parent / "mmu_validation"
    entries = [
        json.loads(ln)
        for ln in (fix_dir / "prompts.jsonl").read_text().splitlines()
        if ln.strip()
    ]
    assert len(entries) >= 9, "need task-typed fixture coverage"
    vqa = json.loads((fix_dir / "prompts_with_vqa.json").read_text())
    assert {v["file_name"] for v in vqa} == {e["file_name"] for e in entries}

    images, questions = [], []
    for e in entries:
        img = Image.open(fix_dir / e["file_name"])
        images.append(image_transform(img, 16))  # tiny VQ resolution
        questions.append(e["prompt"])
    answers = V.understanding_images(
        model, vq_params, vq_cfg, prompting, tok,
        np.stack(images), questions, str(tmp_path), 2,
        max_new_tokens=8, steps=4,
    )
    assert len(answers) == len(entries)
    recorded = [
        json.loads(ln)
        for ln in (tmp_path / "validation" / "step_2" / "mmu_answers.jsonl")
        .read_text().splitlines()
    ]
    assert [r["question"] for r in recorded] == questions


def test_understanding_question_count_mismatch(setup, tmp_path):
    model, vq_params, vq_cfg, tok, prompting = setup
    imgs = np.random.default_rng(1).uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    import pytest

    with pytest.raises(ValueError):
        V.understanding_images(
            model, vq_params, vq_cfg, prompting, tok, imgs,
            ["only one question"], str(tmp_path), 1,
            max_new_tokens=8, steps=4,
        )


def test_trainer_cadence_runs_all_hooks(tmp_path):
    """Driving train.main for a few synthetic steps with generate_every
    produces every reference validation artifact (train_mmada.py:698-730):
    mmu answers + chat transcript + prediction triptychs in one cadence."""
    import pathlib

    import train as train_mod

    rc = train_mod.main([
        "config=configs/tiny_test.yaml",
        "dataset.synthetic=true",
        "training.max_train_steps=2",
        "experiment.generate_every=2",
        "experiment.log_every=1",
        "training.validation_max_new_tokens=8",
        "training.validation_steps=4",
        f"experiment.output_dir={tmp_path}/out",
    ])
    assert rc == 0
    step_dir = pathlib.Path(tmp_path) / "out" / "validation" / "step_2"
    assert (step_dir / "mmu_answers.jsonl").exists()
    assert (step_dir / "chat.jsonl").exists()
    assert (step_dir / "pred_000_original.png").exists()
    assert (step_dir / "pred_000_model.png").exists()
