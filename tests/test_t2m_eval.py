"""T2M evaluator + metric parity vs reference goldens."""

import os

import jax.numpy as jnp
import numpy as np

from mmada_tpu.eval import t2m_metrics as M
from mmada_tpu.eval.t2m_evaluator import (
    EvaluatorWrapper,
    motion_encoder_from_torch,
    movement_encoder_from_torch,
    text_encoder_from_torch,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def load():
    data = np.load(os.path.join(GOLDENS, "t2m_evaluator.npz"))
    wt = {k[4:]: data[k] for k in data.files if k.startswith("wt::")}
    wm = {k[4:]: data[k] for k in data.files if k.startswith("wm::")}
    wv = {k[4:]: data[k] for k in data.files if k.startswith("wv::")}
    rest = {k: data[k] for k in data.files if "::" not in k}
    return wt, wm, wv, rest


def test_text_encoder_parity():
    wt, _, _, rest = load()
    from mmada_tpu.eval.t2m_evaluator import text_encoder_forward

    p = text_encoder_from_torch(wt)
    emb = text_encoder_forward(
        p, jnp.asarray(rest["word_embs"]), jnp.asarray(rest["pos_onehot"]),
        jnp.asarray(rest["cap_lens"]),
    )
    np.testing.assert_allclose(
        np.asarray(emb), rest["text_emb"], atol=2e-5, rtol=1e-4
    )


def test_movement_and_motion_encoder_parity():
    _, wm, wv, rest = load()
    from mmada_tpu.eval.t2m_evaluator import (
        motion_encoder_forward,
        movement_encoder_forward,
    )

    pv = movement_encoder_from_torch(wv)
    move = movement_encoder_forward(pv, jnp.asarray(rest["motions"][..., :-4]))
    np.testing.assert_allclose(
        np.asarray(move), rest["move_feats"], atol=2e-5, rtol=1e-4
    )
    pm = motion_encoder_from_torch(wm)
    emb = motion_encoder_forward(pm, move, jnp.asarray(rest["m_lens"] // 4))
    np.testing.assert_allclose(
        np.asarray(emb), rest["motion_emb"], atol=2e-5, rtol=1e-4
    )


def test_wrapper_end_to_end():
    wt, wm, wv, rest = load()
    wrapper = EvaluatorWrapper.from_torch_checkpoint(wt, wm, wv)
    text_emb, motion_emb = wrapper.get_co_embeddings(
        jnp.asarray(rest["word_embs"]), jnp.asarray(rest["pos_onehot"]),
        jnp.asarray(rest["cap_lens"]), jnp.asarray(rest["motions"]),
        jnp.asarray(rest["m_lens"]),
    )
    np.testing.assert_allclose(
        np.asarray(motion_emb), rest["motion_emb"], atol=2e-5, rtol=1e-4
    )


def test_r_precision_parity():
    _, _, _, rest = load()
    topk, matching = M.calculate_R_precision(rest["rp_e1"], rest["rp_e2"], 3)
    np.testing.assert_array_equal(topk, rest["rp_topk"])
    np.testing.assert_allclose(matching, rest["rp_matching"], rtol=1e-10)


def test_fid_parity():
    _, _, _, rest = load()
    fid = M.calculate_frechet_distance(
        rest["fid_mu1"], rest["fid_s1"], rest["fid_mu2"], rest["fid_s2"]
    )
    np.testing.assert_allclose(fid, rest["fid"], rtol=1e-8)


def test_fid_identity_is_zero():
    rng = np.random.default_rng(0)
    act = rng.normal(size=(100, 8))
    mu, sigma = M.calculate_activation_statistics(act)
    assert abs(M.calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_diversity_and_multimodality_shapes():
    rng = np.random.default_rng(1)
    act = rng.normal(size=(50, 8))
    d = M.calculate_diversity(act, 20, rng)
    assert d > 0
    act3 = rng.normal(size=(5, 10, 8))
    mm = M.calculate_multimodality(act3, 4, rng)
    assert mm > 0


def test_evaluate_embeddings_summary():
    rng = np.random.default_rng(2)
    text = rng.normal(size=(20, 8))
    gt = rng.normal(size=(20, 8))
    gen = gt + rng.normal(size=(20, 8)) * 0.1
    out = M.evaluate_embeddings(text, gt, gen, top_k=3, diversity_times=10)
    assert set(out) >= {
        "fid", "matching_score", "r_precision_top1", "r_precision_top2",
        "r_precision_top3", "diversity_gt", "diversity_gen",
    }
    assert out["fid"] >= 0


def test_motion_math_parity():
    """qrot/qmul/recover_from_ric vs reference goldens
    (utils/quaternion.py, utils/motion_process.py)."""
    from mmada_tpu.eval.motion_math import qmul, qrot, recover_from_ric

    data = np.load(os.path.join(GOLDENS, "motion_math.npz"))
    np.testing.assert_allclose(qrot(data["q"], data["v"]), data["qrot"], atol=1e-5)
    np.testing.assert_allclose(qmul(data["q"], data["r"]), data["qmul"], atol=1e-5)
    joints = recover_from_ric(data["ric_data"], 22)
    np.testing.assert_allclose(joints, data["ric_joints"], atol=1e-4)
