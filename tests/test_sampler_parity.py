"""Token-exact parity of the scan-based samplers vs PyTorch reference goldens.

Deterministic configurations (see tools/gen_goldens.py): temperature 0
everywhere; t2i additionally runs greedy sampling (the reference golden was
produced with torch.multinomial patched to argmax). Every committed token
must match the reference loop exactly.
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_tpu.checkpoints.hf_import import params_from_torch_state_dict
from mmada_tpu.models import llada
from mmada_tpu.sampling import text as text_sampling
from mmada_tpu.sampling import t2i as t2i_sampling

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

MASK_ID = 90
TEXT_LEN = 64
CODEBOOK = 16


def load_golden(name):
    data = np.load(os.path.join(GOLDENS, f"{name}.npz"))
    state = {k[len("w::"):]: data[k] for k in data.files if k.startswith("w::")}
    rest = {k: data[k] for k in data.files if not k.startswith("w::")}
    return state, rest


def tiny_cfg():
    return llada.LLaDAConfig(
        d_model=64, n_heads=4, n_layers=2, mlp_hidden_size=128,
        vocab_size=96, embedding_size=96, max_sequence_length=128,
        rope_theta=10000.0, mask_token_id=MASK_ID,
    )


@pytest.mark.parametrize("cfg_scale", [0.0, 1.5])
def test_text_generate_parity(cfg_scale):
    state, rest = load_golden("text_generate")
    cfg = tiny_cfg()
    params = params_from_torch_state_dict(state, cfg)

    def forward_fn(tokens):
        return llada.forward(params, cfg, tokens)

    scfg = text_sampling.SemiARConfig(
        gen_length=16, steps=8, block_length=8,
        temperature=0.0, cfg_scale=cfg_scale, mask_id=MASK_ID,
    )
    out = text_sampling.generate(forward_fn, jnp.asarray(rest["prompt"]), scfg)
    want = rest[f"out_cfg{cfg_scale}"]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_text_generate_stepwise_trajectory():
    """Stepwise trajectory: final state equals generate()'s output exactly;
    masked count is non-increasing step to step; committed tokens never
    change once placed (semi-AR blocks freeze beyond the active block)."""
    state, rest = load_golden("text_generate")
    cfg = tiny_cfg()
    params = params_from_torch_state_dict(state, cfg)

    def forward_fn(tokens):
        return llada.forward(params, cfg, tokens)

    scfg = text_sampling.SemiARConfig(
        gen_length=16, steps=8, block_length=8,
        temperature=0.0, cfg_scale=0.0, mask_id=MASK_ID,
    )
    prompt = jnp.asarray(rest["prompt"])
    traj = np.asarray(text_sampling.generate_stepwise(forward_fn, prompt, scfg))
    assert traj.shape[0] == 8
    final = np.asarray(text_sampling.generate(forward_fn, prompt, scfg))
    np.testing.assert_array_equal(traj[-1], final)

    mask_counts = (traj == MASK_ID).sum(axis=(1, 2))
    assert (np.diff(mask_counts) <= 0).all()
    assert mask_counts[-1] == 0
    # once committed, a token never flips
    for s in range(1, traj.shape[0]):
        prev_committed = traj[s - 1] != MASK_ID
        np.testing.assert_array_equal(
            traj[s][prev_committed], traj[s - 1][prev_committed]
        )


def test_text_generate_jits_end_to_end():
    state, rest = load_golden("text_generate")
    cfg = tiny_cfg()
    params = params_from_torch_state_dict(state, cfg)

    scfg = text_sampling.SemiARConfig(
        gen_length=16, steps=8, block_length=8,
        temperature=0.0, cfg_scale=0.0, mask_id=MASK_ID,
    )

    @jax.jit
    def run(prompt):
        return text_sampling.generate(
            lambda t: llada.forward(params, cfg, t), prompt, scfg
        )

    out = run(jnp.asarray(rest["prompt"]))
    np.testing.assert_array_equal(np.asarray(out), rest["out_cfg0.0"])


@pytest.mark.parametrize("gs", [0.0, 2.0])
def test_t2i_generate_parity(gs):
    state, rest = load_golden("t2i_generate")
    cfg = tiny_cfg()
    params = params_from_torch_state_dict(state, cfg)
    n_img = 16

    def window_forward(tokens, attention_mask):
        logits = llada.forward(
            params, cfg, tokens,
            attention_mask=attention_mask,
            logit_window=(TEXT_LEN, TEXT_LEN + CODEBOOK),
        )
        return logits[:, -(n_img + 1):-1, :]

    mcfg = t2i_sampling.MaskGITConfig(
        timesteps=6, temperature=0.0, guidance_scale=gs,
        mask_id=MASK_ID, num_vq_tokens=n_img, codebook_size=CODEBOOK,
        text_vocab_size=TEXT_LEN, greedy=True,
    )
    out = t2i_sampling.t2i_generate(
        window_forward,
        jnp.asarray(rest["input_ids"]),
        mcfg,
        key=jax.random.key(0),
        uncond_input_ids=jnp.asarray(rest["uncond_ids"]) if gs > 0 else None,
        attention_mask=jnp.asarray(rest["attn"]),
        uncond_attention_mask=(
            jnp.asarray(rest["uncond_attn"]) if gs > 0 else None
        ),
    )
    want = rest[f"out_gs{gs}"]
    np.testing.assert_array_equal(np.asarray(out), want)


def test_num_transfer_schedule():
    counts = jnp.asarray([10, 7, 8])
    sched = text_sampling.num_transfer_schedule(counts, 4)
    np.testing.assert_array_equal(
        np.asarray(sched),
        [[3, 3, 2, 2], [2, 2, 2, 1], [2, 2, 2, 2]],
    )
    assert (np.asarray(sched).sum(1) == np.asarray(counts)).all()


def test_stochastic_generation_valid():
    """T>0 path: output has no masks left, prompt preserved, tokens in vocab."""
    state, rest = load_golden("text_generate")
    cfg = tiny_cfg()
    params = params_from_torch_state_dict(state, cfg)
    scfg = text_sampling.SemiARConfig(
        gen_length=16, steps=8, block_length=8,
        temperature=1.0, cfg_scale=0.0, mask_id=MASK_ID,
    )
    prompt = jnp.asarray(rest["prompt"])
    out = np.asarray(
        text_sampling.generate(
            lambda t: llada.forward(params, cfg, t),
            prompt, scfg, key=jax.random.key(1),
        )
    )
    assert (out[:, : prompt.shape[1]] == np.asarray(prompt)).all()
    assert (out != MASK_ID).all()
    assert (out >= 0).all() and (out < cfg.vocab_size).all()

    # different keys produce different samples
    out2 = np.asarray(
        text_sampling.generate(
            lambda t: llada.forward(params, cfg, t),
            prompt, scfg, key=jax.random.key(2),
        )
    )
    assert (out != out2).any()


def test_t2m_generate_parity():
    """Motion MaskGIT vs reference `t2m_generate` (modelling_ours.py:557-682).

    Compared against the *committed* motion span of the reference's mutated
    input_ids (merged tokens). The reference's raw return value re-samples
    already-committed positions on the last step — a documented wart we fix
    (sampling/motion.py returns merged tokens).
    """
    state, rest = load_golden("t2m_generate")
    cfg = tiny_cfg()
    params = params_from_torch_state_dict(state, cfg)
    n_motion = 8
    motion_offset = TEXT_LEN + CODEBOOK  # 80
    from mmada_tpu.sampling import motion as motion_sampling

    def window_forward(tokens, attention_mask):
        logits = llada.forward(
            params, cfg, tokens,
            attention_mask=attention_mask,
            logit_window=(motion_offset, motion_offset + 8),
        )
        return logits[:, -(n_motion + 1):-1, :]

    mcfg = motion_sampling.MotionGITConfig(
        timesteps=5, temperature=0.0, mask_id=MASK_ID,
        num_motion_tokens=n_motion, motion_vocab_size=8,
        motion_offset=motion_offset, greedy=True,
    )
    out = motion_sampling.t2m_generate(
        window_forward, jnp.asarray(rest["input_ids"]), mcfg,
        key=jax.random.key(0),
    )
    np.testing.assert_array_equal(np.asarray(out), rest["out_committed"])
