"""Segmented exact sampler: token-identical to `generate`, many programs.

`generate_segmented` exists because the tunneled axon TPU worker kills any
single program execution running longer than ~60 s (measured round-3; see
BASELINE.md), and the reference MMU operating point (max_new_tokens 1024 /
steps 512 / block 1024, /root/reference/inference_mmu.py:57,102) exceeds
that 2x at 8B. Chunking the per-block denoise scan over precomputed
(step_keys, transfers) rows is associative in the carry `x`, so the output
must be BIT-identical to `generate` for every chunk size — including chunk
sizes that do not divide steps_per_block — for deterministic AND stochastic
sampling, at the library level and through `MMadaModel.generate`.

These tests run on CPU, where XLA numerics are program-independent, so
bit-exactness is the contract. On TPU the chunked and whole-scan programs
compile separately and bf16 near-ties may flip across them on random
weights (measured round-3g: 2/80 tokens on a random tiny model; all chunk
sizes mutually bit-exact; trained 165M proxy token-EXACT at seg 4/16) —
see sampling/text.generate_segmented's docstring.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.checkpoints.hf_import import params_from_torch_state_dict
from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.sampling import text as text_sampling

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")
MASK_ID = 90


def _golden_forward():
    data = np.load(os.path.join(GOLDENS, "text_generate.npz"))
    state = {k[len("w::"):]: data[k] for k in data.files if k.startswith("w::")}
    cfg = llada.LLaDAConfig(
        d_model=64, n_heads=4, n_layers=2, mlp_hidden_size=128,
        vocab_size=96, embedding_size=96, max_sequence_length=128,
        rope_theta=10000.0, mask_token_id=MASK_ID,
    )
    params = params_from_torch_state_dict(state, cfg)
    prompt = jnp.asarray(data["prompt"])
    return (lambda t: llada.forward(params, cfg, t)), prompt


@pytest.mark.parametrize("segment_steps", [1, 3, 4, 8])
@pytest.mark.parametrize("cfg_scale", [0.0, 1.5])
def test_segmented_matches_generate(cfg_scale, segment_steps):
    """Every chunk size — divisor or not — reproduces `generate` exactly
    (and hence the torch reference golden, via test_sampler_parity)."""
    forward_fn, prompt = _golden_forward()
    scfg = text_sampling.SemiARConfig(
        gen_length=16, steps=8, block_length=8,
        temperature=0.0, cfg_scale=cfg_scale, mask_id=MASK_ID,
    )
    want = np.asarray(text_sampling.generate(forward_fn, prompt, scfg))
    got = np.asarray(
        text_sampling.generate_segmented(
            forward_fn, prompt, scfg, segment_steps=segment_steps
        )
    )
    np.testing.assert_array_equal(got, want)


def test_segmented_stochastic_matches_generate():
    """Stochastic path: the same PRNG key must yield the same tokens as
    `generate` because both consume the identical per-block key schedule
    (_block_key_schedule) — segmentation only re-slices it."""
    forward_fn, prompt = _golden_forward()
    scfg = text_sampling.SemiARConfig(
        gen_length=16, steps=8, block_length=8,
        temperature=0.7, cfg_scale=0.0, mask_id=MASK_ID,
    )
    key = jax.random.key(7)
    want = np.asarray(text_sampling.generate(forward_fn, prompt, scfg, key=key))
    got = np.asarray(
        text_sampling.generate_segmented(
            forward_fn, prompt, scfg, key=key, segment_steps=3
        )
    )
    np.testing.assert_array_equal(got, want)


def test_segmented_requires_key_when_stochastic():
    forward_fn, prompt = _golden_forward()
    scfg = text_sampling.SemiARConfig(
        gen_length=16, steps=8, block_length=8,
        temperature=0.5, mask_id=MASK_ID,
    )
    with pytest.raises(ValueError, match="PRNG key"):
        text_sampling.generate_segmented(forward_fn, prompt, scfg)


def test_segmented_rejects_bad_segment_steps():
    forward_fn, prompt = _golden_forward()
    scfg = text_sampling.SemiARConfig(
        gen_length=16, steps=8, block_length=8, mask_id=MASK_ID,
    )
    with pytest.raises(ValueError, match="segment_steps"):
        text_sampling.generate_segmented(
            forward_fn, prompt, scfg, segment_steps=0
        )


def test_model_generate_segmented_matches():
    """Model entry point: segment_steps=N output equals the unsegmented
    exact sampler's, and the jitted chunk runner reuses one executable for
    all equal-length chunks across blocks (model passed as pytree arg)."""
    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    prompt = jax.random.randint(jax.random.key(1), (2, 24), 3, 200)

    want = np.asarray(
        m.generate(prompt, gen_length=16, steps=8, block_length=8)
    )
    for seg in (1, 3, 8):
        got = np.asarray(
            m.generate(prompt, gen_length=16, steps=8, block_length=8,
                       segment_steps=seg)
        )
        np.testing.assert_array_equal(got, want)


def test_model_segmented_warmup_parallel_matches_monolithic():
    """parallel_threshold + parallel_warmup_steps under segmentation: the
    chunk runner threads the chunk's in-block step offset, so the warmup
    gate binds to the BLOCK step index — output must equal the monolithic
    sampler for every chunk size (the CLAUDE.md bit-exactness invariant;
    before the offset threading, warmup re-suppressed tau at every chunk
    boundary and diverged)."""
    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    prompt = jax.random.randint(jax.random.key(7), (2, 24), 3, 200)

    kw = dict(gen_length=16, steps=8, block_length=8, temperature=0.0,
              parallel_threshold=0.5, parallel_warmup_steps=2)
    want = np.asarray(m.generate(prompt, **kw))
    for seg in (1, 2, 3, 4):
        got = np.asarray(m.generate(prompt, **kw, segment_steps=seg))
        np.testing.assert_array_equal(got, want, err_msg=f"seg={seg}")


def test_model_generate_segmented_rejects_kv_cache():
    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    prompt = jnp.zeros((1, 8), jnp.int32) + 3
    with pytest.raises(ValueError, match="exact sampler only"):
        m.generate(prompt, gen_length=8, steps=4, block_length=8,
                   segment_steps=2, block_kv_cache=True)


def test_row_keys_require_stochastic():
    """row_keys selects the per-row vmapped runner; with deterministic
    settings the key schedule has the wrong shape for it, so SegmentedRun
    must reject the combination loudly."""
    forward_fn, prompt = _golden_forward()
    scfg = text_sampling.SemiARConfig(
        gen_length=16, steps=8, block_length=8, mask_id=MASK_ID,
    )
    keys = jax.vmap(jax.random.key)(jnp.arange(2, dtype=jnp.uint32))
    with pytest.raises(ValueError, match="row_keys requires stochastic"):
        text_sampling.SegmentedRun(prompt, scfg, row_keys=keys)


# ------------------------------------------------------------------- t2i

TEXT_LEN = 64
CODEBOOK = 16
N_IMG = 16


def _t2i_setup(gs):
    data = np.load(os.path.join(GOLDENS, "t2i_generate.npz"))
    state = {k[len("w::"):]: data[k] for k in data.files if k.startswith("w::")}
    cfg = llada.LLaDAConfig(
        d_model=64, n_heads=4, n_layers=2, mlp_hidden_size=128,
        vocab_size=96, embedding_size=96, max_sequence_length=128,
        rope_theta=10000.0, mask_token_id=MASK_ID,
    )
    params = params_from_torch_state_dict(state, cfg)

    def window_forward(tokens, attention_mask):
        logits = llada.forward(
            params, cfg, tokens, attention_mask=attention_mask,
            logit_window=(TEXT_LEN, TEXT_LEN + CODEBOOK),
        )
        return logits[:, -(N_IMG + 1):-1, :]

    from mmada_tpu.sampling import t2i as t2i_sampling

    mcfg = t2i_sampling.MaskGITConfig(
        timesteps=6, temperature=1.0, guidance_scale=gs,
        mask_id=MASK_ID, num_vq_tokens=N_IMG, codebook_size=CODEBOOK,
        text_vocab_size=TEXT_LEN, greedy=False,
    )
    kw = dict(
        uncond_input_ids=jnp.asarray(data["uncond_ids"]) if gs > 0 else None,
        attention_mask=jnp.asarray(data["attn"]),
        uncond_attention_mask=(
            jnp.asarray(data["uncond_attn"]) if gs > 0 else None
        ),
    )
    return t2i_sampling, window_forward, jnp.asarray(data["input_ids"]), mcfg, kw


@pytest.mark.parametrize("segment_timesteps", [1, 4, 6])
@pytest.mark.parametrize("gs", [0.0, 2.0])
def test_t2i_segmented_matches_monolithic(gs, segment_timesteps):
    """Windowed MaskGIT (incl. non-dividing window sizes and CFG
    batch-doubling) is bit-identical to the monolithic scan: temperature
    compounding, schedule ratios, and per-step keys all ride the scanned
    rows. Stochastic (categorical) sampling included — the key schedule
    is split once up front in both paths."""
    t2i_sampling, fwd, input_ids, mcfg, kw = _t2i_setup(gs)
    key = jax.random.key(3)
    want = np.asarray(t2i_sampling.t2i_generate(fwd, input_ids, mcfg,
                                                key=key, **kw))
    got = np.asarray(t2i_sampling.t2i_generate_segmented(
        fwd, input_ids, mcfg, key=key,
        segment_timesteps=segment_timesteps, **kw,
    ))
    np.testing.assert_array_equal(got, want)


def test_t2i_segmented_windows_match_stepwise_trajectory():
    """Concatenated per-window grids == the monolithic stepwise
    trajectory — the incremental-streaming contract (frames shown during
    generation are exactly the frames the monolithic demo would show)."""
    t2i_sampling, fwd, input_ids, mcfg, kw = _t2i_setup(2.0)
    key = jax.random.key(5)
    traj = np.asarray(t2i_sampling.t2i_generate_stepwise(
        fwd, input_ids, mcfg, key=key, **kw,
    ))
    run = t2i_sampling.SegmentedT2IRun(
        fwd, input_ids, mcfg, key=key, segment_timesteps=4, **kw,
    )
    windows = []
    while not run.step():
        windows.append(np.asarray(run.last_window))
    windows.append(np.asarray(run.last_window))
    np.testing.assert_array_equal(np.concatenate(windows, axis=0), traj)
    np.testing.assert_array_equal(np.asarray(run.codes), traj[-1])


def test_model_t2i_segment_timesteps():
    """Model entry point: segment_timesteps output equals the monolithic
    sampler's; kv-cache and stepwise combinations are rejected."""
    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    n_img = 16
    frame = np.concatenate([
        np.full((2, 6), 5),
        np.full((2, 1), 230),
        np.full((2, n_img), vl.mask_token_id),
        np.full((2, 1), 231),
    ], axis=1).astype(np.int32)
    uncond = frame.copy()
    uncond[:, :6] = vl.pad_token_id
    kw = dict(
        uncond_input_ids=jnp.asarray(uncond), timesteps=6,
        guidance_scale=1.5, num_vq_tokens=n_img, key=jax.random.key(1),
    )
    want = np.asarray(m.t2i_generate(jnp.asarray(frame), **kw))
    for seg in (2, 4):
        got = np.asarray(
            m.t2i_generate(jnp.asarray(frame), segment_timesteps=seg, **kw)
        )
        np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="exact sampler only"):
        m.t2i_generate(jnp.asarray(frame), segment_timesteps=2,
                       block_kv_cache=True, **kw)
    with pytest.raises(ValueError, match="stepwise"):
        m.t2i_generate(jnp.asarray(frame), segment_timesteps=2,
                       stepwise=True, **kw)


# ------------------------------------------------------------------- t2m

def test_t2m_segmented_matches_monolithic():
    """Windowed MotionGIT — incl. the last-step commit-everything rule
    riding absolute ts rows — is bit-identical to the monolithic scan."""
    from mmada_tpu.sampling import motion as motion_sampling

    vl = tiny_layout().with_motion(codebook_size=32)
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    n = 16
    frame = np.concatenate([
        np.full((2, 6), 5),
        np.full((2, 1), 230),
        np.full((2, n), vl.mask_token_id),
        np.full((2, 1), 231),
    ], axis=1).astype(np.int32)
    kw = dict(timesteps=6, num_motion_tokens=n, key=jax.random.key(2))
    want = np.asarray(m.t2m_generate(jnp.asarray(frame), **kw))
    for seg in (1, 4):
        got = np.asarray(
            m.t2m_generate(jnp.asarray(frame), segment_timesteps=seg, **kw)
        )
        np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="exact sampler only"):
        m.t2m_generate(jnp.asarray(frame), segment_timesteps=2,
                       block_kv_cache=True, **kw)


def test_segmented_stepwise_states_match_trajectory():
    """collect_states: concatenated per-chunk states equal the monolithic
    generate_stepwise trajectory, step for step — the streamed text
    demo's exactness contract."""
    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    prompt = jax.random.randint(jax.random.key(1), (1, 12), 3, 200)
    traj = np.asarray(m.generate_stepwise(
        prompt, gen_length=16, steps=8, block_length=8, temperature=0.7,
        key=jax.random.key(4),
    ))
    run = m.segmented_stepwise_run(
        prompt, gen_length=16, steps=8, block_length=8, temperature=0.7,
        key=jax.random.key(4), segment_steps=3,
    )
    chunks = []
    while not run.step():
        chunks.append(np.asarray(run.last_states))
    chunks.append(np.asarray(run.last_states))
    np.testing.assert_array_equal(np.concatenate(chunks, axis=0), traj)


# ---------------------------------------------------------- cfg_interval

def _manual_interval_trajectory(t2i_sampling, fwd, input_ids, mcfg, kw, key):
    """Expected cfg_interval trajectory built from first principles: chain
    run_timestep_window over the three phases with guidance explicitly on
    (inside [lo, hi)) or off (outside), against the SAME ts/step_keys rows
    the monolithic scan consumes."""
    import dataclasses as _dc

    lo_idx, hi_idx = t2i_sampling.cfg_interval_steps(mcfg)
    flat = _dc.replace(mcfg, cfg_interval=(0.0, 1.0))
    off = _dc.replace(flat, guidance_scale=0.0)
    keys = jax.random.split(key, mcfg.timesteps)
    ts = jnp.arange(mcfg.timesteps, dtype=jnp.float32)
    carry = t2i_sampling.init_carry(input_ids, mcfg)
    outs = []
    for s0, s1, cfg_w in ((0, lo_idx, off), (lo_idx, hi_idx, flat),
                          (hi_idx, mcfg.timesteps, off)):
        if s1 > s0:
            carry, sampled = t2i_sampling.run_timestep_window(
                fwd, carry, ts[s0:s1], keys[s0:s1], cfg_w, **kw)
            outs.append(np.asarray(sampled))
    return np.concatenate(outs, axis=0)


def test_t2i_cfg_interval_matches_manual_phases():
    """cfg_interval=(lo, hi) in the monolithic sampler equals explicitly
    chaining guidance-off / guidance-on / guidance-off windows — the
    interval changes ONLY which steps pay the batch-doubled CFG forward."""
    t2i_sampling, fwd, input_ids, mcfg, kw = _t2i_setup(2.0)
    key = jax.random.key(7)
    mcfg_iv = dataclasses.replace(mcfg, cfg_interval=(1 / 6, 5 / 6))
    got = np.asarray(t2i_sampling.t2i_generate_stepwise(
        fwd, input_ids, mcfg_iv, key=key, **kw))
    want = _manual_interval_trajectory(
        t2i_sampling, fwd, input_ids, mcfg_iv, kw, key)
    np.testing.assert_array_equal(got, want)


def test_t2i_cfg_interval_empty_equals_guidance_off():
    """An empty interval never applies CFG: token-identical to running
    with guidance_scale=0 (the reference's uncond-free step,
    modeling_mmada.py:168-172) under the same keys."""
    t2i_sampling, fwd, input_ids, mcfg, kw = _t2i_setup(2.0)
    key = jax.random.key(11)
    mcfg_empty = dataclasses.replace(mcfg, cfg_interval=(0.0, 0.0))
    got = np.asarray(t2i_sampling.t2i_generate(
        fwd, input_ids, mcfg_empty, key=key, **kw))
    mcfg_gs0 = dataclasses.replace(mcfg, guidance_scale=0.0)
    kw_gs0 = dict(kw, uncond_input_ids=None, uncond_attention_mask=None)
    want = np.asarray(t2i_sampling.t2i_generate(
        fwd, input_ids, mcfg_gs0, key=key, **kw_gs0))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("segment_timesteps", [1, 4, 6])
def test_t2i_segmented_matches_monolithic_with_interval(segment_timesteps):
    """Windowed execution with a cfg_interval that CUTS windows (the
    boundary falls mid-window at segment 4 and 6) is bit-identical to the
    monolithic interval run — SegmentedT2IRun splits its window list at
    the interval boundaries and hands each window an on/off cfg."""
    t2i_sampling, fwd, input_ids, mcfg, kw = _t2i_setup(2.0)
    key = jax.random.key(13)
    mcfg_iv = dataclasses.replace(mcfg, cfg_interval=(1 / 6, 5 / 6))
    want = np.asarray(t2i_sampling.t2i_generate(
        fwd, input_ids, mcfg_iv, key=key, **kw))
    got = np.asarray(t2i_sampling.t2i_generate_segmented(
        fwd, input_ids, mcfg_iv, key=key,
        segment_timesteps=segment_timesteps, **kw))
    np.testing.assert_array_equal(got, want)


def test_t2i_cfg_interval_rejects_kv_cache_and_window_misuse():
    """The cached sampler captures K/V at CFG batch; a non-trivial
    interval must be rejected rather than silently mis-shaped. A bare
    run_timestep_window call cannot place the interval either."""
    t2i_sampling, fwd, input_ids, mcfg, kw = _t2i_setup(2.0)
    mcfg_iv = dataclasses.replace(mcfg, cfg_interval=(0.2, 0.8))

    def fake_capture(x):
        return x

    def fake_step(span, kv, lo):
        raise AssertionError("must not be reached")

    with pytest.raises(ValueError, match="cfg_interval"):
        t2i_sampling.t2i_generate(
            fwd, input_ids, mcfg_iv, key=jax.random.key(0),
            cache_fns=(fake_capture, fake_step), **kw)
    with pytest.raises(ValueError, match="cfg_interval"):
        t2i_sampling.run_timestep_window(
            fwd, t2i_sampling.init_carry(input_ids, mcfg_iv),
            jnp.arange(2, dtype=jnp.float32),
            jax.random.split(jax.random.key(0), 2), mcfg_iv, **kw)
    with pytest.raises(ValueError, match="cfg_interval"):
        t2i_sampling.t2i_generate(
            fwd, input_ids,
            dataclasses.replace(mcfg, cfg_interval=(0.8, 0.2)),
            key=jax.random.key(0), **kw)


def test_model_t2i_cfg_interval():
    """Model entry point plumbs cfg_interval: a mid-band interval changes
    the output vs full CFG (guidance really is being skipped) and the
    segmented run agrees with the monolithic one at the model level."""
    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    n_img = 16
    frame = np.concatenate([
        np.full((2, 6), 5),
        np.full((2, 1), 228),
        np.full((2, n_img), vl.mask_token_id),
        np.full((2, 1), 229),
    ], axis=1).astype(np.int32)
    uncond = frame.copy()
    uncond[:, :6] = 3
    kw = dict(
        uncond_input_ids=jnp.asarray(uncond), timesteps=6,
        guidance_scale=1.5, num_vq_tokens=n_img, key=jax.random.key(2),
        greedy=True,
    )
    full = np.asarray(m.t2i_generate(jnp.asarray(frame), **kw))
    iv = np.asarray(m.t2i_generate(
        jnp.asarray(frame), cfg_interval=(1 / 6, 4 / 6), **kw))
    assert iv.shape == full.shape
    seg = np.asarray(m.t2i_generate(
        jnp.asarray(frame), cfg_interval=(1 / 6, 4 / 6),
        segment_timesteps=4, **kw))
    np.testing.assert_array_equal(seg, iv)


def test_t2i_segmented_interval_without_uncond_is_moot():
    """A non-trivial cfg_interval with NO uncond rows (guidance can never
    apply) must run, not trip run_timestep_window's interval guard — the
    runner strips the moot interval from its window cfgs."""
    t2i_sampling, fwd, input_ids, mcfg, _ = _t2i_setup(0.0)
    mcfg_iv = dataclasses.replace(mcfg, guidance_scale=2.0,
                                  cfg_interval=(0.2, 0.8))
    key = jax.random.key(17)
    got = np.asarray(t2i_sampling.t2i_generate_segmented(
        fwd, input_ids, mcfg_iv, key=key, segment_timesteps=4))
    want = np.asarray(t2i_sampling.t2i_generate(
        fwd, input_ids, mcfg_iv, key=key))
    np.testing.assert_array_equal(got, want)
