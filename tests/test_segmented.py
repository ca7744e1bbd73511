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
