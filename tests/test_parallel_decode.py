"""Confidence-parallel decoding (SemiARConfig.parallel_threshold).

Semantics contract:
  * τ > 1 can never fire (confidences are probabilities), so the sampler
    must equal the exact scheduled sampler token-for-token — this pins the
    while-loop refactor of the block step loop;
  * τ ≈ 0 commits every masked candidate on the first step of each block,
    which is exactly what the exact sampler does at steps == num_blocks;
  * anything between is bounded by the step budget and completes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel


def _model():
    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    return MMadaModel.init(jax.random.key(0), cfg, vl), vl


def test_threshold_above_one_equals_exact():
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(1), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=0.0)
    exact = m.generate(prompt, **kw)
    par = m.generate(prompt, **kw, parallel_threshold=2.0)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(par))


def test_tiny_threshold_equals_one_step_per_block():
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(2), (2, 8), 3, 200)
    one_step = m.generate(prompt, gen_length=32, steps=2, block_length=16,
                          temperature=0.0)
    par = m.generate(prompt, gen_length=32, steps=8, block_length=16,
                     temperature=0.0, parallel_threshold=1e-9)
    np.testing.assert_array_equal(np.asarray(one_step), np.asarray(par))


def test_warmup_at_or_past_spb_equals_exact():
    """parallel_warmup_steps >= steps_per_block means the threshold never
    fires, so the decode must equal the exact sampler token-for-token
    (spb = 8/2 = 4 here)."""
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(11), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=0.0)
    exact = m.generate(prompt, **kw)
    par = m.generate(prompt, **kw, parallel_threshold=1e-9,
                     parallel_warmup_steps=4)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(par))


def test_warmup_delays_threshold_commits():
    """warmup=K with a fire-always threshold: the first K steps commit the
    scheduled top-k alone (so the one-shot full-commit of warmup=0 cannot
    happen), then the block full-commits. Pin: step 0's committed count
    equals the schedule's, not the whole block."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(12), (2, 8), 3, 200)
    # spb=4, schedule = 4 commits/step. warmup=0 fire-always == one step
    # per block (existing pin); warmup=1 must DIFFER from it on the first
    # block's trajectory — prove via the no-warmup equivalence breaking.
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=0.0,
              parallel_threshold=1e-9)
    no_warm = np.asarray(m.generate(prompt, **kw))
    warm = np.asarray(m.generate(prompt, **kw, parallel_warmup_steps=1))
    one_step = np.asarray(m.generate(prompt, gen_length=32, steps=2,
                                     block_length=16, temperature=0.0))
    np.testing.assert_array_equal(no_warm, one_step)
    assert (warm != vl.mask_token_id).all()
    assert not np.array_equal(warm, no_warm), (
        "warmup=1 should change the first-commit set vs one-shot "
        "full-commit (if these ever legitimately coincide, the model is "
        "degenerate)"
    )


def test_warmup_composes_with_kv_refresh():
    """warmup + cached decode + refresh cadence all ride one while_loop."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(13), (2, 8), 3, 200)
    out = np.asarray(m.generate(
        prompt, gen_length=32, steps=8, block_length=16, temperature=0.0,
        parallel_threshold=0.5, parallel_warmup_steps=2,
        block_kv_cache=True, cache_refresh_every=2))
    assert out.shape == (2, 40)
    np.testing.assert_array_equal(out[:, :8], np.asarray(prompt))
    assert (out != vl.mask_token_id).all()


def test_midrange_threshold_completes():
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(3), (2, 8), 3, 200)
    out = np.asarray(m.generate(prompt, gen_length=32, steps=8,
                                block_length=16, temperature=0.0,
                                parallel_threshold=0.5))
    assert out.shape == (2, 40)
    np.testing.assert_array_equal(out[:, :8], np.asarray(prompt))
    assert (out != vl.mask_token_id).all()


def test_stochastic_reproducible():
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(4), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=1.0,
              parallel_threshold=0.3, key=jax.random.key(9))
    a, b = m.generate(prompt, **kw), m.generate(prompt, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_combined_with_kv_cache():
    """parallel decoding composes with the block-KV cache (the while-loop
    wraps the cached step fn); τ>1 + spb=1-equivalent check keeps it exact."""
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(5), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=2, block_length=16, temperature=0.0)
    exact = m.generate(prompt, **kw)
    both = m.generate(prompt, **kw, parallel_threshold=2.0,
                      block_kv_cache=True)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(both))


def test_cfg_threshold_equals_exact():
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(6), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=0.0,
              cfg_scale=1.5)
    exact = m.generate(prompt, **kw)
    par = m.generate(prompt, **kw, parallel_threshold=2.0)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(par))


def test_stepwise_rejects_threshold():
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(7), (1, 8), 3, 200)
    scfg_kw = dict(gen_length=16, steps=4, block_length=16, temperature=0.0)
    from mmada_tpu.sampling import text as ts

    scfg = ts.SemiARConfig(mask_id=m.vocab.mask_token_id,
                           parallel_threshold=0.5, **scfg_kw)
    with pytest.raises(ValueError, match="parallel_threshold"):
        ts.generate_stepwise(
            None, prompt, scfg,
            window_forward_fn=m._text_window_forward_fn(16),
        )


def test_mmu_fast_with_threshold():
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(8), (2, 8), 3, 200)
    kw = dict(eot_token=5, max_new_tokens=32, steps=8, block_length=16)
    exact = m.mmu_generate_fast(prompt, **kw)
    par = m.mmu_generate_fast(prompt, **kw, parallel_threshold=2.0)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(par))
