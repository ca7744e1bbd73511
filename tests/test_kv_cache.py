"""Block-KV-cached semi-AR decode (Fast-dLLM-style DualCache).

Exactness contract: `forward_kv_step` on a FRESH cache must reproduce the
full forward's block logits (the cache is only ever stale for steps after
the first within a block). Hence:

  * capture+step vs full-forward block slice — numerically close;
  * `generate(block_kv_cache=True)` with steps_per_block == 1 — token-exact
    vs the uncached sampler (every step sees a fresh cache);
  * steps_per_block > 1 — approximate mode runs, fills every mask, and
    keeps the prompt intact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel


def _model(block_type="llama", n_kv_heads=None, attention_layer_norm=False):
    vl = tiny_layout()
    cfg = llada.tiny_config(
        vocab_size=vl.total_vocab_size,
        block_type=block_type,
        n_kv_heads=n_kv_heads,
        attention_layer_norm=attention_layer_norm,
    )
    return MMadaModel.init(jax.random.key(0), cfg, vl), vl


@pytest.mark.parametrize(
    "block_type,n_kv_heads,qk_norm",
    [("llama", None, False), ("llama", 2, False), ("llama", None, True),
     ("sequential", None, False)],
)
def test_kv_step_matches_full_forward(block_type, n_kv_heads, qk_norm):
    """Fresh-cache step == full forward sliced to the block, for MHA, GQA,
    q/k-norm, and the fused sequential block."""
    m, _ = _model(block_type, n_kv_heads, qk_norm)
    tokens = jax.random.randint(jax.random.key(1), (2, 48), 3, 200)
    block_start, blk = 32, 16

    full = llada.forward(m.params, m.cfg, tokens)[:, block_start:block_start + blk]

    kv = llada.forward_kv_capture(m.params, m.cfg, tokens)
    stepped = llada.forward_kv_step(
        m.params, m.cfg, tokens[:, block_start:block_start + blk], kv,
        jnp.int32(block_start),
    )
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(full), rtol=2e-4, atol=2e-4
    )


def test_kv_cache_shapes():
    m, _ = _model()
    tokens = jax.random.randint(jax.random.key(1), (2, 40), 3, 200)
    k, v = llada.forward_kv_capture(m.params, m.cfg, tokens)
    cfg = m.cfg
    expect = (cfg.n_layers, 2, cfg.effective_n_kv_heads, 40, cfg.head_dim)
    assert k.shape == expect and v.shape == expect


def test_spb1_cached_equals_uncached():
    """steps == num_blocks ⇒ one step per block ⇒ the cache is fresh at
    every step ⇒ cached sampling must match the exact sampler token-wise."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(2), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=2, block_length=16, temperature=0.0)
    exact = m.generate(prompt, **kw)
    cached = m.generate(prompt, **kw, block_kv_cache=True)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(cached))


def test_spb1_cached_equals_uncached_cfg():
    """Same with classifier-free guidance (doubled-batch capture path)."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(3), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=2, block_length=16, temperature=0.0,
              cfg_scale=1.5)
    exact = m.generate(prompt, **kw)
    cached = m.generate(prompt, **kw, block_kv_cache=True)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(cached))


def test_cached_multi_step_completes():
    """Approximate mode (steps_per_block > 1): every mask is filled and the
    prompt survives untouched."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(4), (2, 8), 3, 200)
    out = m.generate(prompt, gen_length=32, steps=8, block_length=16,
                     temperature=0.0, block_kv_cache=True)
    out = np.asarray(out)
    assert out.shape == (2, 40)
    np.testing.assert_array_equal(out[:, :8], np.asarray(prompt))
    assert (out != vl.mask_token_id).all()


def test_text_cached_refresh_exact_at_one():
    """cache_refresh_every=1 re-captures the full-sequence K/V from the
    CURRENT tokens before every step, so the cached text decode must equal
    the exact sampler token-for-token even at steps_per_block > 1 (the
    text twin of test_t2i_cached_refresh_every; the kv rides the scan
    carry through a lax.cond)."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(21), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=0.0)
    exact = m.generate(prompt, **kw)
    refreshed = m.generate(prompt, **kw, block_kv_cache=True,
                           cache_refresh_every=1)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(refreshed))


def test_text_cached_refresh_exact_at_one_cfg():
    """Same with CFG (doubled-batch recapture inside the scan body)."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(22), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=0.0,
              cfg_scale=1.5)
    exact = m.generate(prompt, **kw)
    refreshed = m.generate(prompt, **kw, block_kv_cache=True,
                           cache_refresh_every=1)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(refreshed))


def test_text_cached_refresh_cadence_completes():
    """Mid-cadence refresh (approximate, staleness bounded to N steps):
    fills every mask, keeps the prompt, and is deterministic; also runs
    under jit with the model as argument (the serving path)."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(23), (2, 8), 3, 200)
    fn = jax.jit(lambda mm, p: mm.generate(
        p, gen_length=32, steps=8, block_length=16, temperature=0.0,
        block_kv_cache=True, cache_refresh_every=2))
    out = np.asarray(fn(m, prompt))
    assert out.shape == (2, 40)
    np.testing.assert_array_equal(out[:, :8], np.asarray(prompt))
    assert (out != vl.mask_token_id).all()
    np.testing.assert_array_equal(out, np.asarray(fn(m, prompt)))


def test_text_cached_refresh_with_parallel_threshold():
    """refresh composes with confidence-parallel decoding (the while_loop
    path carries the kv): completes and keeps the prompt."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(24), (2, 8), 3, 200)
    out = np.asarray(m.generate(
        prompt, gen_length=32, steps=8, block_length=16, temperature=0.0,
        block_kv_cache=True, cache_refresh_every=2, parallel_threshold=0.9))
    assert out.shape == (2, 40)
    np.testing.assert_array_equal(out[:, :8], np.asarray(prompt))
    assert (out != vl.mask_token_id).all()


def test_text_cached_refresh_int8_cache_runs():
    """refresh + int8-quantized cache: the recaptured cache is quantized
    by the same capture fn, so the composition must run end-to-end."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(25), (2, 8), 3, 200)
    out = np.asarray(m.generate(
        prompt, gen_length=32, steps=8, block_length=16, temperature=0.0,
        block_kv_cache="int8", cache_refresh_every=2))
    assert (out != vl.mask_token_id).all()


def test_cached_stochastic_reproducible():
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(5), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=1.0,
              block_kv_cache=True, key=jax.random.key(7))
    a, b = m.generate(prompt, **kw), m.generate(prompt, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mmu_generate_fast_cached():
    """Early-stop runner with kv_cached=True: jitted block path, spb=1
    exactness vs the uncached early-stop runner."""
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(6), (2, 8), 3, 200)
    kw = dict(eot_token=5, max_new_tokens=32, steps=2, block_length=16)
    exact = m.mmu_generate_fast(prompt, **kw)
    cached = m.mmu_generate_fast(prompt, **kw, block_kv_cache=True)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(cached))


def test_stepwise_cached_final_equals_generate():
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(8), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=0.0,
              block_kv_cache=True)
    traj = m.generate_stepwise(prompt, **kw)
    out = m.generate(prompt, **kw)
    assert traj.shape[0] == 8
    np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(out))


def test_quantized_cached_runs():
    """int8 weight-only params through capture + step (maybe_matmul path)."""
    from mmada_tpu.ops.quantization import quantize_llada_params

    m, vl = _model()
    qparams = quantize_llada_params(m.params)
    qm = MMadaModel(cfg=m.cfg, params=qparams, vocab=m.vocab)
    prompt = jax.random.randint(jax.random.key(9), (2, 8), 3, 200)
    out = qm.generate(prompt, gen_length=32, steps=4, block_length=16,
                      temperature=0.0, block_kv_cache=True)
    assert np.asarray(out).shape == (2, 40)


def _t2i_frame(m, vl, b=2, prompt_len=6, n=16):
    key = jax.random.key(11)
    soi, eoi = vl.special("<|soi|>"), vl.special("<|eoi|>")
    prompt = jax.random.randint(key, (b, prompt_len), 3, 200)
    frame = jnp.concatenate([
        prompt,
        jnp.full((b, 1), soi),
        jnp.full((b, n), vl.mask_token_id),
        jnp.full((b, 1), eoi),
    ], axis=1).astype(jnp.int32)
    uncond = frame.at[:, :prompt_len].set(vl.pad_token_id)
    return frame, uncond


def test_t2i_cached_single_step_exact():
    """timesteps=1 ⇒ the cache is fresh for the only step ⇒ cached t2i
    must match the exact sampler token-wise (greedy), with and without CFG."""
    m, vl = _model()
    frame, uncond = _t2i_frame(m, vl)
    for gs in (0.0, 2.0):
        kw = dict(uncond_input_ids=uncond if gs else None, timesteps=1,
                  guidance_scale=gs, temperature=0.0, num_vq_tokens=16,
                  greedy=True, key=jax.random.key(12))
        exact = m.t2i_generate(frame, **kw)
        cached = m.t2i_generate(frame, **kw, block_kv_cache=True)
        np.testing.assert_array_equal(np.asarray(exact), np.asarray(cached))


def test_t2i_cached_multi_step():
    m, vl = _model()
    frame, uncond = _t2i_frame(m, vl)
    out = m.t2i_generate(
        frame, uncond_input_ids=uncond, timesteps=4, guidance_scale=1.5,
        temperature=0.0, num_vq_tokens=16, greedy=True,
        key=jax.random.key(13), block_kv_cache=True,
    )
    out = np.asarray(out)
    assert out.shape == (2, 16)
    assert ((out >= 0) & (out < vl.image_codebook_size)).all()


def test_t2m_cached_single_step_exact():
    vl = tiny_layout().with_motion(codebook_size=32)
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    som, eom = vl.special("<|som|>"), vl.special("<|eom|>")
    n, b = 8, 2
    prompt = jax.random.randint(jax.random.key(14), (b, 6), 3, 200)
    frame = jnp.concatenate([
        prompt, jnp.full((b, 1), som),
        jnp.full((b, n), vl.mask_token_id),
        jnp.full((b, 1), eom),
    ], axis=1).astype(jnp.int32)
    kw = dict(timesteps=1, temperature=0.0, num_motion_tokens=n,
              greedy=True, key=jax.random.key(15))
    exact = m.t2m_generate(frame, **kw)
    cached = m.t2m_generate(frame, **kw, block_kv_cache=True)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(cached))


def test_int8_cache_close_to_fp32_cache():
    """Quantized (int8) cache: step logits stay close to the full-precision
    cache's (per-head-vector scales bound the error), and the cache leaves
    really are int8 at half the bytes."""
    m, _ = _model()
    tokens = jax.random.randint(jax.random.key(30), (2, 48), 3, 200)
    block_start, blk = 32, 16

    kv = llada.forward_kv_capture(m.params, m.cfg, tokens)
    kv8 = llada.forward_kv_capture(m.params, m.cfg, tokens,
                                   cache_dtype="int8")
    assert kv8[0][0].dtype == jnp.int8 and kv8[1][0].dtype == jnp.int8
    assert kv8[0][0].nbytes * 4 == kv[0].nbytes  # fp32 ref -> 4x bytes

    ref = llada.forward_kv_step(
        m.params, m.cfg, tokens[:, block_start:block_start + blk], kv,
        jnp.int32(block_start),
    )
    got = llada.forward_kv_step(
        m.params, m.cfg, tokens[:, block_start:block_start + blk], kv8,
        jnp.int32(block_start),
    )
    ref, got = np.asarray(ref), np.asarray(got)
    # int8 K/V perturbs logits slightly; argmax should essentially agree
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.95, f"int8-cache argmax agreement {agree:.3f}"
    denom = np.abs(ref).mean()
    assert np.abs(ref - got).mean() / denom < 0.05


def test_int8_cache_generate_completes():
    m, vl = _model()
    prompt = jax.random.randint(jax.random.key(31), (2, 8), 3, 200)
    out = np.asarray(m.generate(prompt, gen_length=32, steps=8,
                                block_length=16, temperature=0.0,
                                block_kv_cache="int8"))
    assert out.shape == (2, 40)
    np.testing.assert_array_equal(out[:, :8], np.asarray(prompt))
    assert (out != vl.mask_token_id).all()


def test_int8_cache_t2i_completes():
    m, vl = _model()
    frame, uncond = _t2i_frame(m, vl)
    out = np.asarray(m.t2i_generate(
        frame, uncond_input_ids=uncond, timesteps=4, guidance_scale=1.5,
        temperature=0.0, num_vq_tokens=16, greedy=True,
        key=jax.random.key(32), block_kv_cache="int8",
    ))
    assert out.shape == (2, 16)
    assert ((out >= 0) & (out < vl.image_codebook_size)).all()


def test_engine_cached_settings():
    """ServingEngine routes block_kv_cache settings through its jitted
    executors (text spb=1 path must match the exact engine result)."""
    from mmada_tpu.serve.engine import ServingEngine, TextSettings

    m, vl = _model()
    eng = ServingEngine(m, max_batch=2, max_wait_ms=1.0).start()
    try:
        prompt = np.asarray(
            jax.random.randint(jax.random.key(20), (8,), 3, 200))
        base = dict(gen_length=32, steps=2, block_length=16, temperature=0.0)
        exact = eng.submit_text(
            prompt, TextSettings(**base), seed=0).result()
        cached = eng.submit_text(
            prompt, TextSettings(**base, block_kv_cache=True), seed=0
        ).result()
        np.testing.assert_array_equal(np.asarray(exact), np.asarray(cached))
    finally:
        eng.stop()


def test_cached_agreement_with_exact():
    """Approximate mode should still mostly agree with the exact sampler at
    T=0 on the generated span (staleness only spans within-block steps)."""
    m, _ = _model()
    prompt = jax.random.randint(jax.random.key(10), (2, 8), 3, 200)
    kw = dict(gen_length=32, steps=8, block_length=16, temperature=0.0)
    exact = np.asarray(m.generate(prompt, **kw))[:, 8:]
    cached = np.asarray(m.generate(prompt, **kw, block_kv_cache=True))[:, 8:]
    agreement = (exact == cached).mean()
    assert agreement >= 0.5, f"agreement {agreement:.2f} suspiciously low"


def test_t2i_cached_refresh_every():
    """cache_refresh_every re-captures mid-sampling (kv rides the scan
    carry through a lax.cond); refresh=1 recaptures EVERY step, making
    the decode exact vs the uncached sampler at any timestep count."""
    m, vl = _model()
    frame, uncond = _t2i_frame(m, vl)
    kw = dict(uncond_input_ids=uncond, timesteps=4, guidance_scale=1.5,
              temperature=0.0, num_vq_tokens=16, greedy=True,
              key=jax.random.key(40))
    exact = m.t2i_generate(frame, **kw)
    refreshed = m.t2i_generate(frame, **kw, block_kv_cache=True,
                               cache_refresh_every=1)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(refreshed))
    # and a mid-cadence run completes with valid codes
    out = np.asarray(m.t2i_generate(frame, **kw, block_kv_cache=True,
                                    cache_refresh_every=2))
    assert ((out >= 0) & (out < vl.image_codebook_size)).all()


def test_t2m_cached_refresh_exact_at_one():
    """Motion refresh=1 re-captures before every step -> cached t2m must
    equal the uncached sampler token-exactly (the same pin the t2i
    refresh path has; guards the independently-plumbed motion cond)."""
    vl = tiny_layout().with_motion(codebook_size=32)
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    som, eom = vl.special("<|som|>"), vl.special("<|eom|>")
    n, b = 8, 2
    prompt = jax.random.randint(jax.random.key(52), (b, 6), 3, 200)
    frame = jnp.concatenate([
        prompt, jnp.full((b, 1), som),
        jnp.full((b, n), vl.mask_token_id),
        jnp.full((b, 1), eom),
    ], axis=1).astype(jnp.int32)
    kw = dict(timesteps=4, temperature=0.0, num_motion_tokens=n,
              greedy=True, key=jax.random.key(53))
    exact = m.t2m_generate(frame, **kw)
    refreshed = m.t2m_generate(frame, **kw, block_kv_cache=True,
                               cache_refresh_every=1)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(refreshed))


def test_t2m_cached_refresh_runs():
    vl = tiny_layout().with_motion(codebook_size=32)
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    som, eom = vl.special("<|som|>"), vl.special("<|eom|>")
    n, b = 8, 2
    prompt = jax.random.randint(jax.random.key(50), (b, 6), 3, 200)
    frame = jnp.concatenate([
        prompt, jnp.full((b, 1), som),
        jnp.full((b, n), vl.mask_token_id),
        jnp.full((b, 1), eom),
    ], axis=1).astype(jnp.int32)
    out = np.asarray(m.t2m_generate(
        frame, timesteps=4, temperature=0.0, num_motion_tokens=n,
        greedy=True, key=jax.random.key(51), block_kv_cache=True,
        cache_refresh_every=2,
    ))
    assert out.shape == (b, n)
    assert ((out >= 0) & (out < vl.motion_codebook_size)).all()


def test_engine_stochastic_per_row_keys_with_cache():
    """Per-row-key stochastic batching composes with the cached decode
    (vmap over the cached generate): each row's output is bit-identical
    to its solo run regardless of batch composition."""
    from mmada_tpu.serve.engine import TextSettings, _jit_text_per_row_keys

    m, _ = _model()
    settings = TextSettings(gen_length=16, steps=4, block_length=8,
                            temperature=1.0, block_kv_cache=True)
    prompt = np.asarray(jax.random.randint(jax.random.key(60), (8,), 3, 200))

    def keys(seeds):
        return jax.vmap(jax.random.key)(jnp.asarray(seeds, jnp.uint32))

    solo = np.asarray(_jit_text_per_row_keys(
        m, jnp.asarray(prompt)[None], settings, keys([7])))[0]
    batch = np.asarray(_jit_text_per_row_keys(
        m, jnp.repeat(jnp.asarray(prompt)[None], 4, 0), settings,
        keys([3, 7, 11, 13])))
    np.testing.assert_array_equal(batch[1], solo)
