"""Serving engine tests: batching, correctness vs direct calls, stats."""

import dataclasses
import time

import jax
import numpy as np
import pytest

from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.serve.engine import ServingEngine, T2ISettings, TextSettings

VOCAB = tiny_layout(text_vocab_size=256, image_codebook_size=64)


@pytest.fixture(scope="module")
def model():
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=32, n_heads=2, n_layers=2,
        mlp_hidden_size=64,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    params = llada.init_params(jax.random.key(0), cfg)
    return MMadaModel(cfg=cfg, params=params, vocab=VOCAB)


def test_text_batching_matches_direct(model):
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=50).start()
    try:
        settings = TextSettings(gen_length=8, steps=4, block_length=8)
        rng = np.random.default_rng(0)
        prompts = [rng.integers(3, 200, size=(6,)) for _ in range(4)]
        futures = [engine.submit_text(p, settings) for p in prompts]
        outs = [f.result(timeout=120) for f in futures]
        # batching must not change results (deterministic T=0):
        # independent batches give the same tokens as the batched run
        import jax.numpy as jnp

        direct = np.asarray(
            model.generate(
                jnp.asarray(np.stack(prompts)),
                gen_length=8, steps=4, block_length=8, temperature=0.0,
            )
        )
        for got, want in zip(outs, direct):
            np.testing.assert_array_equal(got, want)
        assert engine.stats["requests"] == 4
        assert engine.stats["batches"] <= 2  # actually batched
    finally:
        engine.stop()


def test_t2i_requests(model):
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=30).start()
    try:
        n_img = 16
        sp_soi, sp_eoi = 280, 281
        frame = np.concatenate([
            np.full(6, 5), [sp_soi], np.full(n_img, VOCAB.mask_token_id), [sp_eoi]
        ]).astype(np.int64)
        uncond = frame.copy()
        uncond[:6] = VOCAB.pad_token_id
        settings = T2ISettings(timesteps=3, guidance_scale=1.5, num_vq_tokens=n_img)
        futs = [engine.submit_t2i(frame, uncond, settings, seed=i) for i in range(3)]
        outs = [f.result(timeout=120) for f in futs]
        for out in outs:
            assert out.shape == (n_img,)
            assert out.min() >= 0 and out.max() < VOCAB.image_codebook_size
    finally:
        engine.stop()


def test_stochastic_seed_reproducibility(model):
    """Stochastic text batches use one PRNG key per row, so every request
    reproduces a direct single-request run with its seed BIT-EXACTLY, no
    matter what was batched alongside it — and the requests still share a
    device batch (the 2.2x text-serving win)."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=50).start()
    try:
        settings = TextSettings(
            gen_length=8, steps=4, block_length=8, temperature=1.0
        )
        prompt = np.arange(3, 9)
        futs = [engine.submit_text(prompt, settings, seed=s) for s in (0, 1, 2)]
        outs = [f.result(timeout=120) for f in futs]
        for seed, got in zip((0, 1, 2), outs):
            want = np.asarray(
                model.generate(
                    jnp.asarray(prompt)[None],
                    gen_length=8, steps=4, block_length=8, temperature=1.0,
                    key=jax.random.key(seed),
                )
            )[0]
            np.testing.assert_array_equal(got, want)
        # distinct seeds DO batch (per-row keys make it safe)
        assert engine.stats["batches"] < 3
        # same seed + same prompt → identical result, in-flight together
        f1 = engine.submit_text(prompt, settings, seed=7)
        f2 = engine.submit_text(prompt, settings, seed=7)
        np.testing.assert_array_equal(f1.result(120), f2.result(120))
    finally:
        engine.stop()


def test_random_remasking_needs_key_and_reproduces(model):
    """remasking='random' is stochastic even at temperature 0: the engine
    must route it through the per-row-key path (a keyless run would raise),
    and the same seed must reproduce."""
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=30).start()
    try:
        settings = TextSettings(
            gen_length=8, steps=4, block_length=8,
            temperature=0.0, remasking="random",
        )
        assert settings.stochastic
        prompt = np.arange(3, 9)
        f1 = engine.submit_text(prompt, settings, seed=11)
        f2 = engine.submit_text(prompt, settings, seed=11)
        r1, r2 = f1.result(120), f2.result(120)
        np.testing.assert_array_equal(r1, r2)
        assert r1.shape == (14,)
    finally:
        engine.stop()


def test_stop_drains_queued_futures(model):
    """stop() must resolve still-queued requests with an exception rather
    than leaving callers hanging on result()."""
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=10)
    # never started: submissions sit in the queue forever
    settings = TextSettings(gen_length=8, steps=4, block_length=8)
    fut = engine.submit_text(np.full(6, 9), settings)
    engine.stop()
    with pytest.raises(RuntimeError, match="engine stopped"):
        fut.result(timeout=5)


def test_queue_full_backpressure(model):
    """Submissions beyond max_queue resolve immediately with a backpressure
    error instead of accumulating unbounded memory."""
    engine = ServingEngine(model, min_chunk_device_ms=0, max_queue=2)  # not started: queue fills
    settings = TextSettings(gen_length=8, steps=4, block_length=8)
    futs = [engine.submit_text(np.full(6, 9), settings) for _ in range(4)]
    overflowed = [f for f in futs if f.done() and f.exception() is not None]
    assert len(overflowed) == 2
    assert "backpressure" in str(overflowed[0].exception())
    engine.stop()


def test_engine_with_quantized_model(model):
    """The engine's jitted entry points work over int8-quantized params
    (QuantizedTensor leaves ride the MMadaModel pytree through jit)."""
    import dataclasses as _dc

    from mmada_tpu.ops.quantization import quantize_llada_params

    qmodel = _dc.replace(
        model, params=quantize_llada_params(model.params)
    )
    engine = ServingEngine(qmodel, min_chunk_device_ms=0, max_wait_ms=30).start()
    try:
        settings = TextSettings(gen_length=8, steps=4, block_length=8)
        out = engine.submit_text(np.arange(3, 9), settings).result(120)
        assert out.shape == (14,)
        assert (out[:6] == np.arange(3, 9)).all()
    finally:
        engine.stop()


def test_mixed_kinds_and_lengths(model):
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=30).start()
    try:
        settings = TextSettings(gen_length=8, steps=4, block_length=8)
        f1 = engine.submit_text(np.full(6, 9), settings)
        f2 = engine.submit_text(np.full(10, 9), settings)  # different length
        r1, r2 = f1.result(120), f2.result(120)
        assert r1.shape == (14,) and r2.shape == (18,)
    finally:
        engine.stop()


def test_t2i_with_masks_matches_direct(model):
    """submit_t2i carries attention masks (the app's t2i path routes
    through the engine); greedy engine output matches the direct call."""
    import dataclasses as _dc

    import jax.numpy as jnp

    # masks only matter with attention_bias_enabled; flip it on so the
    # plumbing is actually load-bearing in this test
    cfg = _dc.replace(model.cfg, attention_bias_enabled=True)
    m = MMadaModel(cfg=cfg, params=model.params, vocab=model.vocab)
    engine = ServingEngine(m, min_chunk_device_ms=0, max_wait_ms=30).start()
    try:
        n_img = 16
        frame = np.concatenate([
            np.full(6, 5), [280], np.full(n_img, VOCAB.mask_token_id), [281]
        ]).astype(np.int64)
        uncond = frame.copy()
        uncond[:6] = VOCAB.pad_token_id
        attn = np.ones_like(frame)
        attn[:2] = 0  # padded prefix
        uattn = np.ones_like(uncond)
        settings = T2ISettings(
            timesteps=3, guidance_scale=1.5, temperature=0.0,
            num_vq_tokens=n_img,
        )
        fut = engine.submit_t2i(
            frame, uncond, settings, seed=7,
            attention_mask=attn, uncond_attention_mask=uattn,
        )
        got = fut.result(timeout=120)
        want = np.asarray(
            m.t2i_generate(
                jnp.asarray(frame)[None],
                uncond_input_ids=jnp.asarray(uncond)[None],
                attention_mask=jnp.asarray(attn)[None],
                uncond_attention_mask=jnp.asarray(uattn)[None],
                temperature=0.0, timesteps=3, guidance_scale=1.5,
                num_vq_tokens=n_img, key=jax.random.key(7),
            )
        )[0]
        np.testing.assert_array_equal(got, want)

        # masks must change the result when bias is enabled (load-bearing)
        fut2 = engine.submit_t2i(frame, uncond, settings, seed=7)
        assert not np.array_equal(fut2.result(timeout=120), got)
    finally:
        engine.stop()


def test_engine_serves_mesh_sharded_model(model):
    """The serving engine works with a mesh-attached FSDP+TP-sharded model
    (the production multi-chip serving path): batched text results match
    the unsharded direct call."""
    import jax.numpy as jnp

    from mmada_tpu.core.mesh import make_mesh
    from mmada_tpu.parallel import sharding

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    # module-scope fixture model has 2 heads; tensor=2 divides it
    params_sh = sharding.shard_params(
        model.params, sharding.llada_param_specs(model.cfg), mesh
    )
    import dataclasses as _dc

    model_sh = _dc.replace(model, params=params_sh, mesh=mesh)
    engine = ServingEngine(model_sh, min_chunk_device_ms=0, max_wait_ms=50).start()
    try:
        settings = TextSettings(gen_length=8, steps=4, block_length=8)
        prompts = [np.arange(3, 9) + i for i in range(4)]
        futs = [engine.submit_text(p, settings) for p in prompts]
        outs = [f.result(timeout=180) for f in futs]
        direct = np.asarray(
            model.generate(
                jnp.asarray(np.stack(prompts)),
                gen_length=8, steps=4, block_length=8, temperature=0.0,
            )
        )
        for got, want in zip(outs, direct):
            np.testing.assert_array_equal(got, want)
    finally:
        engine.stop()


def test_loader_serves_sharded_by_default():
    """With >1 visible device (conftest forces 8), build_model attaches a
    serving mesh and FSDP-shards the params; parallel.serving=none opts
    out (the reference has no multi-device serving at all)."""
    from mmada_tpu.core.config import load_config
    from mmada_tpu.serve.loader import build_model, build_vocab

    cfg = load_config("configs/tiny_test.yaml")
    vocab = build_vocab(cfg)
    m = build_model(cfg, vocab)
    assert m.mesh is not None and dict(m.mesh.shape)["fsdp"] == 8
    # at least one leaf actually sharded (most tiny dims fall back, but
    # the 320-row embedding divides 8)
    shardings = {
        str(getattr(leaf, "sharding", None))
        for leaf in jax.tree.leaves(m.params)
    }
    assert any("fsdp" in s for s in shardings), shardings

    cfg2 = load_config("configs/tiny_test.yaml",
                       overrides=["parallel.serving=none"])
    m2 = build_model(cfg2, build_vocab(cfg2))
    assert m2.mesh is None


def test_chunked_matches_monolithic(model):
    """segment_steps>0 routes through the chunked dispatcher
    (_step_active); tokens equal the monolithic program's exactly and the
    chunk counter proves the request really ran as multiple programs."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=30).start()
    try:
        settings = TextSettings(
            gen_length=16, steps=8, block_length=8, segment_steps=2,
        )
        rng = np.random.default_rng(3)
        prompts = [rng.integers(3, 200, size=(6,)) for _ in range(3)]
        futs = [engine.submit_text(p, settings) for p in prompts]
        outs = [f.result(timeout=120) for f in futs]
        direct = np.asarray(
            model.generate(
                jnp.asarray(np.stack(prompts)),
                gen_length=16, steps=8, block_length=8, temperature=0.0,
            )
        )
        for got, want in zip(outs, direct):
            np.testing.assert_array_equal(got, want)
        # 2 blocks x ceil(4/2) chunks = 4 chunks for the batched group
        assert engine.stats["chunks"] >= 4
    finally:
        engine.stop()


def test_chunked_stochastic_per_row_seed_exact(model):
    """Chunked stochastic batches keep the per-row-key contract: each
    request is bit-identical to its solo `generate(key=seed)` run."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=50).start()
    try:
        settings = TextSettings(
            gen_length=8, steps=4, block_length=8, temperature=1.0,
            segment_steps=1,
        )
        prompt = np.arange(3, 9)
        futs = [engine.submit_text(prompt, settings, seed=s) for s in (0, 5)]
        outs = [f.result(timeout=120) for f in futs]
        for seed, got in zip((0, 5), outs):
            want = np.asarray(
                model.generate(
                    jnp.asarray(prompt)[None],
                    gen_length=8, steps=4, block_length=8, temperature=1.0,
                    key=jax.random.key(seed),
                )
            )[0]
            np.testing.assert_array_equal(got, want)
    finally:
        engine.stop()


def test_chunked_no_head_of_line_blocking(model):
    """A heavy chunked generation must NOT make a later short request wait
    out its full duration: the short one overtakes it at a chunk boundary.
    (With a monolithic heavy program the short request always finishes
    last — that inversion is the scheduling win.)"""
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    try:
        long_settings = TextSettings(
            gen_length=32, steps=32, block_length=8, segment_steps=1,
        )  # 4 blocks x 8 chunks = 32 device programs
        short_settings = TextSettings(
            gen_length=8, steps=2, block_length=8, segment_steps=1,
        )  # 2 chunks
        done_at = {}
        f_long = engine.submit_text(np.arange(3, 9), long_settings)
        f_long.add_done_callback(lambda f: done_at.setdefault("long", time.time()))
        # let the long task enter the active set before the short arrives
        deadline = time.time() + 30
        while engine.stats["chunks"] < 1 and time.time() < deadline:
            time.sleep(0.01)
        f_short = engine.submit_text(np.arange(3, 9), short_settings)
        f_short.add_done_callback(lambda f: done_at.setdefault("short", time.time()))
        f_long.result(timeout=240)
        f_short.result(timeout=240)
        assert done_at["short"] < done_at["long"], done_at
    finally:
        engine.stop()


def test_chunked_rejects_kv_cache(model):
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    try:
        settings = TextSettings(
            gen_length=8, steps=4, block_length=8, segment_steps=2,
            block_kv_cache=True,
        )
        f = engine.submit_text(np.arange(3, 9), settings)
        with pytest.raises(ValueError, match="exact-sampler only"):
            f.result(timeout=120)
    finally:
        engine.stop()


def test_stop_resolves_active_chunked_tasks(model):
    """stop() with chunked work in flight must leave no hanging future:
    every submitted request is resolved (result or 'engine stopped')."""
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    settings = TextSettings(
        gen_length=32, steps=32, block_length=8, segment_steps=1,
    )
    f = engine.submit_text(np.arange(3, 9), settings)
    engine.stop()
    try:
        f.result(timeout=60)
    except RuntimeError as e:
        assert "engine stopped" in str(e)


def test_stream_join_mid_flight(model):
    """Continuous batching: a same-settings request submitted while a
    stream is mid-generation JOINS it at a chunk boundary (stream_joins
    counter) and both results are exact vs solo runs — per-row block
    progress keeps the mixed batch correct."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    try:
        settings = TextSettings(
            gen_length=32, steps=16, block_length=8, segment_steps=1,
        )  # 4 blocks x 4 chunks = 16 chunk programs per request
        pa = np.arange(3, 9)
        pb = np.arange(10, 16)
        fa = engine.submit_text(pa, settings)
        deadline = time.time() + 60
        while engine.stats["chunks"] < 2 and time.time() < deadline:
            time.sleep(0.01)
        fb = engine.submit_text(pb, settings)
        ra, rb = fa.result(timeout=240), fb.result(timeout=240)
        assert engine.stats["stream_joins"] >= 1
        for prompt, got in ((pa, ra), (pb, rb)):
            want = np.asarray(
                model.generate(
                    jnp.asarray(prompt)[None],
                    gen_length=32, steps=16, block_length=8,
                    temperature=0.0,
                )
            )[0]
            np.testing.assert_array_equal(got, want)
    finally:
        engine.stop()


def test_stream_join_stochastic_seed_exact(model):
    """A stochastic joiner keeps per-row seed bit-exactness even though
    it shares chunk programs with rows at different block offsets."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    try:
        settings = TextSettings(
            gen_length=16, steps=8, block_length=8, temperature=1.0,
            segment_steps=1,
        )
        prompt = np.arange(3, 9)
        f1 = engine.submit_text(prompt, settings, seed=3)
        deadline = time.time() + 60
        while engine.stats["chunks"] < 1 and time.time() < deadline:
            time.sleep(0.01)
        f2 = engine.submit_text(prompt, settings, seed=9)
        outs = {3: f1.result(timeout=240), 9: f2.result(timeout=240)}
        for seed, got in outs.items():
            want = np.asarray(
                model.generate(
                    jnp.asarray(prompt)[None],
                    gen_length=16, steps=8, block_length=8,
                    temperature=1.0, key=jax.random.key(seed),
                )
            )[0]
            np.testing.assert_array_equal(got, want)
    finally:
        engine.stop()


def test_stream_padding_chunk_is_noop(model):
    """segment_steps that does NOT divide steps_per_block forces trailing
    zero-transfer padding steps in every block — output must still be
    exact (the no-op guarantee the stream design rests on)."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    try:
        settings = TextSettings(
            gen_length=16, steps=8, block_length=8, segment_steps=3,
        )  # spb=4 -> chunks of 3 + 1-step padded window
        prompt = np.arange(3, 9)
        got = engine.submit_text(prompt, settings).result(timeout=240)
        want = np.asarray(
            model.generate(
                jnp.asarray(prompt)[None],
                gen_length=16, steps=8, block_length=8, temperature=0.0,
            )
        )[0]
        np.testing.assert_array_equal(got, want)
    finally:
        engine.stop()


def test_stream_bucket_growth_and_overflow(model):
    """6 staggered same-settings requests against max_batch=4: the first
    stream grows 1 -> 2 -> 4 slots as joiners arrive (one executable per
    bucket), and joiners beyond max_batch start a SECOND stream instead of
    being dropped. Every output stays exact vs the batched direct run."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_batch=4, max_wait_ms=1).start()
    try:
        settings = TextSettings(
            gen_length=16, steps=16, block_length=8, segment_steps=1,
        )  # 2 blocks x 8 chunks — long enough to join mid-flight
        prompts = [np.arange(3, 9) + i for i in range(6)]
        futs = []
        for i, p in enumerate(prompts):
            futs.append(engine.submit_text(p, settings))
            # space arrivals so each lands mid-flight, not in one batch
            deadline = time.time() + 30
            want_chunks = (i + 1) * 2
            while (engine.stats["chunks"] < want_chunks
                   and time.time() < deadline):
                time.sleep(0.005)
        outs = [f.result(timeout=240) for f in futs]
        direct = np.asarray(
            model.generate(
                jnp.asarray(np.stack(prompts)),
                gen_length=16, steps=16, block_length=8, temperature=0.0,
            )
        )
        for got, want in zip(outs, direct):
            np.testing.assert_array_equal(got, want)
        assert engine.stats["stream_joins"] >= 1
    finally:
        engine.stop()


def test_stream_on_mesh_sharded_model(model):
    """Chunked/continuous-batching decode against an FSDP+TP-sharded
    model: the per-row chunk programs compile under GSPMD and outputs
    match the unsharded monolithic sampler."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from mmada_tpu.core.mesh import make_mesh
    from mmada_tpu.parallel import sharding

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    params_sh = sharding.shard_params(
        model.params, sharding.llada_param_specs(model.cfg), mesh
    )
    model_sh = _dc.replace(model, params=params_sh, mesh=mesh)
    engine = ServingEngine(model_sh, min_chunk_device_ms=0, max_wait_ms=30).start()
    try:
        settings = TextSettings(
            gen_length=8, steps=4, block_length=8, segment_steps=2,
        )
        prompts = [np.arange(3, 9), np.arange(4, 10)]
        futs = [engine.submit_text(p, settings) for p in prompts]
        outs = [f.result(timeout=240) for f in futs]
        direct = np.asarray(
            model.generate(
                jnp.asarray(np.stack(prompts)),
                gen_length=8, steps=4, block_length=8, temperature=0.0,
            )
        )
        for got, want in zip(outs, direct):
            np.testing.assert_array_equal(got, want)
        assert engine.stats["chunks"] >= 2
    finally:
        engine.stop()


def test_stream_stochastic_nondividing_segment(model):
    """Stochastic + segment_steps NOT dividing steps_per_block: exercises
    the typed-key padding concatenation in _Stream.join and padded per-row
    key windows — per-seed outputs must stay bit-exact vs solo runs."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=30).start()
    try:
        settings = TextSettings(
            gen_length=16, steps=8, block_length=8, temperature=1.0,
            segment_steps=3,
        )  # spb=4 -> windows of 3 + 1 padded no-op step
        prompt = np.arange(3, 9)
        futs = [engine.submit_text(prompt, settings, seed=s) for s in (2, 8)]
        for seed, f in zip((2, 8), futs):
            want = np.asarray(
                model.generate(
                    jnp.asarray(prompt)[None],
                    gen_length=16, steps=8, block_length=8,
                    temperature=1.0, key=jax.random.key(seed),
                )
            )[0]
            np.testing.assert_array_equal(f.result(timeout=240), want)
    finally:
        engine.stop()


def test_chunked_warmup_parallel_matches_monolithic(model):
    """The chunked stream threads parallel_warmup_steps AND per-row step
    offsets into the chunk runner: outputs must equal the direct sampler
    with the same (tau, warmup) — the review-found gap where the engine
    silently dropped warmup (and would re-suppress tau per chunk)."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=30).start()
    try:
        settings = TextSettings(
            gen_length=16, steps=8, block_length=8, segment_steps=1,
            parallel_threshold=0.5, parallel_warmup_steps=2,
        )
        rng = np.random.default_rng(5)
        prompts = [rng.integers(3, 200, size=(6,)) for _ in range(2)]
        futs = [engine.submit_text(p, settings) for p in prompts]
        outs = [f.result(timeout=240) for f in futs]
        for p, got in zip(prompts, outs):
            want = np.asarray(model.generate(
                jnp.asarray(p)[None], gen_length=16, steps=8,
                block_length=8, temperature=0.0,
                parallel_threshold=0.5, parallel_warmup_steps=2,
            ))[0]
            np.testing.assert_array_equal(got, want)
    finally:
        engine.stop()


def test_stream_rejects_invalid_shape(model):
    """Chunked requests get the SAME shape validation as the monolithic
    sampler: gen_length not divisible by block_length must fail the
    future, not silently return truncated output with mask residue."""
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    try:
        bad = TextSettings(
            gen_length=12, steps=4, block_length=8, segment_steps=2,
        )
        f = engine.submit_text(np.arange(3, 9), bad)
        with pytest.raises(ValueError, match="divisible"):
            f.result(timeout=120)
    finally:
        engine.stop()


def test_engine_stress_mixed_workload(model):
    """Chaos drive for the dispatcher: 24 concurrent requests mixing
    monolithic/chunked, deterministic/stochastic, two shapes and several
    seeds, submitted from 4 threads with jittered timing. Every future
    must resolve with the solo-run-exact tokens — no hangs, no drops,
    no cross-request contamination."""
    import threading

    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_batch=4, max_wait_ms=5).start()
    variants = [
        TextSettings(gen_length=16, steps=8, block_length=8),
        TextSettings(gen_length=16, steps=8, block_length=8,
                     segment_steps=2),
        TextSettings(gen_length=8, steps=4, block_length=8,
                     temperature=1.0, segment_steps=1),
        TextSettings(gen_length=8, steps=4, block_length=8,
                     temperature=1.0),
    ]
    rng = np.random.default_rng(42)
    jobs = []   # (prompt, settings, seed, future)
    lock = threading.Lock()

    def submitter(tid):
        r = np.random.default_rng(tid)
        for k in range(6):
            s = variants[(tid + k) % len(variants)]
            prompt = np.asarray(r.integers(3, 200, size=(6,)), np.int32)
            seed = int(r.integers(0, 5))
            f = engine.submit_text(prompt, s, seed=seed)
            with lock:
                jobs.append((prompt, s, seed, f))
            time.sleep(float(r.random()) * 0.02)

    threads = [threading.Thread(target=submitter, args=(t,))
               for t in range(4)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for prompt, s, seed, f in jobs:
            got = f.result(timeout=300)
            want = np.asarray(
                model.generate(
                    jnp.asarray(prompt)[None],
                    gen_length=s.gen_length, steps=s.steps,
                    block_length=s.block_length,
                    temperature=s.temperature,
                    key=(jax.random.key(seed) if s.stochastic else None),
                )
            )[0]
            np.testing.assert_array_equal(got, want)
        assert len(jobs) == 24
    finally:
        engine.stop()


def test_t2i_chunked_matches_direct(model):
    """segment_timesteps routes t2i through the chunked dispatcher
    (_T2ITask) and must reproduce the monolithic engine result exactly
    (same solo batch key), while a text request submitted behind the
    multi-window t2i overtakes it."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    try:
        n_img = 16
        frame = np.concatenate([
            np.full(6, 5), [280], np.full(n_img, VOCAB.mask_token_id), [281]
        ]).astype(np.int64)
        uncond = frame.copy()
        uncond[:6] = VOCAB.pad_token_id
        mono = T2ISettings(timesteps=6, guidance_scale=1.5,
                           num_vq_tokens=n_img)
        chunked = dataclasses.replace(mono, segment_timesteps=1)

        want = engine.submit_t2i(frame, uncond, mono, seed=3).result(240)
        order = []
        # submitted back-to-back: the dispatcher admits the chunked t2i
        # as an active task, then runs the text group inline BETWEEN its
        # windows — so the text always finishes first, even though the
        # t2i was submitted earlier
        f_img = engine.submit_t2i(frame, uncond, chunked, seed=3)
        f_img.add_done_callback(lambda f: order.append("t2i"))
        f_txt = engine.submit_text(
            np.arange(3, 9),
            TextSettings(gen_length=8, steps=2, block_length=8),
        )
        f_txt.add_done_callback(lambda f: order.append("text"))
        got = f_img.result(timeout=240)
        f_txt.result(timeout=240)
        time.sleep(0.05)
        np.testing.assert_array_equal(got, want)
        assert order == ["text", "t2i"], order
    finally:
        engine.stop()


def test_t2i_chunked_rejects_kv_cache(model):
    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    try:
        n_img = 16
        frame = np.concatenate([
            np.full(6, 5), [280], np.full(n_img, VOCAB.mask_token_id), [281]
        ]).astype(np.int64)
        settings = T2ISettings(timesteps=3, num_vq_tokens=n_img,
                               segment_timesteps=1, block_kv_cache=True)
        f = engine.submit_t2i(frame, frame.copy(), settings)
        with pytest.raises(ValueError, match="exact-sampler only"):
            f.result(timeout=120)
    finally:
        engine.stop()


def test_cancellation_queued_and_mid_stream(model):
    """Future.cancel() works at both seams: a request cancelled while
    queued never runs (dropped at _flush), and a chunked request
    cancelled mid-flight frees its stream slot at the next chunk
    boundary — the engine stops paying for it while other requests
    (including batch-mates) complete exactly."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=40).start()
    try:
        # (a) cancel inside the batching window -> dropped before dispatch
        settings = TextSettings(gen_length=8, steps=4, block_length=8)
        pa, pb = np.arange(3, 9), np.arange(4, 10)
        f1 = engine.submit_text(pa, settings)
        f2 = engine.submit_text(pb, settings)
        assert f2.cancel()
        want = np.asarray(
            model.generate(jnp.asarray(pa)[None], gen_length=8, steps=4,
                           block_length=8, temperature=0.0)
        )[0]
        np.testing.assert_array_equal(f1.result(timeout=120), want)
        assert f2.cancelled()
        deadline = time.time() + 30
        while engine.stats["cancelled"] < 1 and time.time() < deadline:
            time.sleep(0.01)
        assert engine.stats["cancelled"] >= 1

        # (b) cancel a heavy chunked request mid-flight -> slot freed,
        # chunk production for it stops; a same-stream mate finishes exact
        heavy = TextSettings(gen_length=32, steps=32, block_length=8,
                             segment_steps=1)   # 32 chunks if left alone
        f_mate = engine.submit_text(pa, heavy)
        deadline = time.time() + 60
        while engine.stats["chunks"] < 2 and time.time() < deadline:
            time.sleep(0.005)
        f_victim = engine.submit_text(pb, heavy)   # joins the stream
        deadline = time.time() + 60
        while engine.stats["stream_joins"] < 1 and time.time() < deadline:
            time.sleep(0.005)
        assert f_victim.cancel()
        want = np.asarray(
            model.generate(jnp.asarray(pa)[None], gen_length=32, steps=32,
                           block_length=8, temperature=0.0)
        )[0]
        np.testing.assert_array_equal(f_mate.result(timeout=240), want)
        assert f_victim.cancelled()
        assert engine.stats["cancelled"] >= 2
    finally:
        engine.stop()


def test_t2m_requests_match_direct():
    """The engine serves t2m (completing all-modal coverage): monolithic
    and chunked results both equal the direct t2m_generate call with the
    request's seed."""
    import dataclasses as _dc

    import jax.numpy as jnp

    from mmada_tpu.serve.engine import T2MSettings

    vl = tiny_layout(text_vocab_size=256,
                     image_codebook_size=64).with_motion(codebook_size=32)
    cfg = llada.tiny_config(
        vocab_size=vl.total_vocab_size, d_model=32, n_heads=2, n_layers=2,
        mlp_hidden_size=64,
    )
    cfg = _dc.replace(cfg, mask_token_id=vl.mask_token_id)
    params = llada.init_params(jax.random.key(0), cfg)
    m = MMadaModel(cfg=cfg, params=params, vocab=vl)
    engine = ServingEngine(m, min_chunk_device_ms=0, max_wait_ms=20).start()
    try:
        n = 16
        frame = np.concatenate([
            np.full(6, 5), [280], np.full(n, vl.mask_token_id), [281]
        ]).astype(np.int64)
        settings = T2MSettings(timesteps=4, num_motion_tokens=n)
        want = np.asarray(m.t2m_generate(
            jnp.asarray(frame)[None], timesteps=4, num_motion_tokens=n,
            key=jax.random.key(9),
        ))[0]
        got = engine.submit_t2m(frame, settings, seed=9).result(timeout=240)
        np.testing.assert_array_equal(got, want)
        chunked = _dc.replace(settings, segment_timesteps=2)
        got2 = engine.submit_t2m(frame, chunked, seed=9).result(timeout=240)
        np.testing.assert_array_equal(got2, want)
        bad = _dc.replace(chunked, block_kv_cache=True)
        f = engine.submit_t2m(frame, bad, seed=9)
        with pytest.raises(ValueError, match="exact-sampler only"):
            f.result(timeout=120)
    finally:
        engine.stop()


def test_drain_finishes_inflight_and_rejects_new(model):
    """stop(drain=True): accepted work — including an in-flight chunked
    stream — completes with real results; submissions after draining
    starts are rejected; latency percentiles are recorded."""
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    settings = TextSettings(
        gen_length=16, steps=16, block_length=8, segment_steps=1,
    )
    prompt = np.arange(3, 9)
    f = engine.submit_text(prompt, settings)
    deadline = time.time() + 60
    while engine.stats["chunks"] < 1 and time.time() < deadline:
        time.sleep(0.005)
    engine.stop(drain=True)
    want = np.asarray(
        model.generate(jnp.asarray(prompt)[None], gen_length=16, steps=16,
                       block_length=8, temperature=0.0)
    )[0]
    np.testing.assert_array_equal(f.result(timeout=5), want)
    f2 = engine.submit_text(prompt, settings)
    with pytest.raises(RuntimeError, match="draining"):
        f2.result(timeout=5)
    lat = engine.latency_stats()
    assert lat["text"]["count"] == 1 and lat["text"]["p50_s"] > 0


def test_task_serving_defaults_family_overrides():
    """serving.<task>.<key> overrides the flat serving.<key>; per the
    family-resolved gate evidence (BASELINE.md rounds 3q-3t) a deployment
    enables kv for mmu/t2i while text stays exact with its quality knobs."""
    from mmada_tpu.core.config import Config
    from mmada_tpu.serve.loader import task_serving_defaults

    cfg = Config({
        "serving": {
            "kv_cache": False,
            "parallel_threshold": 0.9,
            "text": {"cache_refresh_every": 2, "parallel_warmup_steps": 2},
            "mmu": {"kv_cache": "int8"},
            "t2i": {"kv_cache": True},
        }
    })
    text = task_serving_defaults(cfg, "text")
    assert text["kv_cache"] is False          # flat default
    assert text["cache_refresh_every"] == 2   # family override
    assert text["parallel_warmup_steps"] == 2
    assert text["parallel_threshold"] == 0.9  # flat inherited

    mmu = task_serving_defaults(cfg, "mmu")
    assert mmu["kv_cache"] == "int8"          # family override wins
    assert mmu["cache_refresh_every"] == 0    # not set anywhere

    t2i = task_serving_defaults(cfg, "t2i")
    assert t2i["kv_cache"] is True

    t2m = task_serving_defaults(cfg, "t2m")
    assert t2m["kv_cache"] is False           # flat only


def test_t2i_cfg_interval_through_engine(model):
    """T2ISettings.cfg_interval reaches the sampler in both the
    monolithic jit path and the chunked (_T2ITask) path: both equal the
    direct model call with the same interval and differ from full CFG."""
    import jax
    import jax.numpy as jnp

    engine = ServingEngine(model, min_chunk_device_ms=0, max_wait_ms=5).start()
    try:
        n_img = 16
        frame = np.concatenate([
            np.full(6, 5), [280], np.full(n_img, VOCAB.mask_token_id), [281]
        ]).astype(np.int64)
        uncond = frame.copy()
        uncond[:6] = VOCAB.pad_token_id
        base = T2ISettings(timesteps=6, guidance_scale=1.5,
                           num_vq_tokens=n_img, cfg_interval=(1 / 6, 5 / 6))
        want = np.asarray(model.t2i_generate(
            jnp.asarray(frame[None]),
            uncond_input_ids=jnp.asarray(uncond[None]),
            temperature=1.0, timesteps=6, guidance_scale=1.5,
            num_vq_tokens=n_img, key=jax.random.key(3),
            cfg_interval=(1 / 6, 5 / 6),
        ))[0]
        got = engine.submit_t2i(frame, uncond, base, seed=3).result(240)
        np.testing.assert_array_equal(got, want)
        chunked = dataclasses.replace(base, segment_timesteps=4)
        got_c = engine.submit_t2i(frame, uncond, chunked, seed=3).result(240)
        np.testing.assert_array_equal(got_c, want)
    finally:
        engine.stop()


def test_chunk_guard_demotes_small_ops(model):
    """The min-chunk-work auto-guard (SERVING_r03.json proxy165m: chunking
    is a pure loss when per-chunk dispatch dominates): with the default
    floor, a tiny model's segment_steps request runs MONOLITHIC — same
    tokens, zero chunk programs, and the skip is counted."""
    import jax.numpy as jnp

    engine = ServingEngine(model, max_wait_ms=30).start()  # default floor
    try:
        settings = TextSettings(
            gen_length=16, steps=8, block_length=8, segment_steps=2,
        )
        prompt = np.random.default_rng(5).integers(3, 200, size=(6,))
        out = engine.submit_text(prompt, settings).result(timeout=120)
        direct = np.asarray(
            model.generate(
                jnp.asarray(prompt)[None],
                gen_length=16, steps=8, block_length=8, temperature=0.0,
            )
        )[0]
        np.testing.assert_array_equal(out, direct)
        assert engine.stats["chunks"] == 0
        assert engine.stats["chunk_guard_skips"] == 1
        assert engine.stats["batches"] == 1
    finally:
        engine.stop()


def test_chunk_guard_estimate_scales_to_heavy_ops():
    """The conservative 50 TFLOP/s estimate keeps chunking for real op
    points: the flagship 8B heavy op estimates far above the floor, the
    165M proxy's small op far below (the two measured rows of
    SERVING_r03.json), and a config-less test double disables the guard."""
    from mmada_tpu.serve.engine import TextSettings

    eng = ServingEngine.__new__(ServingEngine)  # estimate is self-contained
    eng.min_chunk_device_s = 0.025

    class _M:
        cfg = None
    eng.model = _M()
    small = TextSettings(gen_length=64, steps=32, block_length=32,
                         segment_steps=8)
    assert eng._est_chunk_device_s(small, 64) == 0.0  # duck-typed double

    eng.model = type("M", (), {"cfg": llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=32, n_heads=2,
        n_layers=2, mlp_hidden_size=64)})()
    assert eng._est_chunk_device_s(small, 64) < eng.min_chunk_device_s

    big = llada.LLaDAConfig(
        d_model=4096, n_heads=32, n_layers=32, mlp_hidden_size=12288,
        vocab_size=VOCAB.total_vocab_size,
        embedding_size=VOCAB.total_vocab_size, max_sequence_length=2048,
    )
    eng.model = type("M", (), {"cfg": big})()
    heavy = TextSettings(gen_length=512, steps=256, block_length=64,
                         segment_steps=16)
    assert eng._est_chunk_device_s(heavy, 64) > eng.min_chunk_device_s


def test_chunk_guard_prices_whole_group(model, monkeypatch):
    """The auto-guard estimate covers the whole joined group, not one row
    (ADVICE r4): four near-floor requests that would each be demoted
    alone clear the floor together and keep the chunked fairness lever."""
    import jax.numpy as jnp

    from mmada_tpu.serve import engine as E

    # estimator says one row is just under the floor; 4 rows clear it
    monkeypatch.setattr(
        E.ServingEngine, "_est_chunk_device_s",
        lambda self, settings, plen: 0.0008)
    engine = ServingEngine(model, min_chunk_device_ms=1.0,
                           max_batch=4, max_wait_ms=120).start()
    try:
        settings = TextSettings(
            gen_length=16, steps=8, block_length=8, segment_steps=2,
        )
        rng = np.random.default_rng(6)
        prompt = rng.integers(3, 200, size=(6,))
        futs = [engine.submit_text(prompt, settings) for _ in range(4)]
        outs = [f.result(timeout=240) for f in futs]
        direct = np.asarray(
            model.generate(
                jnp.asarray(prompt)[None],
                gen_length=16, steps=8, block_length=8, temperature=0.0,
            )
        )[0]
        for out in outs:
            np.testing.assert_array_equal(out, direct)
        assert engine.stats["chunks"] > 0, "group must stay chunked"
        assert engine.stats["chunk_guard_skips"] == 0
    finally:
        engine.stop()


def test_chunk_guard_single_near_floor_request_still_demoted(model,
                                                             monkeypatch):
    """Same estimator, one request: 1 x est stays under the floor and the
    guard demotes to monolithic — the group pricing is multiplicative,
    not a blanket enable."""
    import jax.numpy as jnp

    from mmada_tpu.serve import engine as E

    monkeypatch.setattr(
        E.ServingEngine, "_est_chunk_device_s",
        lambda self, settings, plen: 0.0008)
    engine = ServingEngine(model, min_chunk_device_ms=1.0,
                           max_batch=4, max_wait_ms=30).start()
    try:
        settings = TextSettings(
            gen_length=16, steps=8, block_length=8, segment_steps=2,
        )
        prompt = np.random.default_rng(7).integers(3, 200, size=(6,))
        out = engine.submit_text(prompt, settings).result(timeout=120)
        direct = np.asarray(
            model.generate(
                jnp.asarray(prompt)[None],
                gen_length=16, steps=8, block_length=8, temperature=0.0,
            )
        )[0]
        np.testing.assert_array_equal(out, direct)
        assert engine.stats["chunks"] == 0
        assert engine.stats["chunk_guard_skips"] == 1
    finally:
        engine.stop()


def test_task_serving_defaults_fast_stack_preset():
    """serving.fast_stack=true swaps the FALLBACKS for the gate-promoted
    composed stack per family; explicit keys at any level still override;
    cfg_interval is never part of the preset (its proxy gate is blind to
    guidance value); families without gate evidence stay exact."""
    from mmada_tpu.core.config import Config
    from mmada_tpu.serve.loader import task_serving_defaults

    cfg = Config({"serving": {"fast_stack": True}})
    text = task_serving_defaults(cfg, "text")
    assert text["kv_cache"] == "int8"
    assert text["cache_refresh_every"] == 4
    assert text["parallel_threshold"] == 0.9
    assert text["parallel_warmup_steps"] == 8
    assert text["cfg_interval"] == (0.0, 1.0)   # full CFG — not in preset

    mmu = task_serving_defaults(cfg, "mmu")
    assert mmu["kv_cache"] == "int8"
    assert mmu["cache_refresh_every"] == 0    # MMU promotes the full freeze
    assert mmu["parallel_warmup_steps"] == 2

    t2i = task_serving_defaults(cfg, "t2i")
    assert t2i["kv_cache"] is True
    assert t2i["parallel_threshold"] == 0.0
    assert t2i["cfg_interval"] == (0.0, 1.0)  # stays an individual opt-in

    t2m = task_serving_defaults(cfg, "t2m")
    assert t2m["kv_cache"] is False           # no gate evidence -> exact

    # explicit keys override the preset at both levels
    cfg2 = Config({"serving": {
        "fast_stack": True,
        "cache_refresh_every": 2,
        "text": {"kv_cache": False},
    }})
    text2 = task_serving_defaults(cfg2, "text")
    assert text2["kv_cache"] is False
    assert text2["cache_refresh_every"] == 2

    # per-family opt-in only
    cfg3 = Config({"serving": {"mmu": {"fast_stack": True}}})
    assert task_serving_defaults(cfg3, "mmu")["kv_cache"] == "int8"
    assert task_serving_defaults(cfg3, "text")["kv_cache"] is False

    # the "false" string trap (parse_bool)
    cfg4 = Config({"serving": {"fast_stack": "false"}})
    assert task_serving_defaults(cfg4, "text")["kv_cache"] is False
