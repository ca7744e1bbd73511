"""Layout pinning (serve/layouts.py): the AUTO-layout compiled executable
must compute the same function as the plain jit; on CPU layouts are
trivial, so this pins the plumbing (format query, leafwise re-layout,
call path), while the perf effect is a chip-measured claim (BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.serve.layouts import compile_with_pinned_layouts, layouts_supported


def test_pinned_executable_matches_plain_jit():
    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size)
    m = MMadaModel.init(jax.random.key(0), cfg, vl)
    prompt = jax.random.randint(jax.random.key(1), (2, 8), 3, 200)

    def fn(model, p):
        return model.generate(p, gen_length=16, steps=4, block_length=8,
                              temperature=0.0, block_kv_cache=True)

    want = np.asarray(jax.jit(fn)(m, prompt))
    compiled, (m2, p2) = compile_with_pinned_layouts(
        fn, m, prompt, delete_originals=False
    )
    got = np.asarray(compiled(m2, p2))
    np.testing.assert_array_equal(want, got)


def test_layouts_supported_flag():
    # informational: the API must import cleanly either way
    assert isinstance(layouts_supported(), bool)


def test_pinned_fast_runner_matches_default():
    """with_pinned_fast_runner wires the AUTO-layout per-block executable
    into mmu_generate_fast; outputs must be identical to the default
    path, and mismatched settings must fall back (not crash)."""
    import dataclasses

    vocab = tiny_layout(text_vocab_size=256, image_codebook_size=64)
    cfg = llada.tiny_config(vocab_size=vocab.total_vocab_size)
    cfg = dataclasses.replace(cfg, mask_token_id=vocab.mask_token_id)
    model = MMadaModel.init(jax.random.key(0), cfg, vocab)
    prompt = jax.random.randint(jax.random.key(1), (2, 8), 3, 250, jnp.int32)
    kw = dict(max_new_tokens=16, steps=8, block_length=8, temperature=0.0)
    eot = 2

    want = np.asarray(model.mmu_generate_fast(prompt, eot, **kw))

    # pinning deletes the source params — pin a fresh copy
    model2 = MMadaModel.init(jax.random.key(0), cfg, vocab)
    pinned = model2.with_pinned_fast_runner(prompt, eot, **kw)
    assert pinned._pinned_fast_runner is not None
    got = np.asarray(pinned.mmu_generate_fast(prompt, eot, **kw))
    np.testing.assert_array_equal(got, want)

    # kv-cached settings differ from the pinned ones -> default path
    other = np.asarray(
        pinned.mmu_generate_fast(prompt, eot, block_kv_cache=True, **kw)
    )
    assert other.shape == want.shape
