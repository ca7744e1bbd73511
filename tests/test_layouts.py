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
