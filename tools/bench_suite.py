"""Extended benchmark suite: all BASELINE.md operating points on one chip.

Measures (flagship dims, 16-layer single-chip proxy, zeros weights — values
don't affect throughput):
  1. semi-AR text generation tokens/sec (gen 512, steps 256, block 64);
  2. MMU latency p50 (1024 image tokens prefix, 128 new tokens);
  3. t2i images/sec (15 steps, CFG 3.5) — same as bench.py.

Writes JSON lines to stdout; run on the TPU chip:
    python tools/bench_suite.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from mmada_tpu.core.precision import BF16
from mmada_tpu.core.vocab import MMADA_8B
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.sampling.text import SemiARConfig
from mmada_tpu.sampling import text as text_sampling


def sync(x):
    return jax.device_get(jax.tree.leaves(x)[0].sum() if hasattr(x, "sum") else x)


def build_model(n_layers=16):
    cfg = llada.LLaDAConfig(
        d_model=4096, n_heads=32, n_layers=n_layers, mlp_hidden_size=12288,
        vocab_size=MMADA_8B.total_vocab_size,
        embedding_size=MMADA_8B.total_vocab_size,
        max_sequence_length=2048, rope_theta=500000.0,
    )
    shapes = jax.eval_shape(
        lambda k: llada.init_params(k, cfg, dtype=jnp.bfloat16), jax.random.key(0)
    )
    params = jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )()
    return MMadaModel(cfg=cfg, params=params, vocab=MMADA_8B, policy=BF16)


def emit(metric, value, unit):
    print(json.dumps({"metric": metric, "value": round(value, 4),
                      "unit": unit, "vs_baseline": 1.0}), flush=True)


def bench_text(model):
    prompt_len, gen_length, steps, block = 64, 512, 256, 64
    scfg = SemiARConfig(gen_length=gen_length, steps=steps, block_length=block,
                        temperature=0.0, mask_id=MMADA_8B.mask_token_id)
    prompt = jnp.zeros((1, prompt_len), jnp.int32) + 5

    @jax.jit
    def run(model, prompt):
        return text_sampling.generate(
            lambda t: llada.forward(
                model.params, model.cfg, t, policy=model.policy
            ),
            prompt, scfg,
        )

    t0 = time.perf_counter()
    sync(run(model, prompt))
    compile_s = time.perf_counter() - t0

    runs = 2
    t0 = time.perf_counter()
    for _ in range(runs):
        out = run(model, prompt)
    sync(out)
    dt = (time.perf_counter() - t0) / runs
    emit("text tokens/sec/chip semi-AR (gen512 steps256 block64, 16L proxy)",
         gen_length / dt, "tokens/sec")
    print(f"# text: {dt:.2f}s/gen, compile {compile_s:.0f}s", file=sys.stderr)


def bench_mmu(model):
    img_tokens, new_tokens, steps = 1024, 128, 64
    prefix = jnp.zeros((1, img_tokens + 40), jnp.int32) + 5
    scfg = SemiARConfig(gen_length=new_tokens, steps=steps,
                        block_length=new_tokens, temperature=0.0,
                        mask_id=MMADA_8B.mask_token_id)

    @jax.jit
    def run(model, prompt):
        return text_sampling.generate(
            lambda t: llada.forward(
                model.params, model.cfg, t, policy=model.policy
            ),
            prompt, scfg,
        )

    sync(run(model, prefix))
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run(model, prefix))
        lat.append(time.perf_counter() - t0)
    emit("MMU p50 latency (1064-token prefix, 128 new, 64 steps, 16L proxy)",
         float(np.median(lat)), "seconds")


def bench_stochastic_serving(model):
    """Per-row-key stochastic text batching (serve/engine.py): aggregate
    tok/s at batch 8 vs solo — each row bit-identical to its solo run."""
    from mmada_tpu.serve.engine import TextSettings, _jit_text_per_row_keys

    settings = TextSettings(gen_length=128, steps=64, block_length=32,
                            temperature=1.0)
    prompt = jnp.zeros((64,), jnp.int32) + 5

    def keys(n):
        return jax.vmap(jax.random.key)(jnp.arange(n, dtype=jnp.uint32))

    p1, p8 = prompt[None], jnp.repeat(prompt[None], 8, 0)
    sync(_jit_text_per_row_keys(model, p1, settings, keys(1)))  # compile
    t0 = time.perf_counter()
    for _ in range(4):
        out = _jit_text_per_row_keys(model, p1, settings, keys(1))
    sync(out)
    solo = (time.perf_counter() - t0) / 4

    sync(_jit_text_per_row_keys(model, p8, settings, keys(8)))  # compile
    t0 = time.perf_counter()
    for _ in range(4):
        out = _jit_text_per_row_keys(model, p8, settings, keys(8))
    sync(out)
    b8 = (time.perf_counter() - t0) / 4
    emit("stochastic serving text tok/s aggregate (per-row keys, batch 8, 16L proxy)",
         8 * 128 / b8, "tokens/sec")
    print(f"# stochastic batch-8 {8*128/b8:.1f} tok/s vs solo {128/solo:.1f} "
          f"({solo*8/b8:.2f}x)", file=sys.stderr)


def bench_cached(model):
    """Opt-in fast-decode modes at the same operating points (PARITY.md
    'block-KV-cached decode' / 'confidence-parallel decoding')."""
    prompt = jnp.zeros((1, 64), jnp.int32) + 5

    @jax.jit
    def run_kv(model, prompt):
        return model.generate(prompt, gen_length=512, steps=256,
                              block_length=64, temperature=0.0,
                              block_kv_cache=True)

    sync(run_kv(model, prompt))
    t0 = time.perf_counter()
    sync(run_kv(model, prompt))
    emit("text tok/s kv-cached (gen512 steps256 block64, 16L proxy)",
         512 / (time.perf_counter() - t0), "tokens/sec")

    prefix = jnp.zeros((1, 1064), jnp.int32) + 5

    @jax.jit
    def run_mmu_kv(model, prompt):
        return model.mmu_generate(prompt, max_new_tokens=128, steps=64,
                                  block_length=128, temperature=0.0,
                                  block_kv_cache=True)

    sync(run_mmu_kv(model, prefix))
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(run_mmu_kv(model, prefix))
        lat.append(time.perf_counter() - t0)
    emit("MMU p50 kv-cached (1064-token prefix, 128 new, 16L proxy)",
         float(np.median(lat)), "seconds")


def main():
    model = build_model()
    bench_text(model)
    bench_mmu(model)
    bench_stochastic_serving(model)
    if "cached" in sys.argv or os.environ.get("BENCH_CACHED"):
        bench_cached(model)
    return 0


if __name__ == "__main__":
    sys.exit(main())
