"""Fast decoding walkthrough — block-KV cache + confidence-parallel commits.

Runs out of the box with the tiny random demo config:

    python examples/fast_decode.py

The exact samplers re-run the full bidirectional forward every denoise step
(`steps × full-forward` — the reference's cost law, generate.py:43-113).
Two opt-in modes break it (measured on the full 8B int8 single chip: text
35.7 → 131.4 tok/s, MMU p50 6.60 → 1.23 s, t2i +20%):

  * ``block_kv_cache=True``  — capture per-layer K/V once per block, then
    forward only the active block's tokens per step ("int8" additionally
    stores the cache quantized at half the HBM);
  * ``parallel_threshold=τ`` — commit every candidate whose confidence
    clears τ each step and exit the block as soon as it completes.

Both are approximations of the exact sampler, and the trained-proxy truth
gate measured their quality price to be concentrated in each block's FIRST
steps (BASELINE.md rounds 3q-3t). Two knobs buy the quality back:

  * ``cache_refresh_every=N`` — re-capture the K/V every N steps inside a
    block (refresh=1 is token-exact; refresh=4 restored exact quality on
    the trained proxy at 1.94x exact speed at the reference op);
  * ``parallel_warmup_steps=K`` — hold the τ threshold for a block's
    first K steps (warmup=8, half the steps per block, preserved
    quality at 1.15x).

With real weights, gate them with tools/real_weight_harness.py
(kv_cache_gate stage) before making them a serving default — and note the
verdicts are per-family: MMU keeps full quality under the plain freeze.
On the HTTP API the knobs are the ``kv_cache``, ``parallel_threshold``,
``parallel_warmup_steps`` and ``cache_refresh_every`` request fields; on
the CLIs the same names as ``key=value``; deployment-wide,
``serving.<task>.<key>`` (docs/SERVING.md).
"""

import argparse
import os
import sys
import time

import numpy as np

# runnable as `python examples/fast_decode.py` without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/tiny_test.yaml")
    ap.add_argument("--prompt", default="Tell me about masked diffusion.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmada_tpu.core.config import load_config
    from mmada_tpu.serve.loader import (
        build_model, build_prompting, build_text_tokenizer, build_vocab,
    )

    cfg = load_config(args.config)
    tokenizer = build_text_tokenizer(cfg)
    vocab = build_vocab(cfg)
    build_prompting(cfg, tokenizer, vocab)
    model = build_model(cfg, vocab)

    ids = tokenizer([args.prompt])["input_ids"]
    prompt = jnp.asarray(ids, jnp.int32)
    kw = dict(gen_length=64, steps=32, block_length=16, temperature=0.0)

    def run(label, **extra):
        t0 = time.time()
        out = np.asarray(model.generate(prompt, **kw, **extra))
        dt = time.time() - t0
        answer = out[0, prompt.shape[1]:]
        answer = answer[answer < vocab.text_vocab_size]
        print(f"[{label:>22}] {dt:6.2f}s  "
              f"{tokenizer.decode(answer.tolist())[:60]!r}")
        return out

    exact = run("exact")
    cached = run("block_kv_cache", block_kv_cache=True)
    run("int8 kv cache", block_kv_cache="int8")
    refreshed = run("kv refresh=2", block_kv_cache=True,
                    cache_refresh_every=2)  # spb=4 here, so cadence 2 = spb/2
    par = run("parallel τ=0.9", parallel_threshold=0.9)
    warm = run("τ=0.9 warmup=2", parallel_threshold=0.9,
               parallel_warmup_steps=2)
    run("cache + parallel", block_kv_cache=True, parallel_threshold=0.9,
        parallel_warmup_steps=2, cache_refresh_every=2)

    gen = slice(prompt.shape[1], None)
    print(f"cached-vs-exact token agreement:   "
          f"{(cached[:, gen] == exact[:, gen]).mean():.2%}")
    print(f"parallel-vs-exact token agreement: "
          f"{(par[:, gen] == exact[:, gen]).mean():.2%}")
    print(f"refresh2-vs-exact token agreement: "
          f"{(refreshed[:, gen] == exact[:, gen]).mean():.2%}")
    print(f"warmup2-vs-exact token agreement:  "
          f"{(warm[:, gen] == exact[:, gen]).mean():.2%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
