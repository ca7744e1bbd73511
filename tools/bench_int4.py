"""int4 vs int8 weights at the weight-bandwidth-bound decode points.

The block-KV-cached decode step is weight-stream-bound (BASELINE.md: the
batch-1 cached step is ~the 32-layer weight read; int8 already halves
bf16). Grouped int4 (ops/int4_matmul.py) halves the stream again IF the
Pallas dequant kernel's DMA+VPU cost stays under the saved HBM time —
microbenchmarks through the tunnel are too noisy to settle that (weight
streams measured 30-130 GB/s for the SAME program across sessions), so
this tool measures the decision end-to-end on the full-8B structure
(timing is weight-independent, same device-zeros trick as bench.py):

  * kv-cached text, gen 512 / steps 256 / block 64, T=0, batch 1
    (the 131.4 tok/s int8 point, BASELINE.md round-2c);
  * kv-cached MMU light point, 1066-token prefix, 128 new / 64 steps
    (the 1.22 s int8 point).

Each arm builds its model, measures, and frees it before the next (int8
8.6 GB + int4 4.4 GB do not comfortably coexist beside caches on a 16 GB
chip). Verdict lands in BASELINE.md; int4 stays opt-in either way
(`model.mmada.quantize: int4`) — its unconditional value is capacity.

    python tools/bench_int4.py out=INT4_r03.json
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    out_path = args.get("out", "INT4_r03.json")
    arms = args.get("arms", "int8,int4").split(",")

    import jax
    import jax.numpy as jnp

    from mmada_tpu.core.precision import BF16
    from mmada_tpu.core.vocab import MMADA_8B
    from mmada_tpu.models import llada
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.ops import quantization as Q

    cfg = llada.LLaDAConfig(
        d_model=4096, n_heads=32, n_layers=32, mlp_hidden_size=12288,
        vocab_size=MMADA_8B.total_vocab_size,
        embedding_size=MMADA_8B.total_vocab_size,
        max_sequence_length=2048, rope_theta=500000.0,
    )

    def build(bits):
        shapes = jax.eval_shape(
            lambda k: Q.quantize_llada_params(
                llada.init_params(k, cfg, dtype=jnp.bfloat16), bits=bits,
            ),
            jax.random.key(0),
        )

        def mk(s):
            if s.dtype == jnp.float32 and len(s.shape) <= 2:
                return jnp.ones(s.shape, s.dtype)
            return jnp.zeros(s.shape, s.dtype)

        params = jax.jit(lambda: jax.tree.map(mk, shapes))()
        gb = sum(x.nbytes for x in jax.tree.leaves(params)) / 1e9
        return MMadaModel(cfg=cfg, params=params, vocab=MMADA_8B,
                          policy=BF16), gb

    text_prompt = jax.random.randint(
        jax.random.key(5), (1, 128), 3, 100000, jnp.int32)
    mmu_prefix = jnp.concatenate([
        jnp.full((1, 2), MMADA_8B.special("<|mmu|>")),
        jax.random.randint(jax.random.key(7), (1, 1024), 0, 8192)
        + MMADA_8B.image_offset,
        jax.random.randint(jax.random.key(8), (1, 40), 3, 100000),
    ], axis=1).astype(jnp.int32)

    def sync(x):
        jax.device_get(jnp.asarray(x).sum())

    def p50(fn, reps=3):
        sync(fn())                      # warm/compile
        lats = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn())
            lats.append(time.perf_counter() - t0)
        return sorted(lats)[len(lats) // 2]

    run_text = jax.jit(lambda m, p: m.generate(
        p, gen_length=512, steps=256, block_length=64, temperature=0.0,
        block_kv_cache=True,
    ))
    run_mmu = jax.jit(lambda m, p: m.mmu_generate(
        p, max_new_tokens=128, steps=64, block_length=128,
        temperature=0.0, block_kv_cache=True,
    ))

    results = {"operating_points": "kv-cached text gen512/steps256/block64 "
                                   "b1 T0; kv-cached MMU 1066-prefix "
                                   "128new/64steps"}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results.update(json.load(f))

    for scheme in arms:
        bits = {"int8": 8, "int4": 4}[scheme]
        model, gb = build(bits)
        results[f"{scheme}_weight_gb"] = round(gb, 2)
        dt = p50(lambda: run_text(model, text_prompt))
        results[f"{scheme}_text_kv_tok_s"] = round(512 / dt, 2)
        logging.info("%s text kv: %.2f tok/s", scheme, 512 / dt)
        results[f"{scheme}_mmu_kv_p50_s"] = round(
            p50(lambda: run_mmu(model, mmu_prefix)), 3)
        logging.info("%s mmu kv p50: %.3f s", scheme,
                     results[f"{scheme}_mmu_kv_p50_s"])
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        del model

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
