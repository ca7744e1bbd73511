"""MMU at the REFERENCE operating point across the fast-decode stack.

The bench.py headline measures the exact int8 sampler at the reference op
point (1066-token image+question prefix, 1024 new / 512 steps / block
1024, inference_mmu.py:57,102) — 102.76 s p50 = 82.4% of v5e bf16 peak
(BASELINE.md round-3h). This tool measures the OPT-IN levers at the same
point on the full-8B structure (timing is weight-independent):

  * exact sampler under W8A8 (int8-MXU matmuls, ~2x bf16 peak) —
    quality-gated opt-in (QUANT_r03.json);
  * block-KV-cached decode (int8 cache) — approximate opt-in; at block
    1024 each step forwards only the 1024-token block against cached
    prefix K/V.

The cached arm runs LAST and in this order because its 512-step block is
ONE device program near the tunnel's ~60 s execution kill — if the worker
dies, the earlier arms' numbers are already on disk.

    python tools/bench_mmu_ref.py out=MMU_REF_r03.json
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
    out_path = args.get("out", "MMU_REF_r03.json")
    reps = int(args.get("reps", 3))
    arms = args.get("arms", "w8a8,kv").split(",")

    import jax
    import jax.numpy as jnp
    import numpy as np

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

    def build(scheme):
        shapes = jax.eval_shape(
            lambda k: Q.quantize_llada_params(
                llada.init_params(k, cfg, dtype=jnp.bfloat16),
                activations=scheme == "w8a8",
            ),
            jax.random.key(0),
        )

        def mk(s):
            if s.dtype == jnp.float32 and len(s.shape) <= 2:
                return jnp.ones(s.shape, s.dtype)
            return jnp.zeros(s.shape, s.dtype)

        params = jax.jit(lambda: jax.tree.map(mk, shapes))()
        return MMadaModel(cfg=cfg, params=params, vocab=MMADA_8B,
                          policy=BF16)

    prefix = jnp.concatenate([
        jnp.full((1, 2), MMADA_8B.special("<|mmu|>")),
        jax.random.randint(jax.random.key(7), (1, 1024), 0, 8192)
        + MMADA_8B.image_offset,
        jax.random.randint(jax.random.key(8), (1, 40), 3, 100000),
    ], axis=1).astype(jnp.int32)

    def sync(x):
        jax.device_get(jnp.asarray(x).sum())

    def p50(fn):
        sync(fn())                      # warm/compile
        lats = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn())
            lats.append(time.perf_counter() - t0)
        return sorted(lats)[len(lats) // 2]

    results = {"operating_point": "1066-token prefix, 1024 new, 512 steps, "
                                  "block 1024 (inference_mmu.py:57,102)"}
    if os.path.exists(out_path):
        # merging rerun (arms=kv after a partial run): keep prior numbers
        with open(out_path) as f:
            results.update(json.load(f))

    def save():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    # --- arm 1: exact sampler, W8A8 (segmented — one ~2 min scan would
    # exceed the tunnel's per-execution kill; 128-step chunks) ----------
    # The w8a8 and composed arms share ONE build: both run w8a8 weights,
    # and a second build in the same process RESOURCE_EXHAUSTEDs the chip
    # (the axon client does not reliably free the first model's 8.6 GB on
    # `del` — round-5 pipeline log). Standalone arms=composed also works.
    m_w8a8 = build("w8a8") if ("w8a8" in arms or "composed" in arms) else None
    if "w8a8" in arms:
        results["exact_w8a8_p50_s"] = round(p50(lambda: m_w8a8.mmu_generate(
            prefix, max_new_tokens=1024, steps=512, block_length=1024,
            temperature=0.0, segment_steps=128,
        )), 2)
        logging.info("exact W8A8: %.2f s", results["exact_w8a8_p50_s"])
        save()

    # --- arms 3/4: the MMU_GATE promoted COMPOSITION (VERDICT r4 #2) ---
    # w8a8 weights + int8 block-KV cache, alone and with the adaptive
    # parallel commit (tau 0.9, warmup 2 — the literal kv_parallel_warmup2
    # arm MMU_GATE_r03e.json promotes at 2.65x). The parallel arm is a
    # lax.while_loop (early exit when the block fully commits) so it
    # cannot be segmented — but it exits long before the ~60 s worker
    # kill precisely because it commits early.
    if "composed" in arms:
        m_c = m_w8a8
        runner_kv = jax.jit(lambda m, p: m.mmu_generate(
            p, max_new_tokens=1024, steps=512, block_length=1024,
            temperature=0.0, block_kv_cache="int8",
        ))
        try:
            results["w8a8_kv_int8_p50_s"] = round(
                p50(lambda: runner_kv(m_c, prefix)), 2)
            results.pop("w8a8_kv_int8_error", None)  # stale merge key
            logging.info("w8a8 + kv int8: %.2f s",
                         results["w8a8_kv_int8_p50_s"])
        except Exception as e:
            results["w8a8_kv_int8_p50_s"] = None
            results["w8a8_kv_int8_error"] = f"{type(e).__name__}: {e}"[:300]
            logging.exception("w8a8+kv arm failed")
        save()
        runner_par = jax.jit(lambda m, p: m.mmu_generate(
            p, max_new_tokens=1024, steps=512, block_length=1024,
            temperature=0.0, block_kv_cache="int8",
            parallel_threshold=0.9, parallel_warmup_steps=2,
        ))
        try:
            results["w8a8_kv_parallel_p50_s"] = round(
                p50(lambda: runner_par(m_c, prefix)), 2)
            results.pop("w8a8_kv_parallel_error", None)  # stale merge key
            logging.info("w8a8 + kv + tau0.9/warmup2: %.2f s",
                         results["w8a8_kv_parallel_p50_s"])
        except Exception as e:
            results["w8a8_kv_parallel_p50_s"] = None
            results["w8a8_kv_parallel_error"] = (
                f"{type(e).__name__}: {e}"[:300])
            logging.exception("w8a8+kv+parallel arm failed")
        save()
        del m_c  # alias of m_w8a8 — both refs must drop before arm 2

    if "kv" not in arms:
        print(json.dumps(results))
        return 0

    # --- arm 2: block-KV-cached decode (int8 cache), int8 weights ------
    # ONE 512-step program; may hit the ~60 s worker kill — runs last,
    # and should run in its OWN process (see the shared-build note above).
    del m_w8a8
    m_int8 = build("int8")
    try:
        runner = jax.jit(lambda m, p: m.mmu_generate(
            p, max_new_tokens=1024, steps=512, block_length=1024,
            temperature=0.0, block_kv_cache="int8",
        ))
        results["kv_int8_p50_s"] = round(
            p50(lambda: runner(m_int8, prefix)), 2
        )
        logging.info("kv-cached int8: %.2f s", results["kv_int8_p50_s"])
    except Exception as e:  # worker kill leaves the tunnel degraded
        results["kv_int8_p50_s"] = None
        results["kv_int8_error"] = f"{type(e).__name__}: {e}"[:300]
        logging.exception("kv-cached arm failed")
    save()
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
