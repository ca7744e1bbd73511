"""On-chip before/after for layout pinning in the multi-program serving
path (VERDICT r2 weak item 5): the per-block early-stop runner
(`mmu_generate_fast`) is a standalone executable invoked once per semi-AR
block — exactly the case where serve/layouts measured a -27% call-time
win on a standalone cached-step program. This measures it END-TO-END:

    python tools/bench_layout_pin.py           # full 8B int8, one chip
    python tools/bench_layout_pin.py cpu=1 tiny=1   # harness check

Prints one JSON line with tok/s for the default runner vs the pinned
runner (same settings, same outputs) for both the exact and the
block-KV-cached mode.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv):
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    tiny = args.get("tiny") == "1"

    import jax

    if args.get("cpu") == "1":
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from mmada_tpu.core.precision import BF16
    from mmada_tpu.core.vocab import MMADA_8B, tiny_layout
    from mmada_tpu.models import llada
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.ops import quantization as Q

    if tiny:
        vocab = tiny_layout(text_vocab_size=256, image_codebook_size=64)
        cfg = llada.tiny_config(vocab_size=vocab.total_vocab_size)
        cfg = dataclasses.replace(cfg, mask_token_id=vocab.mask_token_id)
        gen, steps, block, prompt_len = 16, 8, 8, 8
        reps = 2

        def build():
            return MMadaModel.init(jax.random.key(0), cfg, vocab)
    else:
        vocab = MMADA_8B
        cfg = llada.llada_8b(vocab.total_vocab_size)
        gen, steps, block, prompt_len = 512, 256, 64, 128
        reps = 2

        def build():
            shapes = jax.eval_shape(
                lambda k: Q.quantize_llada_params(
                    llada.init_params(k, cfg, dtype=jnp.bfloat16)
                ),
                jax.random.key(0),
            )

            def mk(s):
                if s.dtype == jnp.float32 and len(s.shape) <= 2:
                    return jnp.ones(s.shape, s.dtype)
                return jnp.zeros(s.shape, s.dtype)

            params = jax.jit(lambda: jax.tree.map(mk, shapes))()
            return MMadaModel(cfg=cfg, params=params, vocab=vocab,
                              policy=BF16)

    prompt = jax.random.randint(
        jax.random.key(1), (1, prompt_len), 3,
        min(100000, vocab.text_vocab_size - 30), jnp.int32,
    )
    eot = 2

    def sync(x):
        return int(jax.device_get(x.sum()))

    def measure(model, label, **kw):
        out = model.mmu_generate_fast(prompt, eot, max_new_tokens=gen,
                                      steps=steps, block_length=block,
                                      **kw)
        sync(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            out = model.mmu_generate_fast(prompt, eot, max_new_tokens=gen,
                                          steps=steps, block_length=block,
                                          **kw)
            sync(out)
        dt = (time.perf_counter() - t0) / reps
        return np.asarray(out), gen / dt

    result = {"operating_point": f"gen{gen} steps{steps} block{block} "
                                 f"batch1 ({'tiny' if tiny else '8B int8'})"}
    for mode, kw in (("exact", {}), ("kv_cached", {"block_kv_cache": True})):
        model = build()
        out_d, tok_s_default = measure(model, f"default/{mode}", **kw)
        del model
        model = build().with_pinned_fast_runner(
            prompt, eot, max_new_tokens=gen, steps=steps,
            block_length=block, **kw,
        )
        out_p, tok_s_pinned = measure(model, f"pinned/{mode}", **kw)
        del model
        result[mode] = {
            "tok_s_default_runner": round(tok_s_default, 2),
            "tok_s_pinned_runner": round(tok_s_pinned, 2),
            "speedup": round(tok_s_pinned / tok_s_default, 3),
            "outputs_identical": bool((out_d == out_p).all()),
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
