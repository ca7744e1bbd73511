"""Confidence-parallel decoding quality sweep on a trained checkpoint.

`parallel_threshold=τ` commits every position whose confidence exceeds τ
each step (plus block early-exit) — measured 1056 tok/s full-commit
ceiling on random weights (BASELINE.md round-2c), but its REALIZED
speedup and its quality are data-dependent: both need a model with real
margins. This sweeps τ against the exact sampler on in-distribution
prompts (same rationale as tools/quant_gate.py ckpt mode) and records,
per τ: token agreement with the exact decode, wall-clock speedup, and a
recommendation (largest τ-speedup whose agreement ≥ 0.95).

    python tools/parallel_sweep.py ckpt=proxy-output/export \
        config=configs/proxy_160m.yaml out=PARALLEL_r03.json
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

logger = logging.getLogger("parallel_sweep")

TAUS = (0.95, 0.9, 0.8, 0.7, 0.5)
AGREEMENT_MIN = 0.95


def main(argv):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    out_path = args.get("out", "PARALLEL_r03.json")

    import jax

    if args.get("cpu") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from mmada_tpu.checkpoints.hf_import import (
        config_from_hf_json, load_pretrained,
    )
    from mmada_tpu.core.config import load_config
    from mmada_tpu.core.precision import BF16
    from mmada_tpu.data import synthetic
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.serve.loader import (
        build_prompting, build_text_tokenizer, build_vocab,
    )

    ckpt = args["ckpt"]
    ycfg = load_config(args.get("config", "configs/proxy_160m.yaml"))
    tokenizer = build_text_tokenizer(ycfg)
    vocab = build_vocab(ycfg)
    build_prompting(ycfg, tokenizer, vocab)  # validates config plumb-through

    cfg = config_from_hf_json(ckpt)
    params = load_pretrained(ckpt, cfg, dtype=jnp.bfloat16)
    model = MMadaModel(cfg=cfg, params=params, vocab=vocab, policy=BF16)

    n_text, prompt_len = 2, 24
    prompt = jnp.asarray([
        tokenizer([synthetic.sentence(i)])["input_ids"][0][:prompt_len]
        for i in range(n_text)
    ], jnp.int32)
    gen_len, steps, block = 64, 32, 32

    def sync(x):
        return int(jax.device_get(jnp.asarray(x).sum()))

    def timed(fn, *a):
        out = fn(model, *a)
        sync(out)  # compile + warm
        t0 = time.perf_counter()
        out = fn(model, *a)
        sync(out)
        return np.asarray(out), time.perf_counter() - t0

    exact_fn = jax.jit(
        lambda m, p: m.generate(p, gen_length=gen_len, steps=steps,
                                block_length=block, temperature=0.0)
    )
    exact, exact_dt = timed(exact_fn, prompt)

    report = {
        "checkpoint": ckpt,
        "operating_point": {"prompt": prompt_len, "gen": gen_len,
                            "steps": steps, "block": block,
                            "temperature": 0.0, "batch": n_text},
        "exact_seconds": round(exact_dt, 4),
        "agreement_min": AGREEMENT_MIN,
        "sweep": [],
    }
    best = None
    for tau in TAUS:
        fn = jax.jit(
            lambda m, p, t=tau: m.generate(
                p, gen_length=gen_len, steps=steps, block_length=block,
                temperature=0.0, parallel_threshold=t,
            )
        )
        out, dt = timed(fn, prompt)
        agree = float(
            (out[:, prompt_len:] == exact[:, prompt_len:]).mean()
        )
        entry = {
            "tau": tau,
            "agreement": round(agree, 4),
            "seconds": round(dt, 4),
            "speedup_vs_exact": round(exact_dt / max(dt, 1e-9), 3),
        }
        report["sweep"].append(entry)
        logger.info("tau=%.2f agreement=%.4f speedup=%.2fx",
                    tau, agree, entry["speedup_vs_exact"])
        if agree >= AGREEMENT_MIN and (
            best is None
            or entry["speedup_vs_exact"] > best["speedup_vs_exact"]
        ):
            best = entry
    report["recommended"] = best
    report["promote_parallel"] = best is not None
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"recommended": best,
                      "promote_parallel": report["promote_parallel"]}))
    logger.info("wrote %s", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
