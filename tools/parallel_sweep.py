"""Confidence-parallel decoding quality sweep on a trained checkpoint.

`parallel_threshold=τ` commits every position whose confidence exceeds τ
each step (plus block early-exit) — measured 1056 tok/s full-commit
ceiling on random weights (BASELINE.md round-2c), but its REALIZED
speedup and its quality are data-dependent: both need a model with real
margins. This sweeps τ on the SHARED gate decode inputs
(quant_gate.gate_decode_inputs: BOS-framed mid-sentence bank prefixes +
GATE_TEXT_OP) and scores each τ TRUTH-ANCHORED: accuracy on the known
training-time continuation (data/synthetic.gate_text_truth), relative
to the exact sampler's own truth accuracy. Raw agreement-vs-exact over
the full gen window is also recorded but NOT gated on — past the
determinable span the exact sampler's output is intrinsic entropy, and
any step-order change flips it (round-3 artifact: τ=0.9 "agreement"
0.56 on a proxy whose memorized-span completion was exact).

Recommendation: largest realized speedup whose truth accuracy is within
0.01 of exact's, provided exact itself memorized the bank (>= 0.5).

    python tools/parallel_sweep.py ckpt=proxy-output-d/export \
        config=proxy-output-d/config.yaml out=PARALLEL_r03.json

`warmup=1` sweeps the (τ, parallel_warmup_steps) grid instead: the
plain-τ demotion's damage concentrates in the EARLY steps of a block
(most positions masked, confidence least calibrated — same mechanism
the kv refresh sweep exposed, BASELINE.md round-3r), so delaying the
threshold K steps may keep the late-block batch commits (the speed)
while skipping the unreliable early ones (the damage).

    python tools/parallel_sweep.py warmup=1 ckpt=proxy-output-d/export \
        config=proxy-output-d/config.yaml out=PARALLEL_WARMUP_r03.json
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # quant_gate

logger = logging.getLogger("parallel_sweep")

TAUS = (0.95, 0.9, 0.8, 0.7, 0.5)
TRUTH_SLACK = 0.01
BANK_MEMORIZED_MIN = 0.5


def main(argv):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    out_path = args.get("out", "PARALLEL_r03.json")

    import jax

    if args.get("cpu") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from quant_gate import (GATE_TEXT_BATCH, GATE_TEXT_OP,
                        GATE_TEXT_PROMPT_LEN)
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
    prompting = build_prompting(ycfg, tokenizer, vocab)

    cfg = config_from_hf_json(ckpt)
    params = load_pretrained(ckpt, cfg, dtype=jnp.bfloat16)
    model = MMadaModel(cfg=cfg, params=params, vocab=vocab, policy=BF16)

    n_text, prompt_len = GATE_TEXT_BATCH, GATE_TEXT_PROMPT_LEN
    prompt = jnp.asarray(synthetic.gate_decode_prompt_rows(
        tokenizer, prompting.sp.bos, n=n_text,
        prompt_len=prompt_len, start=0,
    ), jnp.int32)
    truths = synthetic.require_truth(synthetic.gate_text_truth(
        tokenizer, prompting.sp.bos, n=n_text,
        prompt_len=prompt_len, start=0,
    ), "parallel sweep")

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
        lambda m, p: m.generate(p, temperature=0.0, **GATE_TEXT_OP)
    )
    exact, exact_dt = timed(exact_fn, prompt)
    exact_truth = synthetic.truth_accuracy(exact[:, prompt_len:], truths)
    bank_ok = exact_truth is not None and exact_truth >= BANK_MEMORIZED_MIN

    report = {
        "checkpoint": ckpt,
        "operating_point": {"prompt": prompt_len, "batch": n_text,
                            "temperature": 0.0, **GATE_TEXT_OP},
        "exact_seconds": round(exact_dt, 4),
        "exact_truth_acc": round(exact_truth, 4),
        "bank_memorized": bool(bank_ok),
        "truth_slack": TRUTH_SLACK,
        "sweep": [],
    }
    if args.get("warmup") == "1":
        grid = [(t, w) for t in (0.9, 0.95) for w in (1, 2, 4, 8)]
    else:
        grid = [(t, 0) for t in TAUS]
    best = None
    for tau, warm in grid:
        fn = jax.jit(
            lambda m, p, t=tau, w=warm: m.generate(
                p, temperature=0.0, parallel_threshold=t,
                parallel_warmup_steps=w, **GATE_TEXT_OP,
            )
        )
        out, dt = timed(fn, prompt)
        gen = out[:, prompt_len:]
        truth_acc = synthetic.truth_accuracy(gen, truths)
        agree = float((gen == exact[:, prompt_len:]).mean())
        entry = {
            "tau": tau,
            **({"warmup_steps": warm} if args.get("warmup") == "1" else {}),
            "truth_acc": round(truth_acc, 4),
            "agreement": round(agree, 4),
            "seconds": round(dt, 4),
            "speedup_vs_exact": round(exact_dt / max(dt, 1e-9), 3),
        }
        report["sweep"].append(entry)
        logger.info("tau=%.2f warmup=%d truth=%.4f agreement=%.4f "
                    "speedup=%.2fx", tau, warm, truth_acc, agree,
                    entry["speedup_vs_exact"])
        if (bank_ok and truth_acc >= exact_truth - TRUTH_SLACK and (
            best is None
            or entry["speedup_vs_exact"] > best["speedup_vs_exact"]
        )):
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
