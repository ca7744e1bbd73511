"""Composed fast-stack truth gate (text family) on a trained checkpoint.

The per-knob sweeps (kv_refresh_sweep, parallel_sweep warmup=1) measure
each quality-restoring knob alone; deployments run them TOGETHER. This
gate scores the composed arms against the known training-time truth on
the shared gate inputs — the instrument behind COMPOSED_FAST_r03.json
(BASELINE.md round-3u: kv full-freeze + τ+warmup FAILS 0.8804, while
kv refresh=4 + τ=0.9 + warmup=8 passes 0.9116), now a committed tool
instead of an ad-hoc script so a retrained gate checkpoint can
regenerate the artifact:

    python tools/composed_fast_gate.py ckpt=proxy-output-d/export \
        config=proxy-output-d/config.yaml out=COMPOSED_FAST_r03.json

Arms (refresh/warmup values are the round-3u re-powered operating
points; the solo refresh arm cross-checks KV_REFRESH's verdict on the
same decode):
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # quant_gate

logger = logging.getLogger("composed_fast_gate")

TRUTH_SLACK = 0.01
BANK_MEMORIZED_MIN = 0.5

# (name, generate() kwargs) — the composed deployment candidates
ARMS = [
    ("kv_refresh4", dict(block_kv_cache=True, cache_refresh_every=4)),
    ("tau09_warm8", dict(parallel_threshold=0.9, parallel_warmup_steps=8)),
    ("kv_freeze_tau09_warm8",
     dict(block_kv_cache=True, parallel_threshold=0.9,
          parallel_warmup_steps=8)),
    ("kv_refresh4_tau09_warm8",
     dict(block_kv_cache=True, cache_refresh_every=4,
          parallel_threshold=0.9, parallel_warmup_steps=8)),
]


def main(argv):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    out_path = args.get("out", "COMPOSED_FAST_r03.json")

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
    ), "composed fast gate")

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
        lambda m, p: m.generate(p, temperature=0.0, **GATE_TEXT_OP))
    exact, exact_dt = timed(exact_fn, prompt)
    exact_truth = synthetic.truth_accuracy(exact[:, prompt_len:], truths)
    bank_ok = exact_truth is not None and exact_truth >= BANK_MEMORIZED_MIN

    gen_len = GATE_TEXT_OP["gen_length"]
    n_scorable = int(sum(min(t.size, gen_len) for t in truths
                         if t is not None and t.size))
    report = {
        "checkpoint": ckpt,
        "sample": f"{n_text} rows / ~{n_scorable} truth positions",
        "operating_point": {"prompt": prompt_len, "batch": n_text,
                            "temperature": 0.0, **GATE_TEXT_OP},
        "exact_truth_acc": round(exact_truth, 4),
        "exact_seconds": round(exact_dt, 4),
        "bank_memorized": bool(bank_ok),
        "truth_slack": TRUTH_SLACK,
        "arms": [],
    }
    for name, kw in ARMS:
        fn = jax.jit(
            lambda m, p, kw=dict(kw): m.generate(
                p, temperature=0.0, **kw, **GATE_TEXT_OP))
        out, dt = timed(fn, prompt)
        truth_acc = synthetic.truth_accuracy(out[:, prompt_len:], truths)
        entry = {
            "arm": name, **{k: (v if not isinstance(v, bool) else bool(v))
                            for k, v in kw.items()},
            "truth_acc": round(truth_acc, 4),
            "agreement_vs_exact": round(float(
                (out[:, prompt_len:] == exact[:, prompt_len:]).mean()), 4),
            "seconds": round(dt, 4),
            "speedup_vs_exact": round(exact_dt / max(dt, 1e-9), 3),
            "promote": bool(bank_ok
                            and truth_acc >= exact_truth - TRUTH_SLACK),
        }
        report["arms"].append(entry)
        logger.info("%s truth=%.4f agree=%.4f %.2fx promote=%s", name,
                    truth_acc, entry["agreement_vs_exact"],
                    entry["speedup_vs_exact"], entry["promote"])
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"arms": [
        {k: a[k] for k in ("arm", "truth_acc", "speedup_vs_exact", "promote")}
        for a in report["arms"]]}))
    logger.info("wrote %s", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
