"""Truth-anchored MMU (image→text) gate on a trained checkpoint.

The round-3q kv/parallel demotions were measured on TEXT decode, where
out-of-block K/V belong to evolving generated blocks. MMU is the
family where the block-KV cache wins biggest (5.4× lower p50,
BASELINE.md round-2c) AND where its approximation should be mildest:
the out-of-block region is dominated by the STATIC image frame — its
tokens never change; only their attention responses to the short
revealed answer drift. This gate measures that directly.

Frame = `<|mmu|> <|soi|> codes <|eoi|> <bos>` (the training mmu frame,
prompting/universal.py mmu(), through the app's serving layout); truth =
the pattern's training caption + EOS (data/synthetic.caption_for — the
mmu flow memorizes image→caption; campaign D trained it to loss ~2e-5).
Arms: exact, kv (fp32 + int8 cache), kv refresh=2 (spb=8 here), τ=0.9 parallel with
warmup 0/2, and the composed stack. Promotion per arm: truth accuracy
within 0.01 of exact's, with the bank-memorized instrument check.

    python tools/mmu_truth_gate.py ckpt=proxy-output-d/export \
        config=proxy-output-d/config.yaml out=MMU_GATE_r03.json
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

logger = logging.getLogger("mmu_truth_gate")

GATE_MMU_OP = {"max_new_tokens": 32, "steps": 16, "block_length": 16}
TRUTH_SLACK = 0.01
BANK_MEMORIZED_MIN = 0.5


def main(argv):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    out_path = args.get("out", "MMU_GATE_r03.json")

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
    from mmada_tpu.models import magvit2
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.serve.loader import (
        build_prompting, build_text_tokenizer, build_vocab, build_vq_model,
    )

    ckpt = args["ckpt"]
    ycfg = load_config(args.get("config", "configs/proxy_160m.yaml"))
    tokenizer = build_text_tokenizer(ycfg)
    vocab = build_vocab(ycfg)
    prompting = build_prompting(ycfg, tokenizer, vocab)
    sp = prompting.sp

    cfg = config_from_hf_json(ckpt)
    params = load_pretrained(ckpt, cfg, dtype=jnp.bfloat16)
    model = MMadaModel(cfg=cfg, params=params, vocab=vocab, policy=BF16)

    # frames: the serving-layout mmu prefix for the first n training
    # patterns, VQ codes through the config's (seed-deterministic) encoder
    n = int(args.get("n", 16))  # 16 captions + EOS ≈ 370 truth positions
    res = int(ycfg.get_path("dataset.preprocessing.resolution", 512))
    vq_params, vq_cfg = build_vq_model(ycfg)
    pats = np.stack([synthetic.pattern_image(k, res) for k in range(n)])
    # encode in chunks of 8: the VQ encoder's full-resolution activations
    # are ~0.5 GB per image on-device — one n=32 batch RESOURCE_EXHAUSTED
    # the 16 GB chip (round-5 pipeline, first mmu_gate attempt)
    codes = np.concatenate([
        np.asarray(magvit2.get_code(vq_params, vq_cfg,
                                    jnp.asarray(pats[i:i + 8])))
        for i in range(0, n, 8)
    ])
    fused = codes + vocab.image_offset
    frames = np.concatenate([
        np.full((n, 1), sp.mmu), np.full((n, 1), sp.soi), fused,
        np.full((n, 1), sp.eoi), np.full((n, 1), sp.bos),
    ], axis=1).astype(np.int32)
    frames = jnp.asarray(frames)
    plen = frames.shape[1]
    # truth: the training caption + EOS (mmu frames pad with in-loss EOS,
    # so the post-caption window is determinable too — we score the
    # caption + one EOS, the conservative span)
    truths = synthetic.require_truth([
        np.asarray(tokenizer([synthetic.caption_for(k)])["input_ids"][0]
                   + [sp.eos], np.int64)
        for k in range(n)
    ], "mmu truth gate")

    def sync(x):
        return int(jax.device_get(jnp.asarray(x).sum()))

    def timed(make_kw):
        fn = jax.jit(lambda m, p, kw=make_kw: m.mmu_generate(
            p, temperature=0.0, **GATE_MMU_OP, **kw))
        out = fn(model, frames)
        sync(out)  # compile + warm
        t0 = time.perf_counter()
        out = fn(model, frames)
        sync(out)
        return np.asarray(out), time.perf_counter() - t0

    exact, e_dt = timed({})
    e_truth = synthetic.truth_accuracy(exact[:, plen:], truths)
    bank_ok = e_truth is not None and e_truth >= BANK_MEMORIZED_MIN

    report = {
        "checkpoint": ckpt,
        "operating_point": {"prefix_len": int(plen), "batch": n,
                            "temperature": 0.0, **GATE_MMU_OP},
        "truth_span": "training caption + EOS",
        "exact_seconds": round(e_dt, 4),
        "exact_truth_acc": round(e_truth, 4),
        "bank_memorized": bool(bank_ok),
        "truth_slack": TRUTH_SLACK,
        "arms": [],
    }
    ARMS = [
        ("kv_cache", dict(block_kv_cache=True)),
        ("kv_cache_int8", dict(block_kv_cache="int8")),
        ("kv_refresh2", dict(block_kv_cache=True, cache_refresh_every=2)),
        ("parallel_tau0.9", dict(parallel_threshold=0.9)),
        ("parallel_tau0.9_warmup2",
         dict(parallel_threshold=0.9, parallel_warmup_steps=2)),
        ("kv_parallel_warmup2",
         dict(block_kv_cache=True, parallel_threshold=0.9,
              parallel_warmup_steps=2)),
    ]
    for name, kw in ARMS:
        out, dt = timed(kw)
        gen = out[:, plen:]
        t = synthetic.truth_accuracy(gen, truths)
        entry = {
            "arm": name,
            "truth_acc": round(t, 4),
            "agreement_vs_exact": round(
                float((gen == exact[:, plen:]).mean()), 4),
            "seconds": round(dt, 4),
            "speedup_vs_exact": round(e_dt / max(dt, 1e-9), 3),
            "promote": bool(bank_ok and t >= e_truth - TRUTH_SLACK),
        }
        report["arms"].append(entry)
        logger.info("%s: truth=%.4f agreement=%.4f %.2fx promote=%s",
                    name, t, entry["agreement_vs_exact"],
                    entry["speedup_vs_exact"], entry["promote"])
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"exact_truth_acc": report["exact_truth_acc"],
                      "promotions": {a["arm"]: a["promote"]
                                     for a in report["arms"]}}))
    logger.info("wrote %s", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
