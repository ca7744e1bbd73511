"""Quantization quality report: bf16 vs int8 vs W8A8 on a given checkpoint.

Decides whether the faster W8A8 path (BASELINE.md: +36% t2i / +68% text on
one chip) is quality-safe for a given model. Reports, per scheme:

  * per-weight-kind quantize→dequantize relative L2 error;
  * end-to-end logit relative error vs the bf16 forward;
  * greedy top-1 token agreement (the quantity samplers actually consume).

    python tools/quant_report.py config=configs/mmada_demo.yaml \
        [prompt_len=512] [batch=2] [seed=0]

Tiny/random mode (no checkpoint configured) exercises the full report
path; real-weight numbers are the ones that matter for the serving
decision.
"""

import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

logger = logging.getLogger(__name__)


def main(argv):
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmada_tpu.core.config import load_config
    from mmada_tpu.models import llada
    from mmada_tpu.ops import quantization as Q
    from mmada_tpu.serve.loader import build_model, build_vocab

    cfg = load_config(cli_args=argv)
    try:
        prompt_len = int(cfg.get("prompt_len", 512))
        batch = int(cfg.get("batch", 2))
        seed = int(cfg.get("seed", 0))
    except (TypeError, ValueError):
        logger.error("prompt_len / batch / seed must be integers")
        return 2

    vocab = build_vocab(cfg)
    model = build_model(cfg, vocab)
    report = {"model": f"{model.cfg.n_layers}L d={model.cfg.d_model}"}

    # ---------------------------------------- per-weight-kind roundtrip
    kinds = {}
    for name, w in model.params["blocks"].items():
        if name in Q.QUANT_TARGETS:
            kinds[name] = Q.quantization_error(w)
    if "ff_out" in model.params:
        kinds["head"] = Q.quantization_error(model.params["ff_out"])
    report["per_kind_rel_l2"] = {k: round(v, 5) for k, v in kinds.items()}

    # ------------------------------------------------ end-to-end logits
    key = jax.random.key(seed)
    ids = jax.random.randint(
        key, (batch, prompt_len), 3, vocab.text_vocab_size - 1, jnp.int32
    )

    def forward_with(params):
        def fn(m_params):
            return llada.forward(
                m_params, model.cfg, ids, policy=model.policy
            ).astype(jnp.float32)
        return jax.jit(fn)(params)

    ref = forward_with(model.params)
    ref_top1 = jnp.argmax(ref, -1)
    ref_norm = jnp.maximum(jnp.linalg.norm(ref), 1e-9)

    for scheme, kwargs in (
        ("int8", {}),
        ("w8a8", {"activations": True}),
    ):
        qparams = Q.quantize_llada_params(model.params, **kwargs)
        out = forward_with(qparams)
        rel = float(jnp.linalg.norm(out - ref) / ref_norm)
        agree = float(jnp.mean(jnp.argmax(out, -1) == ref_top1))
        report[scheme] = {
            "logit_rel_l2": round(rel, 5),
            "top1_agreement": round(agree, 4),
        }
        del qparams, out

    print(json.dumps(report, indent=2))
    # the serving decision in one line — control-relative, matching the
    # promotion policy (tools/quant_gate.ckpt_promotion_checks): near-tied
    # logits flip under any perturbation, so w8a8 is judged against the
    # int8 control, not an absolute bar it could fail on sampling noise.
    # (This is a forward-only screen; the full gate also checks decode
    # agreement and margin-confident top-1 — run tools/quant_gate.py
    # ckpt=... for a promote/demote decision.)
    w8a8_ok = (report["w8a8"]["top1_agreement"]
               >= report["int8"]["top1_agreement"] - 0.01)
    print(f"# w8a8 forward screen vs int8 control: {w8a8_ok} "
          f"(w8a8 {report['w8a8']['top1_agreement']} >= "
          f"int8 {report['int8']['top1_agreement']} - 0.01); "
          f"full promote/demote decision: tools/quant_gate.py ckpt mode",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
