"""W8A8 promotion gate: blind decode-agreement vs bf16 at flagship dims.

Round-1 measured W8A8 (+36% t2i / +68% text on one chip, BASELINE.md) but
left it quality-ungated. This gate produces the decision artifact
(QUANT_r{N}.json) that bench.py consults for its headline scheme:

  Phase A (half depth, FULL flagship width: d4096/H32/mlp12288/134,656
  vocab, 16 layers — bf16 at full 32L is 16.2 GB and cannot co-reside with
  its quantized copy on a 16 GB chip):
    * bf16 reference: forward logits, greedy semi-AR text decode, greedy
      MaskGIT t2i decode (all fixed-seed random weights/prompts);
    * int8 (weight-only) and W8A8 (same int8 values — the W8A8Tensor is a
      zero-copy view; it differs only by per-token activation quantization
      on the int8 MXU): same outputs, compared token-for-token vs bf16.
  Phase B (FULL 32-layer depth): int8 vs W8A8 decode agreement — the
    activation-quantization marginal at real depth (bf16 ref impossible
    on one chip).

Promotion rule (recorded in the artifact):
  promote W8A8  iff  forward top-1 agreement vs bf16 >= 0.99 (half depth)
             AND its decode agreements are within 0.01 of int8's
             (int8 is the shipping headline; W8A8 must not be worse)
             AND full-depth W8A8-vs-int8 decode agreement >= 0.99.

Trained-checkpoint promotion rule (ckpt mode, revised twice):
  r3 revision 1: the absolute >= 0.99 top-1 bar binds on MARGIN-CONFIDENT
positions (bf16 top-1 margin > 0.05); raw top-1 over all positions is
gated relative to the int8 control, because near-tied logits flip under
ANY perturbation. The forward sample is 768 in-distribution positions
(data/synthetic.gate_forward_ids, shared with tools/real_weight_harness.py
so the two artifacts can never disagree by sampling noise).
  r3 revision 2 (TRUTH-ANCHORED decode checks): decode quality is scored
against the KNOWN training-time continuation / pattern VQ codes
(gate_truth_targets) instead of raw agreement-vs-bf16 over the whole gen
window. Raw agreement conflates quantization damage with intrinsic
entropy: a text-capable proxy generates genuinely-random content past
the determinable span (the next packed sentence's digits), where argmax
flips under any perturbation — campaign B "passed" raw agreement only
because its degenerate all-EOS output agreed trivially; campaign C
"failed" at 0.54 while completing the memorized span exactly. Real-weight
runs (no truth bank) keep the agreement-based checks — the policy
function branches on the truth keys' presence.

Random weights are the only option in this zero-egress environment; they
are harsher than trained weights for argmax agreement (near-tied logits
flip under any perturbation), so margin-filtered agreement (positions
where the bf16 top-1 margin exceeds 0.05) is also recorded.

Usage:
    python tools/quant_gate.py out=QUANT_r02.json          # on the TPU chip
    python tools/quant_gate.py tiny=1 out=/tmp/q.json      # CPU harness test

Trained-checkpoint mode (round 3+): a model trained on the structured
synthetic flows (configs/proxy_160m.yaml) has SEPARATED top-1 margins, so
decode agreement becomes a real promote/demote signal — unlike the random
proxies above. Prompts come from the training distribution (the synthetic
sentence/pattern banks through the exact training-time prompting):

    python tools/quant_gate.py ckpt=proxy-output/export \
        config=configs/proxy_160m.yaml out=QUANT_r03.json
"""

import gc
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

logger = logging.getLogger("quant_gate")

MARGIN = 0.05
FWD_THRESHOLD = 0.99
DECODE_SLACK = 0.01
FULLDEPTH_THRESHOLD = 0.99


def _residual_scale(n_layers: int) -> float:
    """GPT-2-style residual scaling: trained transformers keep the residual
    stream's scale roughly constant with depth; unscaled std-0.02 random
    weights at d_model 4096 grow activations ~2.5x per matmul, which
    amplifies quantization error geometrically and makes every scheme
    (including the shipping int8) fail argmax agreement — an artifact of
    the proxy, not of quantization. Scaling attn_out/ff_out by 1/sqrt(2L)
    makes the random proxy depth-realistic."""
    import numpy as np

    return float(1.0 / np.sqrt(2.0 * n_layers))


def _build_bf16(key, cfg):
    import jax
    import jax.numpy as jnp

    from mmada_tpu.models import llada

    scale = _residual_scale(cfg.n_layers)

    def build(k):
        p = llada.init_params(k, cfg, dtype=jnp.bfloat16)
        blocks = dict(p["blocks"])
        for name in ("attn_out", "ff_out"):
            blocks[name] = (blocks[name].astype(jnp.float32) * scale
                            ).astype(jnp.bfloat16)
        return dict(p, blocks=blocks)

    return jax.jit(build)(key)


def _quantize_destructive(params):
    """Per-kind, per-layer quantization that frees each bf16 weight as its
    int8 replacement lands — peak HBM stays ~(bf16 total + one layer f32)
    instead of (bf16 + int8) totals."""
    import jax

    from mmada_tpu.ops import quantization as Q

    out = dict(params)
    blocks = dict(params["blocks"])
    per_layer = jax.jit(lambda w: jax.lax.map(Q.quantize_tensor, w))
    for name in Q.QUANT_TARGETS:
        if name in blocks:
            q = per_layer(blocks[name])
            blocks[name] = q  # drops the bf16 buffer
            gc.collect()
    out["blocks"] = blocks
    if "ff_out" in params:
        out["ff_out"] = jax.jit(Q.quantize_tensor)(params["ff_out"])
    return out


def _build_int8_direct(key, cfg):
    """Full-depth build: sample bf16-scale weights per layer and quantize
    inside a lax.map, so the f32 source never materializes beyond one layer
    (full-depth bf16 at 16.2 GB cannot exist on the chip at all)."""
    import jax
    import jax.numpy as jnp

    from mmada_tpu.models import llada
    from mmada_tpu.ops import quantization as Q

    shapes = jax.eval_shape(
        lambda k: llada.init_params(k, cfg, dtype=jnp.bfloat16), key
    )
    std = 0.02
    res_scale = _residual_scale(cfg.n_layers)

    def build_leaf(path, s):
        path_str = "/".join(str(p) for p in path)
        lk = jax.random.fold_in(key, abs(hash(path_str)) % (2**31))
        is_quant_kind = any(f"'{t}'" in path_str for t in Q.QUANT_TARGETS)
        leaf_std = std * (
            res_scale
            if ("'attn_out'" in path_str
                or ("'ff_out'" in path_str and "blocks" in path_str))
            else 1.0
        )
        if "norm" in path_str or "ln_f" in path_str:
            return jax.jit(lambda: jnp.ones(s.shape, s.dtype))()
        if not is_quant_kind or "wte" in path_str:
            return jax.jit(
                lambda k: (jax.random.normal(k, s.shape, jnp.float32) * leaf_std
                           ).astype(jnp.bfloat16)
            )(lk)
        if len(s.shape) == 3:  # layer-stacked block weight
            lkeys = jax.random.split(lk, s.shape[0])
            return jax.jit(lambda ks: jax.lax.map(
                lambda kk: Q.quantize_tensor(
                    jax.random.normal(kk, s.shape[1:], jnp.float32) * leaf_std
                ), ks
            ))(lkeys)
        return jax.jit(lambda kk: Q.quantize_tensor(
            jax.random.normal(kk, s.shape, jnp.float32) * leaf_std
        ))(lk)

    leaves = []
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    for path, s in flat:
        leaves.append(build_leaf(path, s))
        gc.collect()
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _w8a8_view(params):
    """Zero-copy: reuse the int8 values/scales under W8A8 semantics."""
    import jax

    from mmada_tpu.ops.quantization import QuantizedTensor, W8A8Tensor

    return jax.tree.map(
        lambda x: W8A8Tensor(values=x.values, scales=x.scales)
        if isinstance(x, QuantizedTensor) else x,
        params,
        is_leaf=lambda x: isinstance(x, QuantizedTensor),
    )


def ckpt_promotion_checks(report, name,
                          fwd_threshold=None, slack=None):
    """Trained-checkpoint promotion bar for one quantization arm.

    Module-level (not nested in run_ckpt_gate) so tests can pin the
    policy: the absolute >= 0.99 top-1 bar binds on MARGIN-CONFIDENT
    positions; raw top-1 and both decode agreements are relative to the
    int8 control (near-tied logits flip under any perturbation — the
    int8 control itself measures ~0.98 raw on a trained proxy, so an
    absolute raw bar is unsatisfiable even for the scheme it protects).
    tools/real_weight_harness.py applies the identical rule.
    """
    fwd_threshold = FWD_THRESHOLD if fwd_threshold is None else fwd_threshold
    slack = DECODE_SLACK if slack is None else slack
    checks = {
        "forward_margin_top1_ok":
            report[name]["forward_top1_agreement_margin"] >= fwd_threshold,
        "forward_top1_not_worse_than_int8":
            report[name]["forward_top1_agreement"]
            >= report["int8"]["forward_top1_agreement"] - slack,
        "margins_separated":
            report["margin_stats"]["confident_fraction_at_0.05"] >= 0.5,
    }
    if "text_decode_truth_acc" in report[name]:
        # TRUTH-ANCHORED decode checks (trained-proxy mode): each arm's
        # generated tokens are scored against the KNOWN training-time
        # continuation / pattern VQ codes (gate_truth_targets), so the
        # quantity is quality-preservation on determinable positions.
        # Raw agreement-vs-bf16 is blind to the distinction between
        # quantization damage and intrinsic entropy: campaign B "passed"
        # only because its degenerate all-EOS output agreed trivially,
        # and campaign C "failed" at 0.54 while completing the memorized
        # span exactly.
        checks.update({
            "text_truth_not_worse_than_int8":
                report[name]["text_decode_truth_acc"]
                >= report["int8"]["text_decode_truth_acc"] - slack,
            "t2i_truth_not_worse_than_int8":
                report[name]["t2i_decode_truth_acc"]
                >= report["int8"]["t2i_decode_truth_acc"] - slack,
            # the shipping control must preserve what bf16 knows
            "int8_control_preserves_truth":
                report["int8"]["text_decode_truth_acc"]
                >= report["bf16"]["text_decode_truth_acc"] - 5 * slack
                and report["int8"]["t2i_decode_truth_acc"]
                >= report["bf16"]["t2i_decode_truth_acc"] - 5 * slack,
            # the instrument needs signal: bf16 itself must beat chance
            # by a wide margin on the truth spans (char chance ~0.04,
            # code chance ~1/8192)
            "bank_memorized":
                report["bf16"]["text_decode_truth_acc"] >= 0.5
                and report["bf16"]["t2i_decode_truth_acc"] >= 0.7,
        })
    else:
        # real-weight mode: no truth bank — agreement-relative checks
        checks.update({
            "text_decode_not_worse_than_int8":
                report[name]["text_decode_agreement"]
                >= report["int8"]["text_decode_agreement"] - slack,
            "t2i_decode_not_worse_than_int8":
                report[name]["t2i_decode_agreement"]
                >= report["int8"]["t2i_decode_agreement"] - slack,
            "int8_control_decodes_cleanly":
                report["int8"]["text_decode_agreement"] >= 0.95,
        })
    return checks


# Shared text-decode operating point: batch 8 x gen 64 = 512 decode
# positions, so the 0.01 decode slack is not single-flip granularity
# (same lesson as the 768-position forward sample).
GATE_TEXT_OP = {"gen_length": 64, "steps": 32, "block_length": 32}
# 32 prompt rows x ~23 determinable positions ≈ 740 scorable text truth
# positions (was 8 rows / 184: a 0.01 slack was ~2-token granularity —
# the round-3 review's statistical-power concern). Campaign D memorized
# ALL 64 bank sentences (loss_lm 0.0096), so every row is informative.
GATE_TEXT_BATCH = 32
# 40 BOS-framed tokens: into the sentence's content words, where the
# trained proxy's continuation is deterministic (at 24 the completion
# depends on digit->content-word recall — the model's weak skill — and
# bf16 itself scored 0.17, making the instrument mostly noise)
GATE_TEXT_PROMPT_LEN = 40


def gate_decode_inputs(tokenizer, prompting, vocab, num_vq, n_t2i=2):
    """Shared decode-agreement inputs: (text_prompt 8x40 BOS-framed, t2i
    frame, t2i uncond). quant_gate ckpt mode and the real-weight harness
    drive the SAME greedy samplers on the SAME inputs (plus
    GATE_TEXT_OP), so for deterministic schemes the two artifacts compare
    token-identical quantities — round 3 observed different decode
    samples flip a boundary arm's verdict between the tools. Prompt rows
    are BOS-framed mid-sentence prefixes whose continuation the training
    data determines (gate_decode_prompt_rows; truth spans from
    gate_text_truth), fill-and-truncate for short subword tokenizations,
    never ragged."""
    import numpy as np

    from mmada_tpu.data import synthetic

    text_prompt = synthetic.gate_decode_prompt_rows(
        tokenizer, prompting.sp.bos, n=GATE_TEXT_BATCH,
        prompt_len=GATE_TEXT_PROMPT_LEN, start=0
    )
    captions = [synthetic.caption_for(k) for k in range(n_t2i)]
    masked = np.full((n_t2i, num_vq), vocab.mask_token_id, np.int64)
    frame, _ = prompting((captions, masked), "t2i_gen")
    uncond, _ = prompting.t2i_gen_uncond(n_t2i, num_vq, vocab.mask_token_id)
    return (np.asarray(text_prompt, np.int64), np.asarray(frame),
            np.asarray(uncond))


def smooth_calibration(tokenizer, prompting, vocab, num_vq):
    """Shared SmoothQuant calibration prompts (text batch + forward grid +
    t2i frame). The smooth arms are CALIBRATION-DEPENDENT — scale
    migration is computed from activation stats — so quant_gate ckpt mode
    and the real-weight harness must build their smooth-quantized params
    from the SAME prompts, or identical weights can yield different
    quantized models and different promote verdicts (observed in round 3:
    a text-only harness calibration promoted the arm the balanced
    calibration demoted). Deterministic schemes (int8/w8a8/int4) need no
    such sharing."""
    import numpy as np

    from mmada_tpu.data import synthetic

    text_prompt, frame, _ = gate_decode_inputs(
        tokenizer, prompting, vocab, num_vq
    )
    fwd = synthetic.gate_forward_ids(tokenizer)
    return [text_prompt, np.asarray(fwd), np.asarray(frame)]


def gate_truth_targets(tokenizer, prompting, vocab, yaml_cfg, n_t2i=2):
    """Ground truth for the decode gates (trained-proxy mode only).

    The synthetic bank is deterministic, so the gates can score each
    arm's output against what the training data DETERMINES rather than
    against the bf16 output token-for-token: the text truth is the rest
    of the prompt row's sentence plus the packed-flow separator " story"
    (data/synthetic.gate_text_truth), and the t2i truth is the VQ code
    grid of the captioned pattern image through the configured encoder
    (build_vq_model is seed-deterministic). Raw agreement over a full
    gen window conflates quantization damage with intrinsic entropy at
    boundary positions, where near-tied logits flip under ANY
    perturbation — campaign C measured int8 raw text agreement 0.54 on
    a model whose memorized-span completion was exact. Real-weight runs
    have no truth bank; they keep the agreement-based checks
    (ckpt_promotion_checks falls back when truth keys are absent).
    """
    import jax.numpy as jnp
    import numpy as np

    from mmada_tpu.data import synthetic
    from mmada_tpu.models import magvit2
    from mmada_tpu.serve.loader import build_vq_model

    truths = synthetic.require_truth(synthetic.gate_text_truth(
        tokenizer, prompting.sp.bos, n=GATE_TEXT_BATCH,
        prompt_len=GATE_TEXT_PROMPT_LEN, start=0,
    ), "quant gate (ckpt mode)")
    res = int(yaml_cfg.get_path("dataset.preprocessing.resolution", 512))
    vq_params, vq_cfg = build_vq_model(yaml_cfg)
    pats = np.stack([synthetic.pattern_image(k, res)
                     for k in range(n_t2i)])
    codes = np.asarray(magvit2.get_code(vq_params, vq_cfg, jnp.asarray(pats)))
    return truths, codes


def _agreement(a, b):
    import numpy as np

    a, b = np.asarray(a), np.asarray(b)
    if a.size == 0:
        return 1.0  # vacuous (e.g. margin-filtered set empty on random init)
    return float((a == b).mean())


def run_ckpt_gate(args):
    """Trained-proxy gate: bf16 vs int8 vs W8A8 on a checkpoint whose
    greedy margins separate; in-distribution prompts. Applies the same
    promotion thresholds as the random-weight phases, now falsifiable."""
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmada_tpu.checkpoints.hf_import import (
        config_from_hf_json, load_pretrained,
    )
    from mmada_tpu.core.config import load_config
    from mmada_tpu.core.precision import BF16
    from mmada_tpu.core.vocab import MMADA_8B
    from mmada_tpu.data import synthetic
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.ops import quantization as Q
    from mmada_tpu.serve.loader import (
        build_prompting, build_text_tokenizer, build_vocab,
    )

    ckpt = args["ckpt"]
    out_path = args.get("out", "QUANT_r03.json")
    yaml_cfg = load_config(args.get("config", "configs/proxy_160m.yaml"))
    tokenizer = build_text_tokenizer(yaml_cfg)
    vocab = build_vocab(yaml_cfg)
    prompting = build_prompting(yaml_cfg, tokenizer, vocab)

    cfg = config_from_hf_json(ckpt)
    params = load_pretrained(ckpt, cfg, dtype=jnp.bfloat16)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    # in-distribution prompts — SHARED builders with the harness ---------
    num_vq = int(yaml_cfg.get_path("model.mmada.num_vq_tokens", 1024))
    text_prompt, frame, uncond = gate_decode_inputs(
        tokenizer, prompting, vocab, num_vq
    )
    text_prompt = jnp.asarray(text_prompt, jnp.int32)
    frame = jnp.asarray(frame, jnp.int32)
    uncond = jnp.asarray(uncond, jnp.int32)
    n_text, prompt_len = text_prompt.shape
    gen_len = GATE_TEXT_OP["gen_length"]
    steps = GATE_TEXT_OP["steps"]
    block = GATE_TEXT_OP["block_length"]
    # 16x48 = 768 in-distribution positions, shared with
    # tools/real_weight_harness.py stage 5 (same helper -> same quantity;
    # see gate_forward_ids docstring for the round-3 sampling-noise lesson)
    fwd_ids = jnp.asarray(synthetic.gate_forward_ids(tokenizer), jnp.int32)

    @jax.jit
    def run_text(model, prompt):
        return model.generate(prompt, temperature=0.0, **GATE_TEXT_OP)

    @jax.jit
    def run_t2i(model, f, u):
        return model.t2i_generate(
            f, uncond_input_ids=u, temperature=0.0, greedy=True,
            timesteps=15, guidance_scale=3.5, num_vq_tokens=num_vq,
            key=jax.random.key(0),
        )

    def sync(x):
        return float(jax.device_get(jnp.asarray(x).astype(jnp.float32).sum()))

    def drive(p, label):
        model = MMadaModel(cfg=cfg, params=p, vocab=vocab, policy=BF16)
        res = {}
        text = run_text(model, text_prompt)
        sync(text)
        t0 = _time.perf_counter()
        text = run_text(model, text_prompt)
        sync(text)
        res["text_tokens_per_s"] = round(
            n_text * gen_len / (_time.perf_counter() - t0), 2)
        res["text_tokens"] = np.asarray(text[:, prompt_len:])
        t2i = run_t2i(model, frame, uncond)
        sync(t2i)
        t0 = _time.perf_counter()
        t2i = run_t2i(model, frame, uncond)
        sync(t2i)
        res["t2i_images_per_s"] = round(
            2 / (_time.perf_counter() - t0), 4)
        res["t2i_tokens"] = np.asarray(t2i)
        res["logits"] = np.asarray(
            jax.jit(lambda m, i: m.forward(i))(model, fwd_ids)
            .astype(jnp.float32)
        )
        logger.info("%s: text %.1f tok/s, t2i %.3f img/s", label,
                    res["text_tokens_per_s"], res["t2i_images_per_s"])
        return res

    truth_text, truth_t2i = gate_truth_targets(
        tokenizer, prompting, vocab, yaml_cfg
    )

    bf16 = drive(params, "bf16")
    bf16["text_decode_truth_acc"] = round(
        synthetic.truth_accuracy(bf16["text_tokens"], truth_text), 4)
    bf16["t2i_decode_truth_acc"] = round(
        _agreement(bf16["t2i_tokens"], truth_t2i), 4)
    ref_logits = bf16.pop("logits")
    ref_top1 = ref_logits.argmax(-1)
    # np.partition(kth=-2): [-2] is the 2nd-largest, [-1] the max —
    # full sort of 768x134k fp32 logits is needlessly slow
    part = np.partition(ref_logits, -2, axis=-1)
    margins = part[..., -1] - part[..., -2]
    del part
    confident = margins > MARGIN
    ref_norm = max(float(np.linalg.norm(ref_logits)), 1e-9)

    def finish(res):
        # fold each arm's 768x134k fp32 logits (~413 MB) into its metrics
        # IMMEDIATELY — holding all six arms' logits until a final report
        # loop peaks ~2.9 GB host RAM for no reason
        logits = res.pop("logits")
        top1 = logits.argmax(-1)
        res["forward_logit_rel_l2"] = round(
            float(np.linalg.norm(logits - ref_logits)) / ref_norm, 5)
        res["forward_top1_agreement"] = round(_agreement(top1, ref_top1), 4)
        res["forward_top1_agreement_margin"] = round(
            _agreement(top1[confident], ref_top1[confident]), 4)
        res["text_decode_truth_acc"] = round(
            synthetic.truth_accuracy(res["text_tokens"], truth_text), 4)
        res["t2i_decode_truth_acc"] = round(
            _agreement(res["t2i_tokens"], truth_t2i), 4)
        res["text_decode_agreement"] = round(
            _agreement(res.pop("text_tokens"), bf16["text_tokens"]), 4)
        res["t2i_decode_agreement"] = round(
            _agreement(res.pop("t2i_tokens"), bf16["t2i_tokens"]), 4)
        return res

    qparams = Q.quantize_llada_params(params)
    int8 = finish(drive(qparams, "int8"))
    w8a8 = finish(drive(_w8a8_view(qparams), "w8a8"))
    del qparams
    gc.collect()
    # grouped int4 (ops/int4_matmul.py): the cached-decode bandwidth /
    # capacity scheme — same promotion bar as the other arms
    int4 = finish(drive(Q.quantize_llada_params(params, bits=4), "int4"))

    # SmoothQuant arms: migrate activation outliers into the weights
    # (ops/smoothquant.py), calibrated on the same in-distribution
    # prompts, then the identical W8A8 quantizer. Two alphas — 0.5 is
    # the paper default, 0.7 shifts more burden onto the (per-channel,
    # well-conditioned) weight quantizer.
    from mmada_tpu.ops import smoothquant as SQ

    calib = smooth_calibration(tokenizer, prompting, vocab, num_vq)
    sq_stats = SQ.collect_stats(params, cfg, calib, policy=BF16)
    smooth = {}
    for alpha in (0.5, 0.7):
        name = f"w8a8_smooth_a{alpha}"
        sq = SQ.smooth_quantize(params, cfg, calib, alpha=alpha,
                                stats=sq_stats)
        smooth[name] = finish(drive(sq, name))
        del sq
        gc.collect()
    report = {
        "mode": "trained_proxy_checkpoint",
        "checkpoint": ckpt,
        "params": n_params,
        "arch": f"{cfg.n_layers}L d{cfg.d_model} h{cfg.n_heads} "
                f"vocab {cfg.vocab_size}",
        "evidence_basis": (
            "165M flagship-trait proxy trained on-chip on the structured "
            "synthetic flows (configs/proxy_160m.yaml) until greedy "
            "margins separated; prompts drawn from the training "
            "distribution. Quantization error is architecture- and "
            "scale-dependent — re-confirm on real 8B weights via "
            "tools/real_weight_harness.py the day they mount."
        ),
        "operating_points": {
            "text": {"prompt": prompt_len, "gen": gen_len, "steps": steps,
                     "block": block, "temperature": 0.0},
            "t2i": {"timesteps": 15, "cfg": 3.5, "num_vq": num_vq,
                    "greedy": True},
        },
        "margin_stats": {
            "median_top1_margin": float(np.median(margins)),
            "mean_top1_margin": float(margins.mean()),
            "confident_fraction_at_0.05": float(confident.mean()),
        },
        "thresholds": {
            "forward_margin_top1_min": FWD_THRESHOLD,
            "forward_raw_vs_int8_slack": DECODE_SLACK,
            "truth_vs_int8_slack": DECODE_SLACK,
            "int8_control_vs_bf16_truth_slack": 5 * DECODE_SLACK,
            "bank_memorized_min": {"text": 0.5, "t2i": 0.7},
            "margin": MARGIN,
            "forward_sample_positions": int(confident.size),
        },
        "bf16": {"text_tokens_per_s": bf16["text_tokens_per_s"],
                 "t2i_images_per_s": bf16["t2i_images_per_s"],
                 "text_decode_truth_acc": bf16["text_decode_truth_acc"],
                 "t2i_decode_truth_acc": bf16["t2i_decode_truth_acc"]},
    }
    for name, res in (("int8", int8), ("w8a8", w8a8), ("int4", int4),
                      *smooth.items()):
        report[name] = dict(res)  # metrics already folded in by finish()
    # Every arm faces the SAME bar (ckpt_promotion_checks — module-level,
    # pinned by tests/test_quant_gate_policy.py).
    def _arm_checks(name):
        return ckpt_promotion_checks(report, name)

    checks = _arm_checks("w8a8")
    report["checks"] = checks
    report["promote_w8a8"] = all(checks.values())

    best_smooth = None
    for name in smooth:
        report[name]["checks"] = _arm_checks(name)
        report[name]["promote"] = all(report[name]["checks"].values())
        if report[name]["promote"]:
            score = (report[name]["text_decode_truth_acc"]
                     + report[name]["t2i_decode_truth_acc"])
            if best_smooth is None or score > best_smooth[1]:
                best_smooth = (name, score)

    # int4 faces the same bar; it never takes the speed headline (the
    # int4 win is CAPACITY only — measured 0.61x int8 cached-decode speed,
    # INT4_r03.json) — promote_int4 governs `quantize: int4` deployments.
    report["int4"]["checks"] = _arm_checks("int4")
    report["promote_int4"] = all(report["int4"]["checks"].values())

    if best_smooth:
        report["headline_scheme"] = "w8a8_smooth"
        report["headline_smooth_arm"] = best_smooth[0]
        report["promote_w8a8_smooth"] = True
    else:
        report["promote_w8a8_smooth"] = False
        report["headline_scheme"] = (
            "w8a8" if report["promote_w8a8"] else "int8"
        )

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(json.dumps({k: report[k] for k in
                      ("promote_w8a8", "promote_w8a8_smooth", "promote_int4",
                       "headline_scheme", "checks", "margin_stats")}))
    logger.info("wrote %s", out_path)
    return 0


def main(argv):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    if args.get("ckpt"):
        return run_ckpt_gate(args)
    out_path = args.get("out", "QUANT_r02.json")
    tiny = args.get("tiny") == "1"

    import jax
    import jax.numpy as jnp
    import numpy as np

    if tiny:
        jax.config.update("jax_platforms", "cpu")

    from mmada_tpu.core.vocab import MMADA_8B, tiny_layout
    from mmada_tpu.models import llada
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.core.precision import BF16

    if tiny:
        vocab = tiny_layout(text_vocab_size=256, image_codebook_size=64)
        dims = dict(d_model=64, n_heads=4, mlp_hidden_size=128)
        half_layers, full_layers = 2, 4
        text_prompt_len, gen_len, steps, block = 16, 16, 8, 8
        num_vq, t2i_text = 16, 14
    else:
        vocab = MMADA_8B
        dims = dict(d_model=4096, n_heads=32, mlp_hidden_size=12288)
        half_layers, full_layers = 16, 32
        text_prompt_len, gen_len, steps, block = 128, 256, 128, 64
        num_vq, t2i_text = 1024, 510

    def make_cfg(n_layers):
        return llada.LLaDAConfig(
            n_layers=n_layers,
            vocab_size=vocab.total_vocab_size,
            embedding_size=vocab.total_vocab_size,
            max_sequence_length=2048, rope_theta=500000.0,
            mask_token_id=vocab.mask_token_id,
            **dims,
        )

    # fixed prompts -------------------------------------------------------
    kp = jax.random.key(17)
    text_prompt = jax.random.randint(
        kp, (2, text_prompt_len), 3, min(100000, vocab.text_vocab_size - 30),
        jnp.int32,
    )
    soi = 230 if tiny else vocab.special("<|soi|>")
    eoi = 231 if tiny else vocab.special("<|eoi|>")
    t2i_frame = jnp.concatenate([
        jax.random.randint(jax.random.key(18), (2, t2i_text), 3,
                           min(100000, vocab.text_vocab_size - 30)),
        jnp.full((2, 1), soi),
        jnp.full((2, num_vq), vocab.mask_token_id),
        jnp.full((2, 1), eoi),
    ], axis=1).astype(jnp.int32)
    t2i_uncond = t2i_frame.at[:, :t2i_text].set(vocab.pad_token_id)
    fwd_ids = jax.random.randint(
        jax.random.key(19), (2, max(block * 2, 128) if not tiny else 32),
        3, vocab.text_vocab_size - 30, jnp.int32,
    )

    @jax.jit
    def run_text(model, prompt):
        return model.generate(
            prompt, gen_length=gen_len, steps=steps, block_length=block,
            temperature=0.0,
        )

    @jax.jit
    def run_t2i(model, frame, uncond):
        return model.t2i_generate(
            frame, uncond_input_ids=uncond, temperature=0.0, greedy=True,
            timesteps=15, guidance_scale=3.5, num_vq_tokens=num_vq,
            key=jax.random.key(0),
        )

    @jax.jit
    def run_fwd(model, ids):
        return model.forward(ids).astype(jnp.float32)

    def sync(x):
        return float(jax.device_get(jnp.asarray(x).sum()))

    def drive(params, cfg, label, want_fwd=True):
        model = MMadaModel(cfg=cfg, params=params, vocab=vocab, policy=BF16)
        res = {}
        t0 = time.perf_counter()
        text = run_text(model, text_prompt)
        sync(text)
        compile_and_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        text = run_text(model, text_prompt)
        sync(text)
        res["text_s"] = time.perf_counter() - t0
        res["text_tokens_per_s"] = round(2 * gen_len / res["text_s"], 2)
        res["text_tokens"] = np.asarray(text[:, text_prompt_len:])

        t2i = run_t2i(model, t2i_frame, t2i_uncond)
        sync(t2i)
        t0 = time.perf_counter()
        t2i = run_t2i(model, t2i_frame, t2i_uncond)
        sync(t2i)
        res["t2i_s"] = time.perf_counter() - t0
        res["t2i_images_per_s"] = round(2 / res["t2i_s"], 4)
        res["t2i_tokens"] = np.asarray(t2i)

        if want_fwd:
            res["logits"] = np.asarray(run_fwd(model, fwd_ids))
        logger.info(
            "%s: text %.1f tok/s, t2i %.3f img/s (first call %.1fs)",
            label, res["text_tokens_per_s"], res["t2i_images_per_s"],
            compile_and_run,
        )
        return res

    report = {
        "dims": {**dims, "vocab": vocab.total_vocab_size,
                 "half_layers": half_layers, "full_layers": full_layers},
        "operating_points": {
            "text": {"prompt": text_prompt_len, "gen": gen_len,
                     "steps": steps, "block": block, "temperature": 0.0},
            "t2i": {"timesteps": 15, "cfg": 3.5, "num_vq": num_vq,
                    "greedy": True},
        },
        "thresholds": {
            "forward_top1_min": FWD_THRESHOLD,
            "decode_vs_int8_slack": DECODE_SLACK,
            "fulldepth_w8a8_vs_int8_min": FULLDEPTH_THRESHOLD,
            "margin": MARGIN,
        },
    }

    # ---------------------------------------------------- Phase A: half depth
    cfg_h = make_cfg(half_layers)
    logger.info("phase A: building bf16 %dL flagship-width params", half_layers)
    params = _build_bf16(jax.random.key(0), cfg_h)
    bf16 = drive(params, cfg_h, "bf16/%dL" % half_layers)

    logger.info("phase A: quantizing (destructive, per layer)")
    qparams = _quantize_destructive(params)
    del params
    gc.collect()
    int8 = drive(qparams, cfg_h, "int8/%dL" % half_layers)
    w8a8 = drive(_w8a8_view(qparams), cfg_h, "w8a8/%dL" % half_layers)
    del qparams
    gc.collect()

    ref_logits = bf16.pop("logits")
    ref_top1 = ref_logits.argmax(-1)
    sorted_top2 = np.sort(ref_logits, axis=-1)[..., -2:]
    confident = (sorted_top2[..., 1] - sorted_top2[..., 0]) > MARGIN
    report["half_depth"] = {"bf16": {
        "text_tokens_per_s": bf16["text_tokens_per_s"],
        "t2i_images_per_s": bf16["t2i_images_per_s"],
    }}
    for name, res in (("int8", int8), ("w8a8", w8a8)):
        logits = res.pop("logits")
        top1 = logits.argmax(-1)
        rel = float(np.linalg.norm(logits - ref_logits)
                    / max(np.linalg.norm(ref_logits), 1e-9))
        report["half_depth"][name] = {
            "text_tokens_per_s": res["text_tokens_per_s"],
            "t2i_images_per_s": res["t2i_images_per_s"],
            "speedup_text_vs_bf16": round(
                res["text_tokens_per_s"] / bf16["text_tokens_per_s"], 3),
            "speedup_t2i_vs_bf16": round(
                res["t2i_images_per_s"] / bf16["t2i_images_per_s"], 3),
            "forward_logit_rel_l2": round(rel, 5),
            "forward_top1_agreement": round(_agreement(top1, ref_top1), 4),
            "forward_top1_agreement_margin": round(
                _agreement(top1[confident], ref_top1[confident]), 4),
            "confident_fraction": round(float(confident.mean()), 4),
            "text_decode_agreement": round(
                _agreement(res["text_tokens"], bf16["text_tokens"]), 4),
            "t2i_decode_agreement": round(
                _agreement(res["t2i_tokens"], bf16["t2i_tokens"]), 4),
        }

    # ---------------------------------------------------- Phase B: full depth
    cfg_f = make_cfg(full_layers)
    logger.info("phase B: building int8 %dL directly (per-layer fused "
                "sample+quantize)", full_layers)
    qparams = _build_int8_direct(jax.random.key(0), cfg_f)
    int8_f = drive(qparams, cfg_f, "int8/%dL" % full_layers, want_fwd=False)
    w8a8_f = drive(_w8a8_view(qparams), cfg_f, "w8a8/%dL" % full_layers,
                   want_fwd=False)
    del qparams
    gc.collect()
    report["full_depth"] = {
        "int8": {"text_tokens_per_s": int8_f["text_tokens_per_s"],
                 "t2i_images_per_s": int8_f["t2i_images_per_s"]},
        "w8a8": {
            "text_tokens_per_s": w8a8_f["text_tokens_per_s"],
            "t2i_images_per_s": w8a8_f["t2i_images_per_s"],
            "speedup_text_vs_int8": round(
                w8a8_f["text_tokens_per_s"] / int8_f["text_tokens_per_s"], 3),
            "speedup_t2i_vs_int8": round(
                w8a8_f["t2i_images_per_s"] / int8_f["t2i_images_per_s"], 3),
            "text_decode_agreement_vs_int8": round(
                _agreement(w8a8_f["text_tokens"], int8_f["text_tokens"]), 4),
            "t2i_decode_agreement_vs_int8": round(
                _agreement(w8a8_f["t2i_tokens"], int8_f["t2i_tokens"]), 4),
        },
    }

    # ------------------------------------------------------------- decision
    hd_w, hd_i = report["half_depth"]["w8a8"], report["half_depth"]["int8"]
    fd_w = report["full_depth"]["w8a8"]
    checks = {
        "forward_top1_ok": hd_w["forward_top1_agreement"] >= FWD_THRESHOLD,
        "text_decode_not_worse_than_int8":
            hd_w["text_decode_agreement"]
            >= hd_i["text_decode_agreement"] - DECODE_SLACK,
        "t2i_decode_not_worse_than_int8":
            hd_w["t2i_decode_agreement"]
            >= hd_i["t2i_decode_agreement"] - DECODE_SLACK,
        "fulldepth_text_ok":
            fd_w["text_decode_agreement_vs_int8"] >= FULLDEPTH_THRESHOLD,
        "fulldepth_t2i_ok":
            fd_w["t2i_decode_agreement_vs_int8"] >= FULLDEPTH_THRESHOLD,
    }
    report["checks"] = checks
    report["promote_w8a8"] = all(checks.values())
    report["headline_scheme"] = "w8a8" if report["promote_w8a8"] else "int8"
    report["note"] = (
        "Random weights (zero-egress env). CONTROL RESULT: the shipping "
        "int8 weight-only scheme fails the same agreement gate "
        f"(top-1 {report['half_depth']['int8']['forward_top1_agreement']}, "
        f"decode {report['half_depth']['int8']['text_decode_agreement']}) — "
        "with ~134k near-exchangeable random logit directions the top-1 "
        "margin is Gumbel-thin, so argmax agreement at flagship dims is "
        "uninformative without trained weights (trained models separate "
        "the top token by large margins). The informative numbers here are "
        "logit_rel_l2 (int8 "
        f"{report['half_depth']['int8']['forward_logit_rel_l2']}, w8a8 "
        f"{report['half_depth']['w8a8']['forward_logit_rel_l2']} — w8a8 "
        "adds ~1.6x int8's perturbation) and the measured speedups. "
        "DECISION: headline stays int8; W8A8 promotion requires this gate "
        "re-run on real weights (tools/real_weight_harness.py) where "
        "decode agreement is meaningful. Thresholds above stand."
    )

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2, default=str)
    print(json.dumps({k: report[k] for k in
                      ("promote_w8a8", "headline_scheme", "checks")}))
    logger.info("wrote %s", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
