"""Pin the trained-checkpoint quantization promotion policy.

tools/quant_gate.py (ckpt mode) and tools/real_weight_harness.py (stage 5)
share one policy function, `ckpt_promotion_checks`. These tests pin its
semantics — the round-3 lesson being that independently-maintained copies
of the rule diverged (text-only vs t2i-slack), and that an absolute raw
top-1 bar is unsatisfiable by the int8 control itself (~0.98 raw on a
trained proxy: near-tied logits flip under any perturbation), so the bar
binds absolutely only on margin-confident positions and relatively
(vs the int8 control) everywhere else.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "quant_gate",
    os.path.join(os.path.dirname(__file__), "..", "tools", "quant_gate.py"),
)
quant_gate = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(quant_gate)

ckpt_promotion_checks = quant_gate.ckpt_promotion_checks


def _report(**arms):
    """Report skeleton with a healthy int8 control and separated margins."""
    base = {
        "int8": {
            "forward_top1_agreement": 0.983,
            "forward_top1_agreement_margin": 0.999,
            "text_decode_agreement": 1.0,
            "t2i_decode_agreement": 0.989,
        },
        "margin_stats": {"confident_fraction_at_0.05": 0.94},
    }
    base.update(arms)
    return base


def _arm(raw=0.98, margin=0.997, text=0.995, t2i=0.985):
    return {
        "forward_top1_agreement": raw,
        "forward_top1_agreement_margin": margin,
        "text_decode_agreement": text,
        "t2i_decode_agreement": t2i,
    }


def test_healthy_arm_promotes():
    checks = ckpt_promotion_checks(_report(w8a8=_arm()), "w8a8")
    assert all(checks.values()), checks


def test_raw_bar_is_relative_not_absolute():
    # raw 0.979 < 0.99 but within 0.01 of the control's 0.983: the
    # round-3 w8a8 case. An absolute raw bar would wrongly demote.
    checks = ckpt_promotion_checks(_report(w8a8=_arm(raw=0.979)), "w8a8")
    assert checks["forward_top1_not_worse_than_int8"]
    assert all(checks.values())


def test_raw_clearly_below_control_demotes():
    checks = ckpt_promotion_checks(_report(w8a8=_arm(raw=0.96)), "w8a8")
    assert not checks["forward_top1_not_worse_than_int8"]


def test_margin_agreement_bar_is_absolute():
    # the int4 case: raw fine relative, but confident positions disagree
    checks = ckpt_promotion_checks(_report(int4=_arm(margin=0.93)), "int4")
    assert not checks["forward_margin_top1_ok"]


def test_t2i_decode_slack_vs_control():
    # the w8a8_smooth alpha=0.7 case: perfect text, t2i 0.9756 vs the
    # control's 0.989 - 0.01 bar
    checks = ckpt_promotion_checks(
        _report(a07=_arm(text=1.0, t2i=0.9756)), "a07")
    assert not checks["t2i_decode_not_worse_than_int8"]


def test_margin_starvation_blocks_everything():
    # random/undertrained weights: <50% confident positions means the
    # gate is uninformative and must refuse to promote any arm
    rep = _report(w8a8=_arm())
    rep["margin_stats"]["confident_fraction_at_0.05"] = 0.3
    checks = ckpt_promotion_checks(rep, "w8a8")
    assert not checks["margins_separated"]


def test_broken_control_blocks_everything():
    rep = _report(w8a8=_arm())
    rep["int8"]["text_decode_agreement"] = 0.9
    checks = ckpt_promotion_checks(rep, "w8a8")
    assert not checks["int8_control_decodes_cleanly"]


def _truth_report(**arms):
    """Trained-proxy report skeleton: truth-anchored decode keys present
    (the policy function must branch to truth-vs-int8 checks)."""
    base = {
        "bf16": {"text_decode_truth_acc": 0.97, "t2i_decode_truth_acc": 0.99},
        "int8": {
            "forward_top1_agreement": 0.983,
            "forward_top1_agreement_margin": 0.999,
            "text_decode_truth_acc": 0.96,
            "t2i_decode_truth_acc": 0.985,
        },
        "margin_stats": {"confident_fraction_at_0.05": 0.94},
    }
    base.update(arms)
    return base


def _truth_arm(raw=0.98, margin=0.997, text=0.95, t2i=0.98):
    return {
        "forward_top1_agreement": raw,
        "forward_top1_agreement_margin": margin,
        "text_decode_truth_acc": text,
        "t2i_decode_truth_acc": t2i,
    }


def test_truth_mode_healthy_arm_promotes():
    checks = ckpt_promotion_checks(_truth_report(w8a8=_truth_arm()), "w8a8")
    assert "text_truth_not_worse_than_int8" in checks  # truth branch taken
    assert "text_decode_not_worse_than_int8" not in checks
    assert all(checks.values()), checks


def test_truth_mode_arm_below_int8_demotes():
    checks = ckpt_promotion_checks(
        _truth_report(int4=_truth_arm(text=0.80)), "int4")
    assert not checks["text_truth_not_worse_than_int8"]


def test_truth_mode_degenerate_bank_blocks_everything():
    # campaign B: all-EOS output "agreed" trivially; the instrument must
    # refuse to promote when bf16 itself cannot reproduce the bank
    rep = _truth_report(w8a8=_truth_arm())
    rep["bf16"]["text_decode_truth_acc"] = 0.1
    checks = ckpt_promotion_checks(rep, "w8a8")
    assert not checks["bank_memorized"]


def test_truth_mode_broken_int8_control_blocks():
    rep = _truth_report(w8a8=_truth_arm())
    rep["int8"]["text_decode_truth_acc"] = 0.5  # control lost the bank
    checks = ckpt_promotion_checks(rep, "w8a8")
    assert not checks["int8_control_preserves_truth"]


def test_harness_shares_policy_and_inputs():
    """The harness must not re-grow its own copies of the promotion rule
    or the gate inputs (forward grid / decode prompts / calibration)."""
    src = open(os.path.join(os.path.dirname(__file__), "..", "tools",
                            "real_weight_harness.py")).read()
    import re
    m = re.search(r"from quant_gate import \(([^)]*)\)", src)
    assert m, "harness no longer imports the shared gate helpers"
    imported = m.group(1)
    for name in ("ckpt_promotion_checks", "gate_decode_inputs",
                 "smooth_calibration", "GATE_TEXT_OP"):
        assert name in imported, name


def test_bench_pickers_honor_promotion_flags(tmp_path, monkeypatch):
    """bench.py's artifact pickers (the seam between gate verdicts and
    what the headline bench actually runs) only adopt an arm when its
    artifact says promoted AND carries a recommendation — a demoted or
    recommendation-less artifact must leave the default (exact) path."""
    import importlib.util
    import json as _json
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location("bench", repo / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # point the pickers at an isolated artifact dir
    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))

    assert bench.pick_cfg_interval() == (None, None)
    assert bench.pick_kv_refresh() == (0, None)

    art = tmp_path / "CFG_INTERVAL_r99.json"
    art.write_text(_json.dumps({
        "promote_cfg_interval": False,
        "recommended": {"cfg_interval": [0.0, 0.4]},
    }))
    assert bench.pick_cfg_interval() == (None, None), "demoted must not ship"

    art.write_text(_json.dumps({
        "promote_cfg_interval": True,
        "recommended": {"cfg_interval": [0.2, 0.8]},
    }))
    iv, name = bench.pick_cfg_interval()
    assert iv == (0.2, 0.8) and name == "CFG_INTERVAL_r99.json"

    kv = tmp_path / "KV_REFRESH_r99.json"
    kv.write_text(_json.dumps({
        "promote_kv_refresh": True,
        "recommended": {"cache_refresh_every": 4},
    }))
    assert bench.pick_kv_refresh() == (4, "KV_REFRESH_r99.json")


def test_cfg_interval_recommend_never_picks_zero_step_off_arm():
    """tools/cfg_interval_sweep.recommend: the 0-step "off" arm is the
    measured no-guidance floor but must never be recommended — on a
    memorized truth bank the cond model alone reproduces truth, so
    CFG-off passes on ANY well-trained proxy; the gate can price WHERE
    to guide, not WHETHER to guide."""
    sweep_spec = importlib.util.spec_from_file_location(
        "cfg_interval_sweep",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "cfg_interval_sweep.py"),
    )
    sweep = importlib.util.module_from_spec(sweep_spec)
    sweep_spec.loader.exec_module(sweep)

    entries = [
        {"arm": "off", "cfg_steps": 0, "truth_acc": 0.97},
        {"arm": "early3", "cfg_steps": 3, "truth_acc": 0.96},
        {"arm": "mid7", "cfg_steps": 7, "truth_acc": 0.958},
    ]
    # "off" has the best truth accuracy yet the cheapest GUIDED passer wins
    got = sweep.recommend(entries, exact_truth=0.959, bank_ok=True)
    assert got is not None and got["arm"] == "early3"

    # no guided arm within slack -> no recommendation (NOT a fallback to off)
    got = sweep.recommend(
        [{"arm": "off", "cfg_steps": 0, "truth_acc": 0.97},
         {"arm": "early3", "cfg_steps": 3, "truth_acc": 0.80}],
        exact_truth=0.959, bank_ok=True)
    assert got is None

    # dead instrument -> no recommendation regardless of scores
    assert sweep.recommend(entries, exact_truth=0.959, bank_ok=False) is None


def test_cfg_interval_guidance_informative_health_key():
    """tools/cfg_interval_sweep.guidance_informative: flags the run as
    uninformative whenever the no-guidance "off" arm matches or beats the
    exact guided sampler (guidance net-neutral-or-negative on the eval
    model — CFG_INTERVAL_r04.json's shape). Only a strictly-worse off arm
    makes the WHETHER-to-guide axis observable (VERDICT r4 #7)."""
    sweep_spec = importlib.util.spec_from_file_location(
        "cfg_interval_sweep_gi",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "cfg_interval_sweep.py"),
    )
    sweep = importlib.util.module_from_spec(sweep_spec)
    sweep_spec.loader.exec_module(sweep)

    off_beats = [{"arm": "off", "cfg_steps": 0, "truth_acc": 0.9604}]
    assert sweep.guidance_informative(off_beats, exact_truth=0.9402) is False
    off_ties = [{"arm": "off", "cfg_steps": 0, "truth_acc": 0.94}]
    assert sweep.guidance_informative(off_ties, exact_truth=0.94) is False
    off_worse = [{"arm": "off", "cfg_steps": 0, "_truth_acc": 0.80,
                  "truth_acc": 0.99}]  # unrounded key must win
    assert sweep.guidance_informative(off_worse, exact_truth=0.94) is True
    assert sweep.guidance_informative([], exact_truth=0.5) is False
