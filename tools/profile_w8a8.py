"""Per-op profile of the quantized t2i headline step (VERDICT r4 item #1).

Round 3 measured the promoted W8A8 executor at 269.4 TFLOP/s ≈ 68% of the
v5e int8 MXU peak while the bf16 path reaches 89.4% of its own — ~20pp of
single-chip headroom with no published attribution. This tool closes the
measurement gap: it runs bench.py's exact t2i operating point (8B 32L,
seq 1536, batch 4, CFG-doubled rows, 15 steps) under `jax.profiler.trace`
(device traces DO come back over the tunneled axon platform) and converts
the xplane with xprof into an op-category attribution table:

    python tools/profile_w8a8.py [--scheme w8a8|int8|bf16] [--out PATH]

Output JSON: total device time, per-category time/%, the top-N individual
HLO ops, and the achieved-vs-peak MXU fraction for the dot categories.
The bench FLOP model (bench.model_flops_per_token) prices the step so the
"convert/fusion overhead" rows are in seconds, not vibes.

Reference perf path this instruments against: the reference serves t2i
through torch SDPA/flash-attn (modeling_llada.py:574-581) at the README
operating points; it has no quantized executor at all — this attribution
table is the TPU-native profit-and-loss statement for ours.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_INT8_PEAK = 394e12


def build_t2i(scheme: str):
    """bench.py's headline t2i closure on the zero-weight 8B structure."""
    import jax
    import jax.numpy as jnp

    from mmada_tpu.core.precision import BF16
    from mmada_tpu.core.vocab import MMADA_8B
    from mmada_tpu.models import llada
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.ops import quantization as Q

    batch, timesteps, num_vq, text_frame = 4, 15, 1024, 510
    seq_len = text_frame + num_vq + 2
    cfg = llada.LLaDAConfig(
        d_model=4096, n_heads=32, n_layers=32, mlp_hidden_size=12288,
        vocab_size=MMADA_8B.total_vocab_size,
        embedding_size=MMADA_8B.total_vocab_size,
        max_sequence_length=2048, rope_theta=500000.0,
    )

    def quantize(p):
        if scheme == "bf16":
            return p
        return Q.quantize_llada_params(p, activations=scheme == "w8a8")

    shapes = jax.eval_shape(
        lambda k: quantize(llada.init_params(k, cfg, dtype=jnp.bfloat16)),
        jax.random.key(0),
    )

    def mk(s):
        if s.dtype == jnp.float32 and len(s.shape) <= 2:
            return jnp.ones(s.shape, s.dtype)
        return jnp.zeros(s.shape, s.dtype)

    params = jax.jit(lambda: jax.tree.map(mk, shapes))()
    model = MMadaModel(cfg=cfg, params=params, vocab=MMADA_8B, policy=BF16)

    mask_id = MMADA_8B.mask_token_id
    soi, eoi = MMADA_8B.special("<|soi|>"), MMADA_8B.special("<|eoi|>")
    prompt = jax.random.randint(
        jax.random.key(1), (batch, text_frame), 3, 100000
    )
    frame = jnp.concatenate(
        [prompt, jnp.full((batch, 1), soi),
         jnp.full((batch, num_vq), mask_id), jnp.full((batch, 1), eoi)],
        axis=1,
    ).astype(jnp.int32)
    uncond = frame.at[:, :text_frame].set(MMADA_8B.pad_token_id)

    @jax.jit
    def run(model, frame, uncond, key):
        return model.t2i_generate(
            frame, uncond_input_ids=uncond, temperature=1.0,
            timesteps=timesteps, guidance_scale=3.5, num_vq_tokens=num_vq,
            key=key,
        )

    import bench
    flops = (timesteps * 2 * batch * seq_len
             * bench.model_flops_per_token(cfg, seq_len, num_vq + 1, 8192))
    return model, run, frame, uncond, flops, batch


def capture(scheme: str, logdir: str):
    import jax

    model, run, frame, uncond, flops, batch = build_t2i(scheme)

    def sync(x):
        return int(jax.device_get(x.sum()))

    t0 = time.perf_counter()
    sync(run(model, frame, uncond, jax.random.key(2)))  # compile + warm
    print(f"warm compile+run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        out = run(model, frame, uncond, jax.random.key(3))
        sync(out)
    wall = time.perf_counter() - t0
    print(f"traced run: {wall:.2f}s", file=sys.stderr)
    return wall, flops, batch


def _node_row(node, program=None):
    m = node.get("metrics", {})
    # rawTime is the wall-clock device time; normalizedTimePs is
    # DVFS-rescaled (aggDvfsTimeScaleMultiplier) and overstated ~3x on
    # the tunneled v5e — the r04 artifact's 30.3 "device seconds" for an
    # 11.2 s wall came from trusting it
    return {
        "name": node.get("name", "?"),
        "program": program,
        "time_ps": m.get("rawTime") or m.get("normalizedTimePs", 0),
        "flops_frac": m.get("flops", 0.0),
        "occurrences": m.get("occurrences", 0),
    }


def analyze(logdir: str, wall: float, flops: float, batch: int,
            scheme: str) -> dict:
    """xprof op_profile tree shape (vm.xplane.pb, op_profile tool):
    byProgram root -> depth 1 = jit programs (jit_run, ...) -> depth 2 =
    HLO categories (convolution fusion, custom-call, loop fusion, data
    formatting, ...) -> depth 3 = individual ops. The r04 analyzer read
    depth 1 as categories (got programs) and the deepest leaves as ops
    (got zero-time instruction components) — VERDICT r4 weak #1."""
    from xprof.convert import raw_to_tool_data as rtd

    files = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    if not files:
        raise SystemExit("no xplane captured — tracing unsupported here?")
    data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
    prof = json.loads(data)
    # prefer the PROGRAM-rooted trees — the walk below assumes depth 1 =
    # jit programs, depth 2 = HLO categories; a byCategory tree (one
    # level shallower) would shift every level and silently reproduce
    # the r04 mislabeling this rewrite fixed
    root = (prof.get("byProgramExcludeIdle") or prof.get("byProgram")
            or prof.get("byCategory"))
    programs = [_node_row(p) for p in root.get("children", [])]

    # merge the depth-2 category nodes across programs (the tiny helper
    # programs — reduce_sum sync, threefry seed — contribute their own
    # copies of e.g. "loop fusion")
    cats: dict = {}
    ops = []
    for p in root.get("children", []):
        pname = p.get("name", "?")
        for c in p.get("children", []):
            row = _node_row(c)
            agg = cats.setdefault(row["name"], {
                "name": row["name"], "time_ps": 0, "flops_ps": 0.0,
                "occurrences": 0})
            agg["time_ps"] += row["time_ps"]
            # flops is a fraction-of-peak; time-weight it for the merge
            agg["flops_ps"] += row["flops_frac"] * row["time_ps"]
            agg["occurrences"] += row["occurrences"]
            for o in c.get("children", []):
                ops.append({**_node_row(o, program=pname),
                            "category": row["name"]})
    cat_rows = sorted(cats.values(), key=lambda r: -r["time_ps"])
    ops.sort(key=lambda r: -r["time_ps"])
    total_ps = sum(r["time_ps"] for r in cat_rows) or 1

    def pct(ps):
        return round(100.0 * ps / total_ps, 2)

    report = {
        "scheme": scheme,
        "wall_s": round(wall, 3),
        "device_total_s": round(total_ps * 1e-12, 4),
        "model_flops_per_run": flops,
        "achieved_tflops": round(flops / wall / 1e12, 1),
        "vs_bf16_peak": round(flops / wall / V5E_BF16_PEAK, 4),
        "vs_int8_peak": round(flops / wall / V5E_INT8_PEAK, 4),
        "images_per_s": round(batch / wall, 4),
        "programs": [
            {"program": p["name"],
             "time_s": round(p["time_ps"] * 1e-12, 4)}
            for p in sorted(programs, key=lambda r: -r["time_ps"])
        ],
        "categories": [
            {"category": c["name"], "time_pct": pct(c["time_ps"]),
             "time_s": round(c["time_ps"] * 1e-12, 4),
             "mxu_flops_frac": round(
                 c["flops_ps"] / max(c["time_ps"], 1), 4),
             "occurrences": c["occurrences"]}
            for c in cat_rows
        ],
        "top_ops": [
            {"op": o["name"], "category": o["category"],
             "time_pct": pct(o["time_ps"]),
             "time_s": round(o["time_ps"] * 1e-12, 4),
             "mxu_flops_frac": round(o["flops_frac"], 4),
             "occurrences": o["occurrences"]}
            for o in ops[:25]
        ],
    }
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", default="w8a8",
                    choices=["w8a8", "int8", "bf16"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--logdir", default=None,
                    help="reuse an existing trace instead of capturing")
    ap.add_argument("--time-only", action="store_true",
                    help="p50 of 3 untraced runs (no xprof overhead) — "
                         "the quick headline probe between bench.py runs")
    args = ap.parse_args(argv)

    if args.time_only:
        import jax

        model, run, frame, uncond, flops, batch = build_t2i(args.scheme)

        def sync(x):
            return int(jax.device_get(x.sum()))

        sync(run(model, frame, uncond, jax.random.key(2)))
        lats = []
        for i in range(3):
            t0 = time.perf_counter()
            sync(run(model, frame, uncond, jax.random.key(3 + i)))
            lats.append(time.perf_counter() - t0)
        wall = sorted(lats)[1]
        print(json.dumps({
            "scheme": args.scheme, "p50_wall_s": round(wall, 3),
            "images_per_s": round(batch / wall, 4),
            "achieved_tflops": round(flops / wall / 1e12, 1),
            "vs_int8_peak": round(flops / wall / V5E_INT8_PEAK, 4),
            "runs": [round(x, 3) for x in lats],
        }))
        return 0

    logdir = args.logdir or tempfile.mkdtemp(prefix=f"xprof_{args.scheme}_")
    if args.logdir:
        # offline re-analysis: wall/flops come from a sidecar if present
        meta_path = os.path.join(logdir, "meta.json")
        meta = json.load(open(meta_path))
        wall, flops, batch = meta["wall"], meta["flops"], meta["batch"]
    else:
        wall, flops, batch = capture(args.scheme, logdir)
        with open(os.path.join(logdir, "meta.json"), "w") as f:
            json.dump({"wall": wall, "flops": flops, "batch": batch}, f)

    report = analyze(logdir, wall, flops, batch, args.scheme)
    report["logdir"] = logdir
    if args.logdir:
        report["reanalyzed_offline"] = True  # trace predates this run
    out_path = args.out or f"PROFILE_{args.scheme}_r04.json"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("scheme", "wall_s", "achieved_tflops", "vs_int8_peak",
                       "vs_bf16_peak", "images_per_s")}))
    for c in report["categories"][:10]:
        print(f"  {c['category']:<40} {c['time_pct']:6.2f}%  "
              f"{c['time_s']:.4f}s  mxu={c['mxu_flops_frac']:.3f}")
    print(f"wrote {out_path}; trace in {logdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
