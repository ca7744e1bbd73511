"""Decompose the one-pass attention kernel's time: is the fp32 softmax
actually SERIALIZING against the MXU dots?

The round-4 profile put the one-pass kernel at 63% of bf16 peak at the
t2i shape and attributed the gap to the softmax (exp/reduce on the VPU
between the two MXU dots). The round-5 in-jit interleave A/B measured
the two-independent-halves body at 1.00x — either Mosaic already
overlaps VPU/VMEM work with the dots (no lever), or it can't overlap
even across independent chains (lever needs a different shape). This
tool separates the hypotheses by timing schedule-equivalent kernel
bodies at the same tiles:

  full     — the real kernel: QK^T, softmax, PV (the 63% baseline)
  dots     — QK^T, then PV directly on the (pseudo-)scores: the pure
             2-dot MXU program at identical shapes/layout. Its time is
             the floor any softmax-overlap scheme could reach.
  exp      — QK^T, elementwise exp (no max/sum reductions), PV: adds
             only the transcendental; separates exp cost from the
             row-reduce cost.

If full ≈ dots, the softmax is already hidden and the "softmax lever"
is closed (the 63% IS the 2-sequential-dots + memory ceiling). If
full >> dots, the difference prices what a software-pipelined kernel
could recover.

    python tools/bench_attn_parts.py [reps=5] [iters=32] [out=PATH]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv):
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    reps = int(args.get("reps", 5))
    iters = int(args.get("iters", 32))

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _body(q_ref, k_ref, v_ref, o_ref, *, scale, mode):
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if mode == "full":
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
        elif mode == "exp":
            p = jnp.exp(s)
        else:                       # dots: pseudo-probs, no VPU math
            p = s
        o = jnp.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        o_ref[0, 0] = o.astype(o_ref.dtype)

    def run_mode(mode, b, h, l, d, block_q):
        scale = 1.0 / (d ** 0.5)
        kernel = functools.partial(_body, scale=scale, mode=mode)

        def attn(q, k, v):
            return pl.pallas_call(
                kernel,
                grid=(b, h, l // block_q),
                in_specs=[
                    pl.BlockSpec((1, 1, block_q, d),
                                 lambda bi, hi, qi: (bi, hi, qi, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, l, d),
                                 lambda bi, hi, qi: (bi, hi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1, l, d),
                                 lambda bi, hi, qi: (bi, hi, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 1, block_q, d),
                                       lambda bi, hi, qi: (bi, hi, qi, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b, h, l, d), q.dtype),
            )(q, k, v)

        @jax.jit
        def loop(q, k, v):
            def body(qc, _):
                return attn(qc, k, v), ()
            qf, _ = jax.lax.scan(body, q, None, length=iters)
            return qf

        kq, kk, kv_ = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(kq, (b, h, l, d), jnp.bfloat16) * 0.1
        k = jax.random.normal(kk, (b, h, l, d), jnp.bfloat16)
        v = jax.random.normal(kv_, (b, h, l, d), jnp.bfloat16)

        def sync(x):
            return float(jax.device_get(x.astype(jnp.float32).sum()))

        sync(loop(q, k, v))
        lats = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(loop(q, k, v))
            lats.append(time.perf_counter() - t0)
        p50 = sorted(lats)[len(lats) // 2]
        flops = 4 * b * h * l * l * d * iters
        return {"p50_s": round(p50, 5),
                "per_call_ms": round(1e3 * p50 / iters, 4),
                "tflops": round(flops / p50 / 1e12, 1)}

    out = {}
    for name, (b, h, l, d) in {
        "t2i_headline": (8, 32, 1536, 128),
        "train_seq2048": (3, 32, 2048, 128),
    }.items():
        block_q = 512
        row = {}
        for mode in ("full", "exp", "dots"):
            row[mode] = run_mode(mode, b, h, l, d, block_q)
            print(name, mode, json.dumps(row[mode]))
        row["softmax_overhead_vs_dots"] = round(
            row["full"]["p50_s"] / row["dots"]["p50_s"], 4)
        row["reduce_overhead_vs_exp"] = round(
            row["full"]["p50_s"] / row["exp"]["p50_s"], 4)
        out[name] = row
        if "out" in args:
            with open(args["out"], "w") as f:
                json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
