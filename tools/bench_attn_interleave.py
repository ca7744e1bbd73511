"""A/B the interleaved one-pass attention body on the real chip.

The round-4 profile (PROFILE_w8a8_r04.json) puts the one-pass flash
forward at 124 TFLOP/s = 63% of bf16 peak at the t2i headline shape
(B8 H32 L1536 D128, fused RoPE) — the gap is softmax-shaped: the fp32
exp/reduce of the (block_q, L) score tile serializes against the two MXU
dots. `_attn_kernel_interleaved` splits the q block in two independent
halves written straight-line so Mosaic's VLIW scheduler CAN overlap half
1's QK^T (MXU) with half 0's softmax (VPU) and half 1's softmax with
half 0's PV dot. Whether it actually does is an empirical question —
this tool answers it:

    python tools/bench_attn_interleave.py [reps=5]

Prints p50 seconds + achieved TFLOP/s for baseline vs interleaved at the
t2i shape and a seq-2048 training shape. Promote by flipping the
`interleave` default in ops/flash_attention.flash_attention if the win
is real; the math is identical (tests/test_flash_attention.py pins
equality in interpret mode).
"""

import json
import sys
import time

import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv):
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    reps = int(args.get("reps", 5))
    # loop the kernel inside ONE jit program: a single tunneled dispatch
    # costs ~27 ms — at the 2.5 ms kernel this A/B used to measure the
    # tunnel, not the kernel (round-5 first attempt: "10.1 TFLOP/s" for
    # a kernel the in-program profile clocks at 121). The output feeds
    # back as q so the chain cannot be DCE'd or overlapped.
    iters = int(args.get("iters", 32))

    import jax
    import jax.numpy as jnp

    from mmada_tpu.ops.flash_attention import flash_attention
    from mmada_tpu.models.llada import rope_sin_cos

    def sync(x):
        return float(jax.device_get(x.sum()))

    out = {}
    for name, (b, h, l, d) in {
        "t2i_headline": (8, 32, 1536, 128),
        "train_seq2048": (3, 32, 2048, 128),
    }.items():
        kq, kk, kv_ = jax.random.split(jax.random.key(0), 3)
        q = jax.random.normal(kq, (b, h, l, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, l, d), jnp.bfloat16)
        v = jax.random.normal(kv_, (b, h, l, d), jnp.bfloat16)
        sin, cos = rope_sin_cos(l, d, 500000.0)
        flops = 4 * b * h * l * l * d * iters

        row = {}
        for mode, il in (("baseline", False), ("interleaved", True)):
            @jax.jit
            def fn(q, k, v, il=il):
                def body(qc, _):
                    o = flash_attention(qc, k, v, rope_sin=sin,
                                        rope_cos=cos, interleave=il)
                    return o, ()
                qf, _ = jax.lax.scan(body, q, None, length=iters)
                return qf

            sync(fn(q, k, v))
            lats = []
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(fn(q, k, v))
                lats.append(time.perf_counter() - t0)
            p50 = sorted(lats)[len(lats) // 2]
            row[mode] = {"p50_s": round(p50, 5),
                         "per_call_ms": round(1e3 * p50 / iters, 4),
                         "tflops": round(flops / p50 / 1e12, 1)}
        row["speedup"] = round(
            row["baseline"]["p50_s"] / row["interleaved"]["p50_s"], 4)
        out[name] = row
        print(name, json.dumps(row))
        if "out" in args:           # incremental: save after each shape
            with open(args["out"], "w") as f:
                json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
