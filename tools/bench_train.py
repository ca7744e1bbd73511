"""On-chip training-step throughput + MFU at the stage-1 operating shape.

The reference's only training-perf instrument is the (unpublished)
`samples/sec/gpu` wandb log (train_mmada.py:665-674). This prints the
analogous number for one chip — fwd+bwd+update over the stage-1 multi-task
batch shape (7 t2i + 2 lm + 6 mmu rows = batch 15, seq 388) at flagship
width, remat on, bf16 params, SGD (optimizer choice does not affect the
fwd/bwd that dominates) — plus model-FLOPs accounting:

  train_mfu            — useful FLOPs (3x forward matmuls) / v5e bf16 peak
  hw_tflops_per_s      — including the remat recompute forward

    python tools/bench_train.py            # 8 layers (fits one chip)
    python tools/bench_train.py layers=16

Measured (v5e, 8L): 18.3 samples/s round 1 (XLA attention) -> 21.4 with
the differentiable Pallas forward (BASELINE.md round-2c).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv):
    args = dict(a.split("=", 1) for a in argv if "=" in a)
    n_layers = int(args.get("layers", 8))
    batch, seq = int(args.get("batch", 15)), int(args.get("seq", 388))
    steps = int(args.get("steps", 8))
    from mmada_tpu.core.config import parse_remat
    remat = parse_remat(args.get("remat", "full"))  # full | dots | false

    import jax
    import jax.numpy as jnp
    import optax

    if args.get("cpu") == "1":  # tiny-dim harness check off-chip
        jax.config.update("jax_platforms", "cpu")

    if args.get("bwd") == "xla":
        # A/B: force the round-2 XLA-recompute attention backward instead
        # of the flash dq/dkv kernels (ops/attention._pallas_attention_bwd)
        import mmada_tpu.ops.attention as _A

        _A._kernel_bwd_eligible = lambda q, k: False

    from mmada_tpu.core.precision import BF16
    from mmada_tpu.core.vocab import MMADA_8B
    from mmada_tpu.models import llada
    from mmada_tpu.models.mmada import MMadaModel

    cfg = llada.LLaDAConfig(
        d_model=int(args.get("d_model", 4096)),
        n_heads=int(args.get("heads", 32)),
        n_layers=n_layers,
        mlp_hidden_size=int(args.get("mlp", 12288)),
        vocab_size=int(args.get("vocab", MMADA_8B.total_vocab_size)),
        embedding_size=int(args.get("vocab", MMADA_8B.total_vocab_size)),
        max_sequence_length=2048, rope_theta=500000.0,
    )
    params = jax.jit(
        lambda k: llada.init_params(k, cfg, dtype=jnp.bfloat16)
    )(jax.random.key(0))

    def sync(x):
        return float(jax.device_get(x.sum()))

    sync(params["ln_f"])

    ids = jax.random.randint(jax.random.key(1), (batch, seq), 3, 100000, jnp.int32)
    labels = jax.random.randint(jax.random.key(2), (batch, seq), 3, 100000, jnp.int32)
    masked = jax.random.bernoulli(jax.random.key(3), 0.5, (batch, seq))

    opt = optax.sgd(1e-4)
    opt_state = jax.jit(opt.init)(params)

    fq = args.get("quantize", "none")  # w8a8: STE int8-MXU forward dots

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ids, labels, masked):
        def loss_fn(p):
            if fq == "w8a8":
                from mmada_tpu.ops.quantization import tag_w8a8_ste

                p = tag_w8a8_ste(p)
            m = MMadaModel(cfg=cfg, params=p, vocab=MMADA_8B,
                           policy=BF16, remat=remat)
            logits = m.forward(ids).astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            return (ce * masked).sum() / masked.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return loss, optax.apply_updates(params, updates), opt_state

    t0 = time.time()
    loss, params, opt_state = step(params, opt_state, ids, labels, masked)
    sync(loss)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(steps):
        loss, params, opt_state = step(params, opt_state, ids, labels, masked)
    sync(loss)
    dt = time.time() - t0

    from mmada_tpu.utils.flops import V5E_BF16_PEAK, train_step_flops

    useful, hardware = train_step_flops(cfg, batch, seq, remat=remat)
    step_s = dt / steps
    row = {
        "train_samples_per_s": round(batch * steps / dt, 2),
        "step_ms": round(1000 * step_s, 1),
        "layers": n_layers, "batch": batch, "seq": seq,
        "compile_s": round(compile_s, 1),
        "model_tflops_per_s": round(useful / step_s / 1e12, 1),
        "train_mfu_vs_bf16_peak": round(useful / step_s / V5E_BF16_PEAK, 3),
        "hw_tflops_per_s_incl_remat": round(hardware / step_s / 1e12, 1),
        "attention_backward": args.get("bwd", "kernel"),
        "remat": remat,
        "forward_quantize": fq,
    }
    print(json.dumps(row))
    if "out" in args:  # append-merge so a multi-arm sweep accumulates
        merged = {}
        if os.path.exists(args["out"]):
            with open(args["out"]) as f:
                merged = json.load(f)
        # key includes every arm-defining knob — a seq-2048 run must not
        # overwrite the seq-388 row (bit the first r05 sweep), nor a
        # bwd=xla A/B its kernel-backward sibling
        key = (f"remat={remat}_quantize={fq}_seq{seq}_b{batch}"
               f"_L{n_layers}_bwd{args.get('bwd', 'kernel')}")
        merged[key] = row
        with open(args["out"], "w") as f:
            json.dump(merged, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
