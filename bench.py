"""Benchmark: t2i denoise throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the headline operating point (BASELINE.md: 15 timesteps,
CFG 3.5, 1024 VQ tokens) end-to-end through the jitted MaskGIT scan —
batch-doubled CFG forwards, windowed 8k vocab head, on-device remasking —
at flagship layer dimensions (d_model 4096, 32 heads, mlp 12288, fused
134,656-row vocab). The model is the FULL 32-layer 8B architecture with int8 weight-only
quantization (ops/quantization.py) so it fits a single 16 GB v5e chip —
bf16 weights (16.2 GB) need the sharded multi-chip path.

The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is 1.0 until a reference-GPU measurement exists; the driver's
BENCH_r{N}.json series tracks round-over-round progress.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from mmada_tpu.core.vocab import MMADA_8B
    from mmada_tpu.models import llada
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.core.precision import BF16

    batch = 4
    timesteps = 15
    num_vq = 1024
    text_frame = 510               # -> L = 510 + 1 + 1024 + 1 = 1536
    seq_len = text_frame + num_vq + 2

    # FULL flagship depth: 32 layers, 8B params. bf16 (16.2 GB) exceeds the
    # 16 GB chip; int8 weight-only quantization (ops/quantization.py,
    # ~8.6 GB) serves the full model on one chip.
    from mmada_tpu.ops import quantization as Q

    cfg = llada.LLaDAConfig(
        d_model=4096, n_heads=32, n_layers=32, mlp_hidden_size=12288,
        vocab_size=MMADA_8B.total_vocab_size,
        embedding_size=MMADA_8B.total_vocab_size,
        max_sequence_length=2048, rope_theta=500000.0,
    )
    # Throughput does not depend on weight values: build the quantized
    # structure directly via eval_shape (random init at 8B params costs
    # minutes of remote compile on the tunneled chip).
    shapes = jax.eval_shape(
        lambda k: Q.quantize_llada_params(
            llada.init_params(k, cfg, dtype=jnp.bfloat16)
        ),
        jax.random.key(0),
    )

    def mk(s):
        if s.dtype == jnp.float32 and len(s.shape) <= 2:
            return jnp.ones(s.shape, s.dtype)  # quant scales
        return jnp.zeros(s.shape, s.dtype)

    params = jax.jit(lambda: jax.tree.map(mk, shapes))()
    model = MMadaModel(cfg=cfg, params=params, vocab=MMADA_8B, policy=BF16)

    mask_id = MMADA_8B.mask_token_id
    soi, eoi = MMADA_8B.special("<|soi|>"), MMADA_8B.special("<|eoi|>")
    prompt = jax.random.randint(
        jax.random.key(1), (batch, text_frame), 3, 100000
    )
    frame = jnp.concatenate(
        [
            prompt,
            jnp.full((batch, 1), soi),
            jnp.full((batch, num_vq), mask_id),
            jnp.full((batch, 1), eoi),
        ],
        axis=1,
    ).astype(jnp.int32)
    uncond = frame.at[:, :text_frame].set(MMADA_8B.pad_token_id)

    # model passes through jit as a pytree (params = runtime args).
    # Closing over params instead would bake them into the lowered module —
    # catastrophic with this environment's remote compiler.
    @jax.jit
    def run(model, frame, uncond, key):
        return model.t2i_generate(
            frame,
            uncond_input_ids=uncond,
            temperature=1.0,
            timesteps=timesteps,
            guidance_scale=3.5,
            num_vq_tokens=num_vq,
            key=key,
        )

    def sync(x):
        # block_until_ready does not actually block on the tunneled axon
        # platform; a host fetch is the reliable synchronization
        return int(jax.device_get(x.sum()))

    # compile + warm
    sync(run(model, frame, uncond, jax.random.key(2)))

    runs = 3
    t0 = time.perf_counter()
    for i in range(runs):
        out = run(model, frame, uncond, jax.random.key(3 + i))
    sync(out)
    dt = time.perf_counter() - t0

    images_per_sec = batch * runs / dt
    print(
        json.dumps(
            {
                "metric": "t2i images/sec/chip @15 steps cfg3.5 "
                          "(FULL 8B 32L int8, 1536 seq, batch 4)",
                "value": round(images_per_sec, 4),
                "unit": "images/sec",
                "vs_baseline": 1.0,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
