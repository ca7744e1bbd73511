"""Pipeline-parallel (GPipe) inference forward for the layer-stacked LLaDA.

The reference has no pipeline parallelism (SURVEY.md §2.6); this is the
TPU-native option for serving the backbone across a slice with ONLY
nearest-neighbor activation transfers — no per-matmul collectives. It
exploits the layer-stacked parameter layout directly: sharding the
leading (n_layers) axis of every block weight over a mesh axis IS the
stage assignment, so each device holds n_layers/P contiguous layers and
runs them with the same `lax.scan` body as the single-device model.

Schedule: GPipe over M microbatches, T = M + P − 1 ticks. Every tick each
device runs its local stage on its current activation and `ppermute`s the
result to the next stage (ICI neighbor). Stage utilization is the usual
M/(M+P−1); the transfer of one microbatch's activations overlaps the next
tick's compute. Embedding and the vocab head run OUTSIDE the shard_map
under plain GSPMD, so they compose with tensor-parallel sharding of the
embedding/head independently of the pipeline.

Inference-only by design: MDM serving re-runs full forwards every denoise
step (no KV cache), which is exactly the regime where a bubble-tolerant
GPipe pays; training here uses FSDP+TP instead (parallel/sharding.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # moved out of experimental in newer JAX
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmada_tpu.core.precision import FP32, Policy
from mmada_tpu.models import llada


def shard_stage_params(params, mesh: Mesh, axis_name: str = "fsdp"):
    """Place block weights layer-sharded over `axis_name` (the leading
    n_layers axis IS the stage assignment) and everything else replicated.
    Raw-array params only (quantized leaves keep their own layout via
    parallel/sharding.py — PP targets the bf16 multi-chip regime)."""
    blocks = {
        k: jax.device_put(v, NamedSharding(mesh, P(axis_name)))
        for k, v in params["blocks"].items()
    }
    rest = {
        k: jax.device_put(v, NamedSharding(mesh, P()))
        for k, v in params.items() if k != "blocks"
    }
    return dict(rest, blocks=blocks)


def pipeline_forward(
    params,
    cfg: llada.LLaDAConfig,
    input_ids: jax.Array,           # (B, L) int32
    mesh: Mesh,
    axis_name: str = "fsdp",
    num_microbatches: Optional[int] = None,
    policy: Policy = FP32,
    logit_window: Optional[tuple[int, int]] = None,
    logit_positions: Optional[tuple[int, int]] = None,  # (start, length)
):
    """Logits equal to `llada.forward` (no bias path), computed with the
    block stack pipeline-parallel over `axis_name`. B must divide
    num_microbatches; n_layers must divide the axis size."""
    n_stages = mesh.shape[axis_name]
    if cfg.n_layers % n_stages:
        raise ValueError(f"{cfg.n_layers} layers != multiple of {n_stages} stages")
    b = input_ids.shape[0]
    m = num_microbatches or min(b, 2 * n_stages)
    m = max(1, min(m, b))
    while b % m:
        m -= 1

    x = params["wte"][input_ids].astype(policy.compute_dtype)
    if cfg.input_emb_norm:
        import math

        x = x * math.sqrt(cfg.d_model)
    seq_len = x.shape[1]
    sin, cos = llada.rope_sin_cos(seq_len, cfg.head_dim, cfg.rope_theta)

    mb = x.reshape(m, b // m, seq_len, -1)   # microbatch queue

    def local(blocks_local, mb_queue, sin, cos):
        p = jax.lax.axis_index(axis_name)

        def run_stage(h):
            def body(carry, lp):
                return (
                    llada._block(cfg, policy, carry, lp, None, sin, cos, "auto"),
                    None,
                )

            h, _ = jax.lax.scan(body, h, blocks_local)
            return h

        def varying(z):
            # carry values must enter the fori_loop device-varying so the
            # carry type matches the per-device ppermute outputs
            # (jax>=0.9 shard_map typing, same as ring_attention)
            if hasattr(jax.lax, "pcast"):
                return jax.lax.pcast(z, axis_name, to="varying")
            return jax.lax.pvary(z, axis_name)  # pragma: no cover

        zeros = varying(jnp.zeros_like(mb_queue[0]))

        def tick(t, state):
            buf_in, outputs = state
            # stage 0 injects microbatch t from the queue; other stages
            # consume what the previous stage permuted in last tick
            inject = mb_queue[jnp.clip(t, 0, m - 1)]
            h_in = jnp.where(p == 0, inject, buf_in)
            y = run_stage(h_in)
            mb_idx = t - (n_stages - 1)
            done = (p == n_stages - 1) & (mb_idx >= 0) & (mb_idx < m)
            updated = jax.lax.dynamic_update_index_in_dim(
                outputs, y, jnp.clip(mb_idx, 0, m - 1), 0
            )
            outputs = jnp.where(done, updated, outputs)
            buf_next = jax.lax.ppermute(
                y, axis_name,
                [(i, (i + 1) % n_stages) for i in range(n_stages)],
            )
            return buf_next, outputs

        outputs0 = varying(jnp.zeros_like(mb_queue))
        _, outputs = jax.lax.fori_loop(
            0, m + n_stages - 1, tick, (zeros, outputs0)
        )
        # only the last stage holds real outputs; broadcast via psum
        outputs = jnp.where(p == n_stages - 1, outputs, jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, axis_name)

    block_spec = {
        k: P(axis_name) for k in params["blocks"]
    }
    out = shard_map(
        local, mesh=mesh,
        in_specs=(block_spec, P(), P(), P()),
        out_specs=P(),
    )(params["blocks"], mb, sin, cos)
    x = out.reshape(b, seq_len, -1)

    if logit_positions is not None:
        # same head-FLOP skip as llada.forward: only the consumed span
        # ((start, length) — llada.forward's shared convention)
        p_start, p_len = logit_positions
        x = jax.lax.dynamic_slice_in_dim(x, p_start, p_len, axis=1)
    x = llada._norm(cfg, x, params["ln_f"])
    head = params["wte"].T if cfg.weight_tying else params["ff_out"]
    if logit_window is not None:
        head = head[:, logit_window[0]: logit_window[1]]
    logits = (x @ head.astype(x.dtype)).astype(policy.logits_dtype)
    if cfg.scale_logits:
        import math

        logits = logits * (1.0 / math.sqrt(cfg.d_model))
    return logits
