"""Ring attention: sequence-parallel bidirectional attention over the mesh.

The reference has no sequence parallelism (sequences ≤ ~2k, SURVEY.md §5);
this is the TPU-native scaling path beyond single-chip memory: Q/K/V shard
along the sequence axis, each device attends its Q block against the K/V
blocks rotating around the ring (`lax.ppermute` over ICI neighbors, the
shard_map analog of the Pallas RDMA ring in the kernel guide), accumulating
with the online-softmax recurrence. Compute overlaps transfers because each
ring step's matmul hides the next block's permute.

Bidirectional MDM attention needs no causal step-skipping, so every device
does exactly `num_devices` equal steps — perfect load balance.
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
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attention_local(q, k, v, axis_name: str, scale: float):
    """Per-device body: q (B, H, Lq, D) local block; k/v local blocks that
    rotate around the ring."""
    axis_size = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def accumulate(acc, m, s, k_cur, v_cur):
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_cur, preferred_element_type=jnp.float32
        ) * scale
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new)
        s_new = s * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur, preferred_element_type=jnp.float32
        ).astype(jnp.float32)
        return acc_new, m_new, s_new

    def step(carry, _):
        acc, m, s, k_cur, v_cur = carry
        # permute FIRST: the local block is consumed before the scan, so
        # exactly axis_size-1 transfers happen (no wasted final permute)
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        acc, m, s = accumulate(acc, m, s, k_cur, v_cur)
        return (acc, m, s, k_cur, v_cur), None

    b, h, lq, d = q.shape
    # constants enter the scan carry as device-varying values so the
    # carry type matches the per-device outputs (jax>=0.9 shard_map typing)
    def varying(x):
        if hasattr(jax.lax, "pcast"):
            return jax.lax.pcast(x, axis_name, to="varying")
        return jax.lax.pvary(x, axis_name)  # pragma: no cover - older JAX

    acc0, m0, s0 = accumulate(
        varying(jnp.zeros((b, h, lq, d), jnp.float32)),
        varying(jnp.full((b, h, lq, 1), -jnp.inf, jnp.float32)),
        varying(jnp.zeros((b, h, lq, 1), jnp.float32)),
        k, v,
    )
    (acc, m, s, _, _), _ = jax.lax.scan(
        step, (acc0, m0, s0, k, v), None, length=axis_size - 1
    )
    return (acc / s).astype(q.dtype)


def ring_attention(
    q: jax.Array,  # (B, H, L, D)
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "fsdp",
) -> jax.Array:
    """Full bidirectional attention with Q/K/V sequence-sharded over
    `axis_name`. L must divide by the axis size. GQA: repeat K/V heads
    before calling (head count must match q)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    spec = P(None, None, axis_name, None)
    fn = shard_map(
        functools.partial(
            _ring_attention_local, axis_name=axis_name, scale=scale
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
