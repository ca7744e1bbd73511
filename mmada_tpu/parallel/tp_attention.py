"""Tensor-parallel attention: heads sharded over the mesh, Pallas per shard.

Bidirectional MDM attention is head-local — no cross-head reduction — so
tensor parallelism needs ZERO collectives inside the op: shard Q/K/V on the
head axis, run the single-device kernel on each device's local heads, and
the output inherits the head sharding (the surrounding projections'
collectives are inserted by GSPMD as usual).

This wrapper exists because a bare `pallas_call` has no GSPMD partitioning
rule (ops/attention.py:_pallas_eligible): under plain pjit the partitioner
would replicate the operands. `shard_map` sidesteps that by handing each
device its local (B, H/axis, L, D) block, inside which the Pallas kernel
(or the XLA fallback off-TPU) runs unmodified.

The reference has no tensor parallelism at all (SURVEY.md §2.6); this is
the TPU-native path for serving the 8B model bf16 on a v5e-4/8 slice.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:  # moved out of experimental in newer JAX
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mmada_tpu.core.mesh import DATA_AXIS, FSDP_AXIS
from mmada_tpu.ops.attention import (
    _is_tpu_backend,
    _pallas_shape_eligible,
    bidirectional_attention,
)


def best_batch_axes(
    batch_size: int,
    mesh: Mesh,
    axis_names: Sequence[str] = (DATA_AXIS, FSDP_AXIS),
) -> tuple[str, ...]:
    """Longest prefix of `axis_names` (present in the mesh with size > 1)
    whose combined size divides `batch_size`. shard_map requires exact
    divisibility, unlike GSPMD which pads — so a batch that does not divide
    the full data×fsdp product degrades gracefully to fewer axes
    (the dropped axes then see a replicated batch)."""
    axes = tuple(a for a in axis_names if mesh.shape.get(a, 1) > 1)
    while axes:
        total = int(np.prod([mesh.shape[a] for a in axes]))
        if batch_size % total == 0:
            return axes
        axes = axes[:-1]
    return ()


def tp_attention(
    q: jax.Array,  # (B, H, L, D)
    k: jax.Array,  # (B, KVH, L, D)
    v: jax.Array,  # (B, KVH, L, D)
    mesh: Mesh,
    axis_name: str = "tensor",
    bias: Optional[jax.Array] = None,  # (B|1, 1|H, L, L)
    softmax_dtype: jnp.dtype = jnp.float32,
    impl: str = "auto",
    batch_axes: Sequence[str] = (),
    rope_sin: Optional[jax.Array] = None,  # (L, D) — q/k arrive UN-roped
    rope_cos: Optional[jax.Array] = None,
) -> jax.Array:
    """Head-sharded attention over `axis_name`. H and KVH must divide the
    axis size (GQA groups stay intact on one device so the kernel's
    head-repeat indexing is purely local: with contiguous head blocks,
    local q-head r maps to local kv-head r // (H/KVH) exactly as globally).
    `batch_axes` additionally shards the batch dim (activations in the
    model forward are batch-sharded over data×fsdp; without this the
    shard_map would all-gather the batch onto every device). A
    (B|1, 1, L, L) bias is broadcast to every head shard; a per-head bias
    shards with the heads."""
    axis_size = mesh.shape[axis_name]
    n_heads, n_kv = q.shape[1], k.shape[1]
    if n_heads % axis_size or n_kv % axis_size:
        raise ValueError(
            f"heads ({n_heads}, kv {n_kv}) must divide mesh axis "
            f"'{axis_name}' of size {axis_size}"
        )
    b_ax = tuple(batch_axes) or None
    if b_ax:
        total = int(np.prod([mesh.shape[a] for a in b_ax]))
        if q.shape[0] % total:
            raise ValueError(
                f"batch {q.shape[0]} must divide batch_axes {b_ax} "
                f"of total size {total}"
            )

    head_spec = P(b_ax, axis_name, None, None)
    if bias is None:
        bias_spec = None
    elif bias.shape[1] == 1:
        bias_spec = P(b_ax if bias.shape[0] != 1 else None, None, None, None)
    else:
        bias_spec = P(b_ax if bias.shape[0] != 1 else None, axis_name, None, None)

    has_rope = rope_sin is not None

    def local(q_blk, k_blk, v_blk, *rest):
        rest = list(rest)
        b = rest.pop(0) if bias is not None else None
        r_sin = rest.pop(0) if has_rope else None
        r_cos = rest.pop(0) if has_rope else None
        # resolve 'auto' on the LOCAL shard shapes: inside shard_map the
        # partitioning is manual, so the multi-chip gate in
        # ops.attention._pallas_eligible must not apply
        local_impl = impl
        if impl == "auto":
            local_impl = (
                "pallas"
                if _is_tpu_backend() and _pallas_shape_eligible(q_blk, k_blk, b)
                else "xla"
            )
        return bidirectional_attention(
            q_blk, k_blk, v_blk, bias=b,
            softmax_dtype=softmax_dtype, impl=local_impl,
            rope_sin=r_sin, rope_cos=r_cos,
        )

    in_specs = (head_spec, head_spec, head_spec)
    args = (q, k, v)
    if bias is not None:
        in_specs = in_specs + (bias_spec,)
        args = args + (bias,)
    if has_rope:
        # the (L, D) tables are position-indexed — replicated across every
        # head/batch shard
        in_specs = in_specs + (P(None, None), P(None, None))
        args = args + (rope_sin, rope_cos)
    # check_vma=False: the body is fully local per-shard attention (no
    # collectives), and a pallas_call inside shard_map cannot declare its
    # output's varying-mesh-axes under the newer check (its out_shape is a
    # plain ShapeDtypeStruct) — hit when AOT-compiling the TPU-target
    # serving program, where the kernel path is eligible inside shard_map
    fn = shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=head_spec,
        check_vma=False,
    )
    return fn(*args)
