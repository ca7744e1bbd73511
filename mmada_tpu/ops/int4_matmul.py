"""Pallas int4 grouped-quantized matmul — a CAPACITY mode (measured).

Built on the hypothesis that the weight-stream-bound cached decode step
(BASELINE.md: the batch-1 cached step is ~the 32-layer weight read) would
track the halved weight bytes. The end-to-end A/B (tools/bench_int4.py,
INT4_r03.json) refuted it on this chip: full-8B kv-cached text decodes at
0.61× int8 speed, because the kernel's HBM→VMEM stream tops out at
~30–66 GB/s — invariant to block geometry (a block-major re-layout with
fully-contiguous 1–2 MB per-block DMAs measured the same) and to the VPU
unpack math (a compute-ablated kernel is equally slow) — while XLA's own
dequant-in-dot prefetcher streams int8 weights ~2× faster. What survives
is the unconditional win: 8B block weights in ~5.1 GB (vs 8.6 int8) on a
16 GB chip — headroom for KV caches, batch growth, or a second resident
model. The reference has no quantization story at all (SURVEY.md §2 —
pure bf16 torch).

XLA cannot express this efficiently: a dot operand must be materialized, so
`x @ dequant(packed)` would WRITE the full bf16 weight to HBM each step
(4 B/param traffic — worse than int8). The kernel instead streams packed
bytes HBM→VMEM, sign-extends nibbles on the VPU, applies per-group scales,
and feeds bf16 tiles straight to the MXU — the dequantized weight never
touches HBM.

Layout (chosen so unpacking needs NO interleave, just two static slices):
  * weights are grouped along the contracting dim, GROUP=128 rows/group,
    one f32 scale per (group, out-channel) — absmax/7 symmetric;
  * within a group, packed byte row i (of 64) holds w[i] in bits 0-3 (lo)
    and w[i + 64] in bits 4-7 (hi): `w_group = concat(lo, hi)` is already
    in row order, no even/odd shuffle on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128          # quantization group size along the contracting dim
_PACK = GROUP // 2   # packed byte rows per group


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_int4(w: jax.Array):
    """Quantize (..., K, N) → (packed int8 (..., K/2, N), scales f32
    (..., K/group, N)). group is GROUP when K divides it (the kernel
    layout) else the whole column (per-channel — small/odd tensors; the
    XLA fallback handles those, `maybe_matmul` never routes them to the
    kernel). K must at least be even."""
    *lead, K, N = w.shape
    group = GROUP if K % GROUP == 0 else K
    if K % 2:
        raise ValueError(f"contracting dim {K} must be even to pack nibbles")
    wf = w.astype(jnp.float32).reshape(*lead, K // group, group, N)
    absmax = jnp.max(jnp.abs(wf), axis=-2)
    scales = jnp.maximum(absmax / 7.0, 1e-12)           # (..., K/g, N)
    q = jnp.clip(jnp.round(wf / scales[..., None, :]), -8, 7).astype(jnp.int32)
    half = group // 2
    lo, hi = q[..., :half, :], q[..., half:, :]
    packed = ((hi & 0xF) << 4) | (lo & 0xF)             # byte in [0, 255]
    return (
        packed.astype(jnp.int8).reshape(*lead, K // 2, N),
        scales,
    )


def _unpack_i32(p: jax.Array):
    """int8 byte → (lo, hi) int32 nibbles in [-8, 7]."""
    p32 = p.astype(jnp.int32)                            # sign-extends
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)    # arithmetic
    hi = jnp.right_shift(p32, 4)
    return lo, hi


def unpack_int4(packed: jax.Array, scales: jax.Array,
                dtype=jnp.bfloat16) -> jax.Array:
    """Dequantize back to (..., K, N) — the XLA reference/fallback path."""
    *lead, half_k, N = packed.shape
    n_groups = scales.shape[-2]
    lo, hi = _unpack_i32(packed.reshape(*lead, n_groups, half_k // n_groups, N))
    w = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)
    w = w * scales[..., None, :]
    return w.reshape(*lead, half_k * 2, N).astype(dtype)


def _int4_kernel(x_ref, wp_ref, s_ref, o_ref, acc_ref, *, n_k: int,
                 groups: int):
    """One (block_m, block_n) output tile, accumulating over the k grid."""
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n = wp_ref.shape[-1]
    lo, hi = _unpack_i32(wp_ref[:].reshape(groups, _PACK, n))
    w = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)  # (g, 128, n)
    w = w * s_ref[:][:, None, :]
    w = w.reshape(groups * GROUP, n).astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == n_k - 1)
    def _write():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def int4_matmul(
    x: jax.Array,
    packed: jax.Array,
    scales: jax.Array,
    *,
    block_m: int = 0,      # 0 → fit to M (≤512)
    block_n: int = 512,
    block_k: int = 1024,   # 8 GROUPs — the minimum legal scales tile
    interpret: bool = False,
) -> jax.Array:
    """x (..., K) @ dequant(packed (K/2, N), scales (K/GROUP, N)) → (..., N).

    Requires K % GROUP == 0 and N % 128 == 0 (all flagship and proxy matmul
    shapes qualify; `quantization.maybe_matmul` routes others to the XLA
    dequant fallback)."""
    *lead, K = x.shape
    N = packed.shape[-1]
    if K != packed.shape[-2] * 2:
        raise ValueError(f"x K={K} vs packed K/2={packed.shape[-2]}")
    if N % 128:
        raise ValueError(f"N={N} not 128-aligned")
    # Mosaic tiling: the scales block's first dim must be 8-divisible or
    # the FULL array dim — so the k tile is 8 groups (1024) when K divides
    # it (all flagship contracting dims do), else whole-K in one step.
    bk = block_k if K % block_k == 0 and (block_k // GROUP) % 8 == 0 else K
    if K % GROUP:
        raise ValueError(f"K={K} not a {GROUP} multiple")
    bn = block_n if N % block_n == 0 else 128
    x2 = x.reshape(-1, K)
    m = x2.shape[0]
    bm = block_m or min(512, _round_up(m, 128))
    mp = _round_up(m, bm)
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    groups = bk // GROUP
    grid = (mp // bm, N // bn, K // bk)
    out = pl.pallas_call(
        functools.partial(_int4_kernel, n_k=grid[2], groups=groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * K * N,
            bytes_accessed=mp * K * x.dtype.itemsize
            + (K // 2) * N * (mp // bm)
            + mp * N * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2, packed, scales)
    if mp != m:
        out = out[:m]
    return out.reshape(*lead, N)
