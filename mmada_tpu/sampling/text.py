"""Semi-autoregressive masked-diffusion text generation, fully on device.

Algorithm parity with the reference `generate()` (generate.py:43-113) and
`MMadaModelLM.mmu_generate` (models/modeling_mmada.py:388-481): the answer
span is split into blocks; within each block every step runs a full forward,
Gumbel-argmaxes a candidate token everywhere, scores candidates by softmax
confidence (or uniform noise for 'random' remasking), and commits exactly
`num_transfer_tokens` highest-confidence candidates per row, leaving the
rest masked.

TPU-native differences:
  * the per-step loop is `lax.scan`; the per-row dynamic top-k transfer is a
    vectorized rank threshold (sampling/gumbel.py:select_top_k_dynamic), so
    one denoise step is one XLA program with zero host round-trips —
    the reference does a Python `torch.topk` loop per row per step
    (generate.py:108-110);
  * Gumbel noise is fp32 log-space instead of f64 `exp/pow` (see
    sampling/gumbel.py docstring) — exact at temperature 0;
  * classifier-free guidance doubles the batch inside the jitted step
    instead of re-dispatching (generate.py:80-86 semantics preserved:
    uncond row = prompt re-masked, combine `un + (s+1)(c-un)`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mmada_tpu.sampling.gumbel import (
    NEG_INF,
    confidence_of,
    gumbel_argmax,
    gumbel_noise,
    select_top_k_dynamic,
)

ForwardFn = Callable[[jax.Array], jax.Array]  # tokens (B, L) -> logits (B, L, V)

# (tokens (B, L), span_start traced int) -> logits (B, block_length, V):
# the model evaluates its vocab head ONLY over the current block's
# positions (llada.forward logit_positions dynamic form). Semi-AR steps
# never consume logits outside the active block — positions beyond it are
# frozen and earlier blocks are fully committed — so restricting the head
# is exact, and it skips ~(1 - block/L) of the 134k-row head matmul AND
# the (B, L, V) fp32 logits materialization (643 MB/step at MMU shapes).
WindowForwardFn = Callable[[jax.Array, jax.Array], jax.Array]


def as_window_forward_fn(forward_fn: ForwardFn, block_length: int) -> WindowForwardFn:
    """Adapt a full-logits forward to the windowed contract (for callers
    without head-position support — computes full logits, then slices)."""

    def wfn(tokens, start):
        logits = forward_fn(tokens)
        return jax.lax.dynamic_slice_in_dim(logits, start, block_length, axis=1)

    return wfn


# Block-KV-cache contract (Fast-dLLM-style DualCache; arXiv 2505.22618's
# pattern, built here on llada.forward_kv_capture / forward_kv_step):
#   CaptureFn: tokens (B, L) -> opaque per-layer KV pytree, run ONCE per
#     block on the full sequence;
#   CachedStepFn: (block_tokens (B, blk), kv, block_start) -> (B, blk, V)
#     logits, run per denoise step over only the block's positions.
# Out-of-block K/V are frozen within a block, so cached sampling is an
# APPROXIMATION of the exact sampler (exact when steps_per_block == 1);
# callers opt in explicitly (MMadaModel.generate(block_kv_cache=True)).
CaptureFn = Callable[[jax.Array], object]
CachedStepFn = Callable[[jax.Array, object, jax.Array], jax.Array]


def _windowed_block_logits_fn(cfg: "SemiARConfig", window_forward_fn,
                              prompt_index):
    """Exact mode: every step runs the full-sequence forward (block-windowed
    head). CFG doubles the batch with the prompt re-masked (generate.py:80-86)."""

    def fn(x, x_blk, block_start):
        if cfg.cfg_scale > 0.0:
            un_x = jnp.where(prompt_index, cfg.mask_id, x)
            logits2 = window_forward_fn(
                jnp.concatenate([x, un_x], axis=0), block_start
            )
            cond, uncond = jnp.split(logits2, 2, axis=0)
            return uncond + (cfg.cfg_scale + 1.0) * (cond - uncond)
        return window_forward_fn(x, block_start)

    return fn


def _cached_block_logits_fn(cfg: "SemiARConfig", step_fn: CachedStepFn, kv):
    """Cached mode: per-step forward touches only the block's tokens. For
    CFG the capture already ran on [x; un_x] (doubled batch), and the
    uncond row's block slice equals x's (prompt positions never lie inside
    the generation region), so the step just doubles x_blk."""

    def fn(x, x_blk, block_start):
        if cfg.cfg_scale > 0.0:
            logits2 = step_fn(
                jnp.concatenate([x_blk, x_blk], axis=0), kv, block_start
            )
            cond, uncond = jnp.split(logits2, 2, axis=0)
            return uncond + (cfg.cfg_scale + 1.0) * (cond - uncond)
        return step_fn(x_blk, kv, block_start)

    return fn


def _capture_block_kv(cfg: "SemiARConfig", capture_fn: CaptureFn, x,
                      prompt_index):
    """Run the once-per-block capture; CFG captures cond and uncond rows in
    one doubled batch so both caches exist for the block's steps."""
    if cfg.cfg_scale > 0.0:
        un_x = jnp.where(prompt_index, cfg.mask_id, x)
        return capture_fn(jnp.concatenate([x, un_x], axis=0))
    return capture_fn(x)


def num_transfer_schedule(mask_counts: jax.Array, steps: int) -> jax.Array:
    """(B,) masked counts -> (B, steps) per-step commit counts: uniform split
    with the remainder spread over the first steps (generate.py:22-40)."""
    base = mask_counts // steps
    rem = mask_counts % steps
    step_idx = jnp.arange(steps)
    return base[:, None] + (step_idx[None, :] < rem[:, None]).astype(base.dtype)


@dataclasses.dataclass(frozen=True)
class SemiARConfig:
    gen_length: int = 128
    steps: int = 128
    block_length: int = 128
    temperature: float = 0.0
    cfg_scale: float = 0.0
    remasking: str = "low_confidence"  # or 'random'
    mask_id: int = 126336
    parallel_threshold: float = 0.0
    """Confidence-parallel decoding (opt-in, 0 = off): each step commits
    the scheduled top-k PLUS every candidate whose softmax confidence
    clears this threshold, and the block's step loop becomes a
    `lax.while_loop` that exits as soon as the block has no masks left.
    Never slower than the exact schedule (the scheduled commits are the
    floor; the step budget is the ceiling) and equals it exactly when the
    threshold never fires (τ > 1). Approximate in the same sense as
    MaskGIT itself — more tokens finalize per forward. Intended for
    'low_confidence' remasking (the threshold compares probabilities)."""
    parallel_warmup_steps: int = 0
    """Confidence-parallel decoding only (0 = off): the τ threshold only
    fires from this step index on within each block; the first K steps
    commit the scheduled top-k alone. Motivation (BASELINE.md round-3r):
    approximation damage concentrates in the EARLY steps of a block,
    where most positions are masked and confidence is least calibrated —
    the same steps where τ-parallel commits the most extra tokens. A
    small warmup keeps most of the speed (late steps still batch-commit)
    while skipping the unreliable commits; quality/speed sweep:
    tools/parallel_sweep.py warmup mode, PARALLEL_WARMUP_r03.json."""
    cache_refresh_every: int = 0
    """KV-cached decode only (0 = capture once per block): re-capture the
    full-sequence K/V every N denoise steps WITHIN a block, bounding the
    out-of-block freeze staleness to N steps of in-block reveals. Each
    refresh costs one full-sequence forward; refresh=1 re-captures before
    every step, making the cached decode token-exact vs the uncached
    sampler (pinned in tests/test_kv_cache.py) — the text twin of
    t2i's MaskGITConfig.cache_refresh_every. This is the quality knob the
    truth-anchored gate demotion points at: block-KV freeze measured
    −6pp memorized-span accuracy on the trained proxy (BASELINE.md
    round-3q); KV_REFRESH_r03.json maps the cadence/quality frontier."""

    def __post_init__(self):
        if self.parallel_threshold > 0.0 and self.remasking != "low_confidence":
            raise ValueError(
                "parallel_threshold compares softmax confidences; with "
                f"remasking={self.remasking!r} the per-step score is "
                "uniform noise and the threshold would commit tokens by "
                "coin-flip"
            )
        if self.gen_length % self.block_length:
            raise ValueError("gen_length must be divisible by block_length")
        nb = self.gen_length // self.block_length
        if self.steps % nb:
            raise ValueError("steps must be divisible by num_blocks")

    @property
    def num_blocks(self) -> int:
        return self.gen_length // self.block_length

    @property
    def steps_per_block(self) -> int:
        return self.steps // self.num_blocks


def _denoise_step(
    x: jax.Array,              # (B, L) current tokens
    key: Optional[jax.Array],
    num_transfer: jax.Array,   # (B,) commits this step
    block_logits_fn,           # (x, x_blk, block_start) -> (B, blk, V)
    block_end,                 # int or traced scalar — end of active block
    cfg: SemiARConfig,
    step_idx=None,             # traced in-block step (parallel warmup gate)
) -> jax.Array:
    """One denoise step, computed block-restricted.

    Equivalent to the reference's full-sequence step (generate.py:88-110):
    positions >= block_end are frozen (the reference sets their confidence
    to -inf) and positions before the block are fully committed by the
    transfer schedule, so only the active block's logits can ever change
    `x`. Restricting candidate/confidence/top-k to the block is therefore
    exact — and lets the model skip the vocab head outside the block.
    `block_logits_fn` supplies the (already CFG-combined) block logits —
    either the exact full-sequence forward or the KV-cached block step."""
    b = x.shape[0]
    blk = cfg.block_length
    block_start = block_end - blk
    x_blk = jax.lax.dynamic_slice(x, (0, block_start), (b, blk))
    mask_blk = x_blk == cfg.mask_id

    logits = block_logits_fn(x, x_blk, block_start)
    logits = logits.astype(jnp.float32)           # (B, blk, V)

    if key is not None:
        key_tok, key_conf = jax.random.split(key)
    else:
        key_tok = key_conf = None

    x0 = gumbel_argmax(logits, key_tok, cfg.temperature).astype(x.dtype)

    if cfg.remasking == "low_confidence":
        x0_p = confidence_of(logits, x0)
    elif cfg.remasking == "random":
        x0_p = jax.random.uniform(key_conf, x_blk.shape, jnp.float32)
    else:
        raise ValueError(
            f"unknown remasking {cfg.remasking!r}; "
            "expected 'low_confidence' or 'random'"
        )

    x0 = jnp.where(mask_blk, x0, x_blk)
    confidence = jnp.where(mask_blk, x0_p, NEG_INF)

    transfer = select_top_k_dynamic(confidence, num_transfer)
    if cfg.parallel_threshold > 0.0:
        # confidence-parallel decoding: ALSO commit every masked candidate
        # above the threshold (scheduled top-k stays the progress floor).
        # Committing a non-mask position is a no-op (x0 == x_blk there).
        fire = confidence >= cfg.parallel_threshold
        if cfg.parallel_warmup_steps > 0:
            # warmup: the threshold only fires once the block has revealed
            # K steps of context (early commits are the damage source).
            # step_idx is scalar, or per-row (B,) from the engine's
            # continuous-batching chunk runner (rows at different
            # in-block progress) — broadcast over the (B, blk) mask.
            si = jnp.asarray(step_idx)
            if si.ndim:
                si = si[:, None]
            fire = jnp.logical_and(fire, si >= cfg.parallel_warmup_steps)
        transfer = transfer | fire
    new_blk = jnp.where(transfer, x0, x_blk)
    return jax.lax.dynamic_update_slice(x, new_blk, (0, block_start))


def _block_logits_and_refresh(cfg, x, prompt_index, window_forward_fn,
                              cache_fns):
    """Build (block_logits_fn, refresh_ctx) for one block: the exact
    windowed fn, or the cached fn plus — when `cache_refresh_every` is
    set — the refresh context (_run_block_steps contract)."""
    if cache_fns is None:
        return _windowed_block_logits_fn(
            cfg, window_forward_fn, prompt_index
        ), None
    kv = _capture_block_kv(cfg, cache_fns[0], x, prompt_index)
    block_logits_fn = _cached_block_logits_fn(cfg, cache_fns[1], kv)
    refresh_ctx = None
    if cfg.cache_refresh_every > 0:
        refresh_ctx = (
            lambda xc: _capture_block_kv(cfg, cache_fns[0], xc, prompt_index),
            lambda kv_: _cached_block_logits_fn(cfg, cache_fns[1], kv_),
            kv,
        )
    return block_logits_fn, refresh_ctx


def _run_block_steps(cfg, x, block_logits_fn, block_end, step_keys,
                     transfers, needs_key, collect_states,
                     refresh_ctx=None, step_offset=0):
    """Inner per-block denoise loop — ONE implementation for every mode
    combination. Normally a `lax.scan` over the fixed step schedule; with
    `parallel_threshold` it becomes a `lax.while_loop` that exits as soon
    as the block has no masks left — the forwards for trailing no-op
    steps are never launched.

    `refresh_ctx=(recapture, logits_of_kv, kv0)` (cached mode with
    `cache_refresh_every > 0` only): the K/V cache rides the loop carry
    and is re-captured from the CURRENT tokens every N steps via
    `lax.cond` — the same carry pattern as t2i's refresh
    (sampling/t2i._make_step). Without it the carry's kv slot is None (an
    empty pytree — costs nothing) and the logits fn is constant.

    `step_offset` (scalar, or per-row (B,) in warmup-only runners) is
    this invocation's first IN-BLOCK step index — segmented chunk
    runners pass their chunk start so step-indexed semantics (refresh
    cadence, parallel warmup) bind to the block position exactly as in
    the monolithic scan (the bit-exactness invariant,
    tests/test_segmented.py)."""
    refresh = cfg.cache_refresh_every
    offs = jnp.asarray(step_offset, jnp.int32)
    if refresh_ctx is not None and refresh > 0:
        if offs.ndim:
            raise ValueError(
                "per-row step offsets cannot combine with cache refresh "
                "(the refresh lax.cond needs a scalar step; per-row "
                "runners never enable kv caching)"
            )
        recapture, logits_of_kv, kv0 = refresh_ctx

        def _maybe_refresh(it, xc, kv):
            step = offs + it
            return jax.lax.cond(
                jnp.logical_and(step > 0, step % refresh == 0),
                lambda a: recapture(a[0]),
                lambda a: a[1],
                (xc, kv),
            )
    else:
        kv0 = None
        logits_of_kv = None

        def _maybe_refresh(it, xc, kv):
            return kv

    def _logits_fn(kv):
        return block_logits_fn if logits_of_kv is None else logits_of_kv(kv)

    if cfg.parallel_threshold > 0.0:
        if collect_states:
            raise ValueError(
                "parallel_threshold has a data-dependent step count and "
                "cannot collect a fixed-shape trajectory; use the exact "
                "sampler for stepwise visualization"
            )
        b = x.shape[0]
        spb = transfers.shape[1]

        def cond(carry):
            xc, it, _ = carry
            blk = jax.lax.dynamic_slice(
                xc, (0, block_end - cfg.block_length), (b, cfg.block_length)
            )
            return jnp.logical_and(it < spb, jnp.any(blk == cfg.mask_id))

        def body(carry):
            xc, it, kv = carry
            kv = _maybe_refresh(it, xc, kv)
            xc = _denoise_step(
                xc,
                step_keys[it] if needs_key else None,
                transfers[:, it],
                _logits_fn(kv),
                block_end,
                cfg,
                step_idx=offs + it,
            )
            return xc, it + 1, kv

        x, _, _ = jax.lax.while_loop(cond, body, (x, jnp.int32(0), kv0))
        return x, None

    def step(carry, sinp):
        xc, kv = carry
        it, step_key, n_transfer = sinp
        kv = _maybe_refresh(it, xc, kv)
        x_next = _denoise_step(
            xc,
            step_key if needs_key else None,
            n_transfer,
            _logits_fn(kv),
            block_end,
            cfg,
            step_idx=offs + it,
        )
        return (x_next, kv), (x_next if collect_states else None)

    steps_idx = jnp.arange(transfers.shape[1], dtype=jnp.int32)
    (x, _), states = jax.lax.scan(
        step, (x, kv0), (steps_idx, step_keys, transfers.T)
    )
    return x, states


def _block_key_schedule(key, num_blocks: int, spb: int):
    """Per-(block, step) PRNG keys with the same derivation order the
    original per-block host loop used (`key, sub = split(key)` per block,
    then `split(sub, spb)`), so fixed-seed outputs are stable across the
    nested-scan refactor."""
    per_block = []
    for _ in range(num_blocks):
        key, sub = jax.random.split(key)
        per_block.append(jax.random.split(sub, spb))
    return jnp.stack(per_block)  # (num_blocks, spb) typed keys


def _generate_scan(
    forward_fn: Optional[ForwardFn],
    prompt: jax.Array,  # (B, P) int32 — no masks inside
    cfg: SemiARConfig,
    key: Optional[jax.Array],
    collect_states: bool,
    window_forward_fn: Optional[WindowForwardFn] = None,
    cache_fns: Optional[tuple[CaptureFn, CachedStepFn]] = None,
):
    """Shared nested-scan driver: outer `lax.scan` over blocks, inner over
    denoise steps. One traced block body regardless of `num_blocks` — the
    old per-block Python loop unrolled the whole scan per block, multiplying
    XLA program size (and remote-compile time on a tunneled chip) by
    `num_blocks` for identical code.

    With `cache_fns` the block body first captures full-sequence K/V, then
    every step forwards only the block's tokens (approximate, see the
    CaptureFn contract)."""
    b, p = prompt.shape
    if window_forward_fn is None and cache_fns is None:
        window_forward_fn = as_window_forward_fn(forward_fn, cfg.block_length)
    x = jnp.concatenate(
        [
            prompt.astype(jnp.int32),
            jnp.full((b, cfg.gen_length), cfg.mask_id, jnp.int32),
        ],
        axis=1,
    )
    prompt_index = x != cfg.mask_id
    spb = cfg.steps_per_block
    nb = cfg.num_blocks

    needs_key = cfg.temperature > 0 or cfg.remasking == "random"
    if needs_key and key is None:
        raise ValueError("stochastic sampling requires a PRNG key")
    if needs_key:
        block_keys = _block_key_schedule(key, nb, spb)
    else:
        block_keys = jnp.zeros((nb, spb, 2), jnp.uint32)  # unused placeholder

    def block_body(x, inp):
        block_idx, step_keys = inp
        block_start = p + block_idx * cfg.block_length
        block_end = block_start + cfg.block_length
        block_slice = jax.lax.dynamic_slice(
            x, (0, block_start), (b, cfg.block_length)
        )
        block_mask = (block_slice == cfg.mask_id).sum(axis=1)
        transfers = num_transfer_schedule(block_mask, spb)  # (B, spb)

        block_logits_fn, refresh_ctx = _block_logits_and_refresh(
            cfg, x, prompt_index, window_forward_fn, cache_fns
        )
        return _run_block_steps(
            cfg, x, block_logits_fn, block_end, step_keys, transfers,
            needs_key, collect_states, refresh_ctx=refresh_ctx,
        )

    block_idx = jnp.arange(nb, dtype=jnp.int32)
    x, states = jax.lax.scan(block_body, x, (block_idx, block_keys))
    return x, states


def generate(
    forward_fn: Optional[ForwardFn],
    prompt: jax.Array,  # (B, P) int32 — no masks inside
    cfg: SemiARConfig,
    key: Optional[jax.Array] = None,
    window_forward_fn: Optional[WindowForwardFn] = None,
    cache_fns: Optional[tuple[CaptureFn, CachedStepFn]] = None,
) -> jax.Array:
    """Generate `(B, P + gen_length)` tokens. Deterministic at T=0 with
    'low_confidence' remasking (the golden-parity configuration).

    Pass `window_forward_fn` (position-windowed head) to skip the vocab
    head outside the active block — exact, and the big batch-1 latency
    lever; `forward_fn` alone still works (full head, sliced after).
    `cache_fns` switches to the approximate block-KV-cached decode."""
    x, _ = _generate_scan(
        forward_fn, prompt, cfg, key, collect_states=False,
        window_forward_fn=window_forward_fn, cache_fns=cache_fns,
    )
    return x


def generate_stepwise(
    forward_fn: Optional[ForwardFn],
    prompt: jax.Array,  # (B, P)
    cfg: SemiARConfig,
    key: Optional[jax.Array] = None,
    window_forward_fn: Optional[WindowForwardFn] = None,
    cache_fns: Optional[tuple[CaptureFn, CachedStepFn]] = None,
) -> jax.Array:
    """Like `generate`, but returns the full denoising trajectory
    `(steps, B, P + gen_length)` — the token state after every step. Powers
    per-step streaming visualization (the reference demo's HighlightedText
    MASK/GEN token states, app.py:116-165). The trajectory comes out of the
    scans' stacked outputs, so it is still one XLA program; the final row
    equals `generate`'s output exactly."""
    _, states = _generate_scan(
        forward_fn, prompt, cfg, key, collect_states=True,
        window_forward_fn=window_forward_fn, cache_fns=cache_fns,
    )
    # (num_blocks, spb, B, L) -> (steps, B, L), block-major like the old
    # per-block concatenation
    return states.reshape((-1,) + states.shape[2:])


def run_block_eager(
    cfg: SemiARConfig,
    x: jax.Array,
    prompt_index: jax.Array,
    block_end: jax.Array,
    step_keys: jax.Array,
    transfers: jax.Array,
    *,
    window_forward_fn: Optional[WindowForwardFn] = None,
    cache_fns: Optional[tuple[CaptureFn, CachedStepFn]] = None,
    collect_states: bool = False,
    step_offset=0,
) -> jax.Array:
    """One block of denoise steps as an eager `lax.scan`. `block_end` is a
    TRACED scalar so every block produces the same jaxpr. Callers that can
    pass their parameters as explicit jit arguments should wrap this in a
    module-level `jax.jit` (see models/mmada._early_stop_block) — that is
    what makes blocks 2..N reuse block 1's executable.

    `step_offset` (traced scalar, or per-row (B,)): the chunk's first
    in-block step index — segmented callers MUST pass it so step-indexed
    semantics (refresh cadence, parallel warmup) match the monolithic
    scan (see _run_block_steps)."""
    needs_key = cfg.temperature > 0 or cfg.remasking == "random"

    block_logits_fn, refresh_ctx = _block_logits_and_refresh(
        cfg, x, prompt_index, window_forward_fn, cache_fns
    )
    x, states = _run_block_steps(
        cfg, x, block_logits_fn, block_end, step_keys, transfers,
        needs_key, collect_states=collect_states, refresh_ctx=refresh_ctx,
        step_offset=step_offset,
    )
    # collect_states: (x, (W, B, L) per-step token states) — powers the
    # chunked stepwise stream (SegmentedRun(collect_states=True))
    return (x, states) if collect_states else x


def generate_segmented(
    forward_fn: Optional[ForwardFn],
    prompt: jax.Array,  # (B, P) int32 — no masks inside
    cfg: SemiARConfig,
    key: Optional[jax.Array] = None,
    segment_steps: int = 64,
    window_forward_fn: Optional[WindowForwardFn] = None,
    run_block: Optional[Callable] = None,
) -> jax.Array:
    """Token-exact `generate`, executed as MULTIPLE device programs: a
    host loop over blocks and over ≤`segment_steps`-step chunks of each
    block's denoise scan. Needed where single-execution wall time is
    bounded — the tunneled axon TPU worker kills any execution at ~60 s
    (measured: 56.6 s runs, 61.1 s crashes the worker; BASELINE.md
    round-3f), which the reference MMU operating point (512 steps × ~240
    ms at 8B) exceeds 2×. Chunking a `lax.scan` over precomputed
    (step_keys, transfers) rows is associative in the carry `x`, so
    outputs are bit-identical to `generate` wherever the forward's
    numerics are program-independent: pinned exactly on CPU
    (tests/test_segmented.py, all chunk sizes, det + stochastic). On TPU
    the chunk program and the whole-scan program are *different XLA
    programs*, so bf16 near-ties can resolve differently across them —
    measured round-3g: a random tiny model flips 2/80 tokens vs
    `generate` while every chunk size agrees with every other BIT-exactly
    and each path is self-deterministic; the trained 165M proxy is
    token-EXACT at seg 4 and 16 (margin starvation, the same class
    QUANT_r02/r03 document for int8). Exact sampler only: `cache_fns` is
    deliberately unsupported (per-chunk K/V recapture would *change* the
    block-cache staleness semantics, not just the schedule).

    `run_block(cfg, x, prompt_index, block_end, step_keys, transfers,
    step_offset)` may be injected (models/mmada uses a jitted
    model-as-argument runner); by default chunks run `run_block_eager`.
    The traced `step_offset` is the chunk's first in-block step — it
    keeps step-indexed semantics (parallel warmup) identical to the
    monolithic scan.
    """
    run = SegmentedRun(
        prompt, cfg, key=key, segment_steps=segment_steps,
        forward_fn=forward_fn, window_forward_fn=window_forward_fn,
        run_block=run_block,
    )
    while not run.step():
        pass
    return run.x


class SegmentedRun:
    """Incremental state of one segmented generation: `step()` executes
    ONE ≤segment_steps-step device program and returns True when the
    final chunk has run; read `.x` for the (B, P + gen_length) tokens.

    `generate_segmented` drains this to completion; the serving engine
    instead interleaves `step()` calls of concurrent runs at chunk
    granularity (serve/engine.py), so a heavy generation no longer
    head-of-line-blocks short requests for its full duration — the
    device is yielded every chunk.

    `row_keys` (a (B,) array of typed PRNG keys, stochastic only) gives
    every row its own key schedule and runs chunks as a vmap of batch-1
    blocks — the same per-row construction as the engine's batched
    stochastic path (engine._jit_text_per_row_keys), so each row is
    bit-identical to its solo run regardless of batch composition.
    Mutually exclusive with `key`.
    """

    def __init__(self, prompt, cfg: SemiARConfig, key=None, row_keys=None,
                 segment_steps: int = 64, forward_fn=None,
                 window_forward_fn=None, run_block=None,
                 collect_states: bool = False):
        if segment_steps < 1:
            raise ValueError(
                f"segment_steps must be >= 1, got {segment_steps}"
            )
        if key is not None and row_keys is not None:
            raise ValueError("pass key or row_keys, not both")
        b, p = prompt.shape
        self.cfg = cfg
        self.x = jnp.concatenate(
            [
                prompt.astype(jnp.int32),
                jnp.full((b, cfg.gen_length), cfg.mask_id, jnp.int32),
            ],
            axis=1,
        )
        self._prompt_index = self.x != cfg.mask_id
        self._p = p
        spb, nb = cfg.steps_per_block, cfg.num_blocks

        needs_key = cfg.temperature > 0 or cfg.remasking == "random"
        if needs_key and key is None and row_keys is None:
            raise ValueError("stochastic sampling requires a PRNG key")
        if row_keys is not None and not needs_key:
            # callers select the per-row vmapped runner on row_keys; with
            # deterministic settings the zero-key schedule has the wrong
            # shape for it, so fail loudly instead of deep inside vmap
            raise ValueError(
                "row_keys requires stochastic sampling (temperature > 0 "
                "or remasking='random'); pass key=None for deterministic"
            )
        self._per_row = needs_key and row_keys is not None
        if self._per_row:
            # (B, nb, spb) typed keys — row i's schedule is exactly the
            # schedule of a solo run with row_keys[i]
            self._block_keys = jax.vmap(
                lambda k: _block_key_schedule(k, nb, spb)
            )(row_keys)
        elif needs_key:
            self._block_keys = _block_key_schedule(key, nb, spb)
        else:
            self._block_keys = jnp.zeros((nb, spb, 2), jnp.uint32)

        # collect_states: each chunk also returns its (W, B, L)
        # per-step token states (self.last_states) — powers the streamed
        # stepwise demo (frames shown while later chunks compute).
        # Per-row keys don't compose with it (no caller needs both).
        self.collect_states = collect_states
        self.last_states = None
        if collect_states and self._per_row:
            raise ValueError("collect_states + row_keys is unsupported")
        if run_block is None:
            if window_forward_fn is None:
                window_forward_fn = as_window_forward_fn(
                    forward_fn, cfg.block_length
                )
            if self._per_row:
                def run_block(cfg_, x_, pi_, be_, sk_, tr_, so_):
                    def row(xr, pir, kr, trr):
                        return run_block_eager(
                            cfg_, xr[None], pir[None], be_, kr, trr[None],
                            window_forward_fn=window_forward_fn,
                            step_offset=so_,
                        )[0]
                    return jax.vmap(row)(x_, pi_, sk_, tr_)
            else:
                def run_block(cfg_, x_, pi_, be_, sk_, tr_, so_):
                    return run_block_eager(
                        cfg_, x_, pi_, be_, sk_, tr_,
                        window_forward_fn=window_forward_fn,
                        collect_states=collect_states,
                        step_offset=so_,
                    )
        self._run_block = run_block

        self.total_chunks = nb * -(-spb // segment_steps)
        self.chunks_done = 0
        self.done = nb == 0
        self._gen = self._chunks(segment_steps, spb, nb)

    def _chunks(self, segment_steps, spb, nb):
        for bi in range(nb):
            block_start = self._p + bi * self.cfg.block_length
            block_end = block_start + self.cfg.block_length
            block_mask = (
                self.x[:, block_start:block_end] == self.cfg.mask_id
            ).sum(axis=1)
            transfers = num_transfer_schedule(block_mask, spb)  # (B, spb)
            for s0 in range(0, spb, segment_steps):
                s1 = min(s0 + segment_steps, spb)
                keys = (self._block_keys[:, bi, s0:s1] if self._per_row
                        else self._block_keys[bi, s0:s1])
                out = self._run_block(
                    self.cfg, self.x, self._prompt_index,
                    jnp.int32(block_end), keys, transfers[:, s0:s1],
                    jnp.int32(s0),
                )
                if self.collect_states:
                    self.x, self.last_states = out
                else:
                    self.x = out
                yield

    def step(self) -> bool:
        """Run ONE chunk program; True once the generation is complete."""
        if not self.done:
            try:
                next(self._gen)
                self.chunks_done += 1
            except StopIteration:  # pragma: no cover — guarded by done
                self.done = True
                return True
            self.done = self.chunks_done >= self.total_chunks
        return self.done


def generate_with_early_stop(
    forward_fn: Optional[ForwardFn],
    prompt: jax.Array,
    cfg: SemiARConfig,
    eot_token: int,
    key: Optional[jax.Array] = None,
    run_block: Optional[Callable] = None,
    window_forward_fn: Optional[WindowForwardFn] = None,
    cache_fns: Optional[tuple[CaptureFn, CachedStepFn]] = None,
) -> jax.Array:
    """`mmu_generate_fast` analog (modeling_mmada.py:484-556): after each
    block, stop if every row's block ends with EOT. The per-block scan stays
    jitted; only the one-bool stop check syncs to host, so best-case latency
    drops proportionally to blocks skipped.

    `run_block(cfg, x, prompt_index, block_end, step_keys, transfers)`
    executes one block; model-aware callers inject a jitted runner whose
    parameters are jit arguments (models/mmada.py), which both avoids
    lowering weights as HLO constants and caches ONE executable across all
    blocks and calls."""
    b, p = prompt.shape
    x = jnp.concatenate(
        [
            prompt.astype(jnp.int32),
            jnp.full((b, cfg.gen_length), cfg.mask_id, jnp.int32),
        ],
        axis=1,
    )
    prompt_index = x != cfg.mask_id
    spb = cfg.steps_per_block
    needs_key = cfg.temperature > 0 or cfg.remasking == "random"

    block_cfg = dataclasses.replace(
        cfg, gen_length=cfg.block_length, steps=spb, block_length=cfg.block_length
    )

    if run_block is None:
        # fallback: eager scan per block. NOT jax.jit — forward_fn closes
        # over model params, and jit would lower them as module constants
        # (pathological with remote compilation).
        if cache_fns is not None:
            run_block = partial(run_block_eager, cache_fns=cache_fns)
        else:
            if window_forward_fn is None:
                window_forward_fn = as_window_forward_fn(
                    forward_fn, cfg.block_length
                )
            run_block = partial(
                run_block_eager, window_forward_fn=window_forward_fn
            )

    for block in range(cfg.num_blocks):
        block_start = p + block * cfg.block_length
        block_end = p + (block + 1) * cfg.block_length
        block_mask = (x[:, block_start:block_end] == cfg.mask_id).sum(axis=1)
        transfers = num_transfer_schedule(block_mask, spb)
        if needs_key:
            key, sub = jax.random.split(key)
            step_keys = jax.random.split(sub, spb)
        else:
            step_keys = jnp.zeros((spb, 2), jnp.uint32)
        x = run_block(
            block_cfg, x, prompt_index, jnp.int32(block_end), step_keys,
            transfers,
        )
        if bool(jnp.all(x[:, block_end - 1] == eot_token)):
            break
    return x
