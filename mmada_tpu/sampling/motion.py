"""MaskGIT text-to-motion generation over the motion vocab window.

Parity with `t2m_generate` (models/modelling_ours.py:557-682). Differences
from the t2i loop that the reference bakes in (and we reproduce):

  * no classifier-free guidance;
  * temperature anneal is *fresh* per step (`T·(1−ratio)`) rather than the
    compounding rebind in t2i (modeling_mmada.py:205);
  * the final step commits every remaining position (no remask), whereas
    t2i always keeps ≥1 masked.

The motion span is located by `<|som|>`/`<|eom|>` markers in the reference
at runtime (modelling_ours.py:585-603); here the span is static — the t2m
frame is fixed-layout `[pad]* <|t2m|> <bos> cap <eos> <|som|> motion <|eom|>`
(prompting/universal.py:t2m), so `span_start = L - n - 1`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mmada_tpu.sampling.gumbel import confidence_of, mask_by_random_topk
from mmada_tpu.sampling.schedules import cosine_schedule

WindowForwardFn = Callable[[jax.Array, Optional[jax.Array]], jax.Array]


@dataclasses.dataclass(frozen=True)
class MotionGITConfig:
    timesteps: int = 18
    temperature: float = 1.0
    noise_schedule: Callable = cosine_schedule
    mask_id: int = 126336
    num_motion_tokens: int = 256
    motion_vocab_size: int = 512
    motion_offset: int = 134656          # text_vocab + image codebook
    greedy: bool = False
    cache_refresh_every: int = 0         # cached decode: re-capture every N steps


def t2m_generate(
    forward_fn: WindowForwardFn,
    input_ids: jax.Array,                   # (B, L) full t2m frame
    cfg: MotionGITConfig,
    key: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    cache_fns=None,
) -> jax.Array:
    """Returns raw motion VQ codes `(B, num_motion_tokens)`.

    `cache_fns` (MMadaModel._span_cache_fns) enables the KV-cached decode:
    the static caption prefix's K/V are captured once and each step
    forwards only the motion span (same approximation as t2i)."""
    b, l = input_ids.shape
    n = cfg.num_motion_tokens
    span_lo = l - (n + 1)  # motion span inside frame ending with <|eom|>

    x, cur = init_carry(input_ids, cfg)  # cur: offset-space or mask_id

    if cache_fns is not None:
        capture_fn, step_fn = cache_fns
        kv = capture_fn(x)
        refresh = cfg.cache_refresh_every

    if key is None:
        key = jax.random.key(0)
    step_keys = jax.random.split(key, cfg.timesteps)

    cached = cache_fns is not None

    step = _make_step(forward_fn, cfg, b, n, span_lo, attention_mask,
                      cache_fns, capture_fn if cached else None)

    ts = jnp.arange(cfg.timesteps, dtype=jnp.float32)
    carry0 = (x, cur, kv) if cached else (x, cur)
    _, sampled_steps = jax.lax.scan(step, carry0, (ts, step_keys))
    return sampled_steps[-1]


def _make_step(forward_fn, cfg, b, n, span_lo, attention_mask, cache_fns,
               capture_fn):
    """Per-timestep MotionGIT body shared by the monolithic scan
    (`t2m_generate`) and the segmented window runner
    (`run_timestep_window`)."""
    cached = cache_fns is not None
    refresh = cfg.cache_refresh_every
    step_fn = cache_fns[1] if cached else None

    def step(carry, inp):
        if cached:
            x, cur, kv_c = carry
        else:
            x, cur = carry
            kv_c = None
        t, step_key = inp
        k_sample, k_mask = jax.random.split(step_key)

        if cached and cfg.cache_refresh_every > 0:
            t_i = t.astype(jnp.int32)
            kv_c = jax.lax.cond(
                jnp.logical_and(t_i > 0, t_i % refresh == 0),
                lambda xc, old: capture_fn(xc),
                lambda xc, old: old,
                x, kv_c,
            )

        if cache_fns is not None:
            span_tok = jax.lax.dynamic_slice(x, (0, span_lo), (b, n))
            logits = step_fn(span_tok, kv_c, span_lo).astype(jnp.float32)
        else:
            logits = forward_fn(x, attention_mask).astype(jnp.float32)  # (B, n, M)

        if cfg.greedy:
            sampled = jnp.argmax(logits, axis=-1)
        else:
            sampled = jax.random.categorical(k_sample, logits, axis=-1)
        sampled = sampled.astype(jnp.int32)

        unknown = cur == cfg.mask_id
        sampled_off = jnp.where(unknown, sampled + cfg.motion_offset, cur)

        ratio = (t + 1.0) / cfg.timesteps
        mask_ratio = cfg.noise_schedule(ratio)
        sampled_vq = jnp.where(
            unknown, sampled, jnp.clip(cur - cfg.motion_offset, 0)
        )
        selected = confidence_of(logits, sampled_vq)
        selected = jnp.where(unknown, selected, jnp.finfo(jnp.float32).max)

        mask_len = jnp.floor(n * mask_ratio).astype(jnp.int32)
        unknown_count = unknown.sum(axis=-1, keepdims=True)
        mask_len = jnp.maximum(1, jnp.minimum(unknown_count - 1, mask_len))

        temperature_adj = cfg.temperature * (1.0 - ratio)
        masking = mask_by_random_topk(
            mask_len, selected, temperature_adj,
            None if cfg.temperature == 0.0 else k_mask,
        )
        # last step commits everything (reference skips remasking then)
        is_last = t >= cfg.timesteps - 1
        masking = jnp.logical_and(masking, jnp.logical_not(is_last))

        new_cur = jnp.where(masking, cfg.mask_id, sampled_off)
        x = jax.lax.dynamic_update_slice(x, new_cur, (0, span_lo))
        if cached:
            return (x, new_cur, kv_c), sampled_vq
        return (x, new_cur), sampled_vq

    return step


def init_carry(input_ids: jax.Array, cfg: MotionGITConfig):
    """Initial (x, cur) carry of the non-cached MotionGIT loop — the
    seam the segmented runner threads between windows."""
    l = input_ids.shape[1]
    span_lo = l - (cfg.num_motion_tokens + 1)
    x = input_ids.astype(jnp.int32)
    return (x, x[:, span_lo:-1])


def run_timestep_window(forward_fn, carry, ts, step_keys, cfg,
                        attention_mask=None):
    """Scan one ≤N-timestep window of the (non-cached) MotionGIT loop
    from `carry` — exact continuation: the schedule ratio and the
    last-step commit-everything rule ride the absolute `ts` rows (the
    same associativity argument as t2i.run_timestep_window). Returns
    (carry, (W, B, n) grids)."""
    x = carry[0]
    b, l = x.shape
    n = cfg.num_motion_tokens
    span_lo = l - (n + 1)
    step = _make_step(forward_fn, cfg, b, n, span_lo, attention_mask,
                      None, None)
    return jax.lax.scan(step, carry, (ts, step_keys))


class SegmentedT2MRun:
    """Incremental MotionGIT generation: `step()` runs ONE
    ≤segment_timesteps window; `.codes` holds the final (B, n) motion VQ
    grid once done. The motion twin of t2i.SegmentedT2IRun (KV-cached
    mode deliberately unsupported — per-window recapture would change
    the cache's staleness semantics)."""

    def __init__(self, forward_fn, input_ids, cfg: MotionGITConfig,
                 key=None, attention_mask=None, segment_timesteps: int = 8,
                 run_window=None):
        if segment_timesteps < 1:
            raise ValueError(
                f"segment_timesteps must be >= 1, got {segment_timesteps}"
            )
        self.cfg = cfg
        self._carry = init_carry(input_ids, cfg)
        if key is None:
            key = jax.random.key(0)
        self._keys = jax.random.split(key, cfg.timesteps)
        self._ts = jnp.arange(cfg.timesteps, dtype=jnp.float32)
        self._windows = [
            (s, min(s + segment_timesteps, cfg.timesteps))
            for s in range(0, cfg.timesteps, segment_timesteps)
        ]
        self._i = 0
        self.done = False
        self.codes = None
        self.last_window = None
        if run_window is None:
            def run_window(carry, ts, step_keys):
                return run_timestep_window(
                    forward_fn, carry, ts, step_keys, cfg,
                    attention_mask=attention_mask,
                )
        self._run_window = run_window

    def step(self) -> bool:
        if not self.done:
            s0, s1 = self._windows[self._i]
            self._carry, sampled = self._run_window(
                self._carry, self._ts[s0:s1], self._keys[s0:s1]
            )
            self.last_window = sampled
            self._i += 1
            if self._i == len(self._windows):
                self.done = True
                self.codes = sampled[-1]
        return self.done


def t2m_generate_segmented(forward_fn, input_ids, cfg: MotionGITConfig,
                           key=None, attention_mask=None,
                           segment_timesteps: int = 8, run_window=None):
    """`t2m_generate` as multiple ≤segment_timesteps-step programs."""
    run = SegmentedT2MRun(
        forward_fn, input_ids, cfg, key=key,
        attention_mask=attention_mask,
        segment_timesteps=segment_timesteps, run_window=run_window,
    )
    while not run.step():
        pass
    return run.codes
