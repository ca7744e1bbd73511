"""MaskGIT-style non-autoregressive image generation with CFG, on device.

Algorithm parity with `MMadaModelLM.t2i_generate`
(models/modeling_mmada.py:117-211): all image positions start masked inside
the t2i frame `[pad* <|t2i|> <bos> text <eos> <|soi|> IMG <|eoi|>]`; each of
`timesteps` steps forwards the sequence (batch-doubled under CFG with an
empty-prompt uncond row sharing the current image tokens), slices logits to
the image-vocab window, samples a candidate at every position, keeps
already-committed tokens, and re-masks the lowest-confidence positions down
to the schedule's mask count.

Faithfully reproduced reference details:
  * CFG combine is the muse form `(1+s)·cond − s·uncond`
    (modeling_mmada.py:167);
  * temperature *compounds* across steps — the reference rebinds
    `temperature = temperature * (1.0 - ratio)` inside its loop
    (modeling_mmada.py:205), so step t uses T0·Π(1−r_i);
  * `mask_len` is clamped to [1, unknown_count−1] so at least one token
    commits and at least one stays masked each step (:199-203).

TPU-native differences: the step loop is `lax.scan` (zero host round-trips),
sampling uses `jax.random.categorical` (same distribution as the reference's
`torch.multinomial(softmax)`, different RNG stream — greedy mode matches
token-exactly and is the parity configuration), and the vocab head is
evaluated only over the 8k image window via the model's `logit_window`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from mmada_tpu.sampling.gumbel import confidence_of, mask_by_random_topk
from mmada_tpu.sampling.schedules import cosine_schedule

# (tokens (B, L), attention_mask (B, L) | None) -> (B, num_vq_tokens, codebook)
WindowForwardFn = Callable[[jax.Array, Optional[jax.Array]], jax.Array]


@dataclasses.dataclass(frozen=True)
class MaskGITConfig:
    timesteps: int = 18
    temperature: float = 1.0
    guidance_scale: float = 0.0
    noise_schedule: Callable = cosine_schedule
    mask_id: int = 126336
    num_vq_tokens: int = 1024
    codebook_size: int = 8192
    text_vocab_size: int = 126464   # fused-id offset of the image window
    greedy: bool = False            # argmax instead of categorical (parity/tests)
    cfg_interval: tuple = (0.0, 1.0)
    """Guidance interval (lo, hi) as step-fractions: CFG (the batch-doubled
    cond+uncond forward) runs only for steps t with lo <= t/timesteps < hi;
    the remaining steps forward the SINGLE cond batch — no uncond compute,
    no stale logits (outside the interval the combine is simply absent,
    exactly the reference's guidance_scale=0 step). (0.0, 1.0) = CFG every
    step (the reference behavior, modeling_mmada.py:155-167). Restricting
    guidance to a mid-interval is the Kynkäänniemi et al. 2024 "guidance
    interval" recipe; here it is also a measured speed lever (each skipped
    step halves the forward batch). Truth-gated like every fast arm
    (tools/cfg_interval_sweep.py)."""
    cache_refresh_every: int = 0
    """KV-cached decode only: re-capture the out-of-span K/V every N steps
    (0 = capture once for all timesteps). The prompt's TOKENS never change,
    but its K/V responses to the committed image tokens do — refreshing is
    the staleness/quality knob (each refresh costs one full-sequence
    forward; the text semi-AR sampler refreshes per block naturally)."""


def cfg_interval_steps(cfg: "MaskGITConfig"):
    """Static (lo_idx, hi_idx) step range where CFG is active: step t uses
    guidance iff lo <= t/timesteps < hi. Defaults to (0, timesteps)."""
    lo, hi = cfg.cfg_interval
    if not (0.0 <= lo <= hi <= 1.0):
        raise ValueError(f"cfg_interval must satisfy 0 <= lo <= hi <= 1, got {cfg.cfg_interval}")
    t = cfg.timesteps
    lo_idx = math.ceil(lo * t - 1e-9)
    hi_idx = math.ceil(hi * t - 1e-9)
    return lo_idx, hi_idx


def _scan(forward_fn, input_ids, cfg, key, uncond_input_ids,
          attention_mask, uncond_attention_mask, cache_fns=None):
    """Run the MaskGIT loop; returns `(timesteps, B, n)` sampled VQ grids.

    `cache_fns=(capture_fn, step_fn)` (llada.forward_kv_capture /
    forward_kv_step via MMadaModel._t2i_cache_fns) switches to the
    KV-cached decode: the non-image positions' K/V — the text prompt,
    <|soi|>, <|eoi|> — are captured ONCE (their *tokens* never change
    across MaskGIT steps; only their attention responses to the evolving
    image tokens do, which is the frozen approximation) and every step
    forwards only the `n` image positions."""
    b, l = input_ids.shape
    n = cfg.num_vq_tokens
    img_lo = l - (n + 1)          # image span is [-(n+1), -1) inside the frame
    prompt_len = l - (n + 2)      # text portion before <|soi|>

    x, cur, _ = init_carry(input_ids, cfg)
    use_cfg, uncond_prefix, full_mask = _cfg_preamble(
        cfg, prompt_len, uncond_input_ids, attention_mask,
        uncond_attention_mask,
    )

    if cache_fns is not None:
        capture_fn, step_fn = cache_fns

        def capture(xc):
            if use_cfg:
                un = jnp.concatenate([uncond_prefix, xc[:, prompt_len:]], axis=1)
                return capture_fn(jnp.concatenate([xc, un], axis=0))
            return capture_fn(xc)

        kv = capture(x)
        refresh = cfg.cache_refresh_every

    if key is None:
        key = jax.random.key(0)
    step_keys = jax.random.split(key, cfg.timesteps)

    # kv always rides the carry in cached mode (a loop-invariant carry
    # costs nothing when refresh is off, and one carry shape removes the
    # refresh-vs-not branching everywhere below)
    cached = cache_fns is not None

    ts = jnp.arange(cfg.timesteps, dtype=jnp.float32)
    lo_idx, hi_idx = cfg_interval_steps(cfg)
    interval_active = use_cfg and (lo_idx > 0 or hi_idx < cfg.timesteps)

    if interval_active:
        if cached:
            raise ValueError(
                "cfg_interval + block_kv_cache is unsupported: the cached "
                "K/V is captured at CFG batch (2B rows) and the cond-only "
                "phases would need a different cache shape; run the exact "
                "sampler (the headline arm) with cfg_interval instead"
            )
        # Three contiguous phases — cond-only / CFG / cond-only — each its
        # own lax.scan over the SAME (ts, step_keys) rows the monolithic
        # scan would consume, so step semantics (temperature compounding,
        # schedule, per-step RNG) are unchanged; only the guidance combine
        # (and its batch-doubled forward) is restricted to [lo, hi).
        step_on = _make_step(
            forward_fn, cfg, b, n, img_lo, prompt_len, True,
            uncond_prefix, full_mask, None, None,
        )
        step_off = _make_step(
            forward_fn, cfg, b, n, img_lo, prompt_len, False,
            None, attention_mask, None, None,
        )
        carry = (x, cur, jnp.float32(cfg.temperature))
        outs = []
        for s0, s1, fn in ((0, lo_idx, step_off),
                           (lo_idx, hi_idx, step_on),
                           (hi_idx, cfg.timesteps, step_off)):
            if s1 > s0:
                carry, sampled = jax.lax.scan(
                    fn, carry, (ts[s0:s1], step_keys[s0:s1]))
                outs.append(sampled)
        return jnp.concatenate(outs, axis=0)

    step = _make_step(
        forward_fn, cfg, b, n, img_lo, prompt_len, use_cfg,
        uncond_prefix, full_mask,
        cache_fns, capture if cached else None,
    )

    carry0 = (x, cur, jnp.float32(cfg.temperature))
    if cached:
        carry0 = carry0 + (kv,)
    _, sampled_steps = jax.lax.scan(step, carry0, (ts, step_keys))
    return sampled_steps


def _make_step(forward_fn, cfg, b, n, img_lo, prompt_len, use_cfg,
               uncond_prefix, full_mask, cache_fns, capture):
    """Build the per-timestep MaskGIT body shared by the monolithic scan
    (`_scan`) and the segmented window runner (`run_timestep_window`)."""
    cached = cache_fns is not None
    refresh = cfg.cache_refresh_every
    step_fn = cache_fns[1] if cached else None

    def step(carry, inp):
        if cached:
            x, cur, temperature, kv_c = carry
        else:
            x, cur, temperature = carry
            kv_c = None
        t, step_key = inp
        k_sample, k_mask = jax.random.split(step_key)

        if cached and cfg.cache_refresh_every > 0:
            t_i = t.astype(jnp.int32)
            kv_c = jax.lax.cond(
                jnp.logical_and(t_i > 0, t_i % refresh == 0),
                lambda xc, old: capture(xc),
                lambda xc, old: old,
                x, kv_c,
            )

        if cache_fns is not None:
            # cond and uncond rows share the image span's tokens, so the
            # cached step just doubles the span under CFG
            img_tok = jax.lax.dynamic_slice(x, (0, img_lo), (b, n))
            span_in = (jnp.concatenate([img_tok, img_tok], axis=0)
                       if use_cfg else img_tok)
            logits = step_fn(span_in, kv_c, img_lo)
        elif use_cfg:
            uncond_x = jnp.concatenate([uncond_prefix, x[:, prompt_len:]], axis=1)
            model_in = jnp.concatenate([x, uncond_x], axis=0)
            logits = forward_fn(model_in, full_mask)
        else:
            logits = forward_fn(x, full_mask)
        if use_cfg:
            cond, uncond = jnp.split(logits, 2, axis=0)
            logits = (1.0 + cfg.guidance_scale) * cond - cfg.guidance_scale * uncond
        logits = logits.astype(jnp.float32)        # (B, n, codebook)

        if cfg.greedy:
            sampled = jnp.argmax(logits, axis=-1)
        else:
            sampled = jax.random.categorical(k_sample, logits, axis=-1)
        sampled = sampled.astype(jnp.int32)

        unknown = cur == cfg.mask_id
        sampled = jnp.where(unknown, sampled, cur)

        ratio = (t + 1.0) / cfg.timesteps
        mask_ratio = cfg.noise_schedule(ratio)

        # exp(l_sel − lse) == softmax+gather without materializing the
        # (B, N, codebook) probability tensor (VMEM-safe, see gumbel.py)
        selected = confidence_of(logits, sampled)
        selected = jnp.where(unknown, selected, jnp.finfo(jnp.float32).max)

        mask_len = jnp.floor(n * mask_ratio).astype(jnp.int32)
        unknown_count = unknown.sum(axis=-1, keepdims=True)
        mask_len = jnp.maximum(1, jnp.minimum(unknown_count - 1, mask_len))

        temperature = temperature * (1.0 - ratio)
        masking = mask_by_random_topk(
            mask_len, selected, temperature,
            None if cfg.temperature == 0.0 else k_mask,
        )

        new_cur = jnp.where(masking, cfg.mask_id, sampled)
        new_img = jnp.where(masking, cfg.mask_id, sampled + cfg.text_vocab_size)
        x = jax.lax.dynamic_update_slice(x, new_img, (0, img_lo))
        if cached:
            return (x, new_cur, temperature, kv_c), sampled
        return (x, new_cur, temperature), sampled

    return step


def _cfg_preamble(cfg, prompt_len, uncond_input_ids, attention_mask,
                  uncond_attention_mask):
    """(use_cfg, uncond_prefix, full_mask) shared by the monolithic scan
    and the windowed runner — one copy so the segmented-equals-monolithic
    invariant cannot drift."""
    use_cfg = uncond_input_ids is not None and cfg.guidance_scale > 0
    if use_cfg:
        uncond_prefix = uncond_input_ids[:, :prompt_len].astype(jnp.int32)
        if attention_mask is not None and uncond_attention_mask is not None:
            full_mask = jnp.concatenate(
                [attention_mask, uncond_attention_mask], 0
            )
        else:
            full_mask = None
    else:
        uncond_prefix = None
        full_mask = attention_mask
    return use_cfg, uncond_prefix, full_mask


def init_carry(input_ids: jax.Array, cfg: MaskGITConfig):
    """Initial (x, cur, temperature) carry of the non-cached MaskGIT loop
    — the seam the segmented runner threads between windows."""
    l = input_ids.shape[1]
    n = cfg.num_vq_tokens
    img_lo = l - (n + 1)
    x = input_ids.astype(jnp.int32)
    cur = x[:, img_lo:-1]
    cur = jnp.where(cur == cfg.mask_id, cfg.mask_id,
                    cur - cfg.text_vocab_size)
    return (x, cur, jnp.float32(cfg.temperature))


def run_timestep_window(forward_fn, carry, ts, step_keys, cfg,
                        uncond_input_ids=None, attention_mask=None,
                        uncond_attention_mask=None):
    """Scan one ≤N-timestep window of the (non-cached) MaskGIT loop from
    `carry` — an exact continuation: temperature compounding, the noise
    schedule, and per-step keys all ride `ts`/`step_keys` rows, so
    windowed execution is associative in the carry (the same argument as
    sampling/text.generate_segmented). Returns (carry, (W, B, n) grids).

    `cfg.cfg_interval` must be trivial here: a window has no global step
    position, so interval splitting is the caller's job —
    `SegmentedT2IRun` cuts its window list at the interval boundaries and
    hands each window a per-window cfg (guidance on or off for the WHOLE
    window)."""
    if cfg_interval_steps(cfg) != (0, cfg.timesteps):
        raise ValueError(
            "run_timestep_window cannot apply a non-trivial cfg_interval "
            "(windows have no global step position); use SegmentedT2IRun "
            "or t2i_generate, which split windows at the boundaries"
        )
    x = carry[0]
    b, l = x.shape
    n = cfg.num_vq_tokens
    img_lo = l - (n + 1)
    prompt_len = l - (n + 2)
    use_cfg, uncond_prefix, full_mask = _cfg_preamble(
        cfg, prompt_len, uncond_input_ids, attention_mask,
        uncond_attention_mask,
    )
    step = _make_step(forward_fn, cfg, b, n, img_lo, prompt_len, use_cfg,
                      uncond_prefix, full_mask, None, None)
    return jax.lax.scan(step, carry, (ts, step_keys))


class SegmentedT2IRun:
    """Incremental MaskGIT generation: `step()` executes ONE
    ≤`segment_timesteps`-step device program; after the final window
    `.codes` holds the (B, n) VQ grid. `.last_window` holds the most
    recent (W, B, n) per-step grids — real incremental stepwise
    streaming (the monolithic `t2i_generate_stepwise` computes the whole
    trajectory before the first frame can be shown).

    Same role as text.SegmentedRun: bounds single-program wall time and
    gives the serving engine a chunk seam so a multi-second t2i program
    stops blocking text requests. KV-cached mode is deliberately
    unsupported (per-window K/V recapture would change the cache's
    staleness semantics).

    `run_window(carry, ts, step_keys, window_cfg)` may be injected
    (models/mmada wraps a jitted model-as-argument runner); defaults to
    `run_timestep_window` with `forward_fn`. `window_cfg` is the
    MaskGITConfig the window must run under — identical to `cfg` except
    when `cfg.cfg_interval` is non-trivial, in which case the window list
    is cut at the interval boundaries and each window's cfg carries
    guidance on (inside [lo, hi)) or `guidance_scale=0` (outside), with
    the interval itself stripped (windows have no global step position).
    """

    def __init__(self, forward_fn, input_ids, cfg: MaskGITConfig,
                 key=None, uncond_input_ids=None, attention_mask=None,
                 uncond_attention_mask=None, segment_timesteps: int = 8,
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

        lo_idx, hi_idx = cfg_interval_steps(cfg)
        use_cfg = uncond_input_ids is not None and cfg.guidance_scale > 0
        interval_active = use_cfg and (lo_idx > 0 or hi_idx < cfg.timesteps)
        boundaries = {lo_idx, hi_idx} if interval_active else set()
        # strip the interval even when it is moot (no uncond rows -> the
        # windows never apply guidance anyway): run_timestep_window
        # rejects any non-trivial interval it is handed
        flat_cfg = (dataclasses.replace(cfg, cfg_interval=(0.0, 1.0))
                    if cfg_interval_steps(cfg) != (0, cfg.timesteps)
                    else cfg)
        off_cfg = dataclasses.replace(flat_cfg, guidance_scale=0.0)
        self._windows = []
        for s in range(0, cfg.timesteps, segment_timesteps):
            e = min(s + segment_timesteps, cfg.timesteps)
            cuts = sorted({s, e} | {b for b in boundaries if s < b < e})
            for a, b_ in zip(cuts[:-1], cuts[1:]):
                wcfg = (flat_cfg if (not interval_active
                                     or lo_idx <= a < hi_idx)
                        else off_cfg)
                self._windows.append((a, b_, wcfg))
        self._i = 0
        self.done = False
        self.codes = None
        self.last_window = None
        if run_window is None:
            def run_window(carry, ts, step_keys, window_cfg):
                return run_timestep_window(
                    forward_fn, carry, ts, step_keys, window_cfg,
                    uncond_input_ids=uncond_input_ids,
                    attention_mask=attention_mask,
                    uncond_attention_mask=uncond_attention_mask,
                )
        self._run_window = run_window

    @property
    def total_chunks(self) -> int:
        return len(self._windows)

    def step(self) -> bool:
        """Run ONE window; True once the final window has executed."""
        if not self.done:
            s0, s1, wcfg = self._windows[self._i]
            self._carry, sampled = self._run_window(
                self._carry, self._ts[s0:s1], self._keys[s0:s1], wcfg
            )
            self.last_window = sampled
            self._i += 1
            if self._i == len(self._windows):
                self.done = True
                self.codes = sampled[-1]
        return self.done


def t2i_generate_segmented(
    forward_fn, input_ids, cfg: MaskGITConfig, key=None,
    uncond_input_ids=None, attention_mask=None,
    uncond_attention_mask=None, segment_timesteps: int = 8,
    run_window=None,
) -> jax.Array:
    """`t2i_generate` as multiple ≤segment_timesteps-step device programs
    (token-identical where numerics are program-independent; see the text
    sampler's round-3g notes for the TPU near-tie caveat)."""
    run = SegmentedT2IRun(
        forward_fn, input_ids, cfg, key=key,
        uncond_input_ids=uncond_input_ids, attention_mask=attention_mask,
        uncond_attention_mask=uncond_attention_mask,
        segment_timesteps=segment_timesteps, run_window=run_window,
    )
    while not run.step():
        pass
    return run.codes


def t2i_generate(
    forward_fn: WindowForwardFn,
    input_ids: jax.Array,                      # (B, L) full t2i frame
    cfg: MaskGITConfig,
    key: Optional[jax.Array] = None,
    uncond_input_ids: Optional[jax.Array] = None,   # (B, L) empty-prompt frame
    attention_mask: Optional[jax.Array] = None,     # (B, L)
    uncond_attention_mask: Optional[jax.Array] = None,
    cache_fns=None,
) -> jax.Array:
    """Returns raw VQ codes `(B, num_vq_tokens)` in [0, codebook_size)."""
    return _scan(
        forward_fn, input_ids, cfg, key, uncond_input_ids,
        attention_mask, uncond_attention_mask, cache_fns=cache_fns,
    )[-1]


def t2i_generate_stepwise(
    forward_fn: WindowForwardFn,
    input_ids: jax.Array,
    cfg: MaskGITConfig,
    key: Optional[jax.Array] = None,
    uncond_input_ids: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    uncond_attention_mask: Optional[jax.Array] = None,
    cache_fns=None,
) -> jax.Array:
    """`(timesteps, B, n)` trajectory of committed VQ grids, for stepwise
    demo decoding (`t2i_generate_decoding_stepwise`, modeling_mmada.py:558-663)."""
    return _scan(
        forward_fn, input_ids, cfg, key, uncond_input_ids,
        attention_mask, uncond_attention_mask, cache_fns=cache_fns,
    )
