"""MMaDA: unified multimodal masked-diffusion model API.

One canonical model object replacing the reference's two diverging files
(models/modeling_mmada.py and models/modelling_ours.py — SURVEY.md §2.1
notes they must be unified): the LLaDA backbone plus the fused vocab layout
plus every task entry point:

  * `forward`                — raw logits over the fused vocab
  * `generate`               — semi-AR text denoising (generate.py:43-113)
  * `mmu_generate[_fast]`    — image-conditioned text (modeling_mmada.py:388-556)
  * `t2i_generate[_stepwise]`— MaskGIT image generation (modeling_mmada.py:117-211)
  * `t2m_generate`           — MaskGIT motion generation (modelling_ours.py:557-682)
  * `forward_process`        — multi-task training losses (training/losses.py)

Image/motion generation evaluates the vocab head only over its 8k/512-wide
window (`logit_window`), skipping >90% of the 134k-row head matmul on the
denoise path.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp

from mmada_tpu.core.precision import FP32, Policy
from mmada_tpu.core.vocab import VocabLayout
from mmada_tpu.models import llada
from mmada_tpu.sampling import motion as motion_sampling
from mmada_tpu.sampling import t2i as t2i_sampling
from mmada_tpu.sampling import text as text_sampling
from mmada_tpu.sampling.schedules import cosine_schedule


def _cache_dtype(block_kv_cache):
    """Sampler flag -> cache dtype: False/True = compute dtype, 'int8' =
    quantized cache (llada._quantize_kv; 2x less cache HBM)."""
    return "int8" if block_kv_cache == "int8" else None


@functools.partial(jax.jit, static_argnames=("block_cfg", "kv_cached"))
def _early_stop_block(model, x, prompt_index, block_end, step_keys,
                      transfers, block_cfg, kv_cached=False):
    """One early-stop denoise block, jitted once per (shape, settings):
    `model` is a pytree argument (weights stay runtime args, never HLO
    constants) and `block_end` is traced, so all blocks of all
    `mmu_generate_fast` calls share a single executable."""
    if kv_cached:
        return text_sampling.run_block_eager(
            block_cfg, x, prompt_index, block_end, step_keys, transfers,
            cache_fns=model._text_cache_fns(_cache_dtype(kv_cached)),
        )
    return text_sampling.run_block_eager(
        block_cfg, x, prompt_index, block_end, step_keys, transfers,
        window_forward_fn=model._text_window_forward_fn(
            block_cfg.block_length
        ),
    )


@functools.partial(jax.jit, static_argnames=("block_cfg",))
def _segment_block(model, x, prompt_index, block_end, step_keys,
                   transfers, block_cfg, step_offset=0):
    """One ≤segment_steps chunk of a block's denoise scan for the
    segmented exact sampler (text_sampling.generate_segmented): model as
    pytree argument, traced block_end + step_offset (the chunk's first
    in-block step — keeps step-indexed semantics like parallel warmup
    identical to the monolithic scan) — all equal-length chunks of all
    blocks share one executable (distinct chunk lengths shape-key their
    own)."""
    return text_sampling.run_block_eager(
        block_cfg, x, prompt_index, block_end, step_keys, transfers,
        window_forward_fn=model._text_window_forward_fn(
            block_cfg.block_length
        ),
        step_offset=step_offset,
    )


@functools.partial(jax.jit, static_argnames=("block_cfg",))
def _segment_block_stepwise(model, x, prompt_index, block_end, step_keys,
                            transfers, block_cfg, step_offset=0):
    """`_segment_block` that ALSO returns the chunk's (W, B, L) per-step
    token states — the streamed stepwise demo's runner."""
    return text_sampling.run_block_eager(
        block_cfg, x, prompt_index, block_end, step_keys, transfers,
        window_forward_fn=model._text_window_forward_fn(
            block_cfg.block_length
        ),
        collect_states=True,
        step_offset=step_offset,
    )


@functools.partial(jax.jit, static_argnames=("block_cfg",))
def _segment_block_per_row(model, x, prompt_index, block_ends, step_keys,
                           transfers, block_cfg, step_offsets=None):
    """Per-row variant of `_segment_block`: `step_keys` is (B, chunk)
    typed keys, `block_ends` is (B,) — each row runs as a batch-1 block
    under vmap with ITS OWN key schedule and active-block position. The
    per-row construction matches the engine's batched stochastic
    whole-generation path (serve/engine._jit_text_per_row_keys), so a
    row's tokens are bit-identical to its solo run regardless of batch
    composition; per-row `block_ends` is what lets the serving streams
    batch requests at DIFFERENT block offsets into one program
    (serve/engine._Stream — continuous batching). `step_offsets` is the
    per-row (B,) first in-block step index of this chunk (rows joining a
    stream mid-flight sit at different in-block progress) — it keeps
    step-indexed semantics (parallel warmup) row-exact vs solo runs."""
    if step_offsets is None:
        step_offsets = jnp.zeros((x.shape[0],), jnp.int32)
    wf = model._text_window_forward_fn(block_cfg.block_length)

    def row(xr, pir, ber, kr, trr, sor):
        return text_sampling.run_block_eager(
            block_cfg, xr[None], pir[None], ber, kr, trr[None],
            window_forward_fn=wf, step_offset=sor,
        )[0]

    return jax.vmap(row)(x, prompt_index, block_ends, step_keys, transfers,
                         step_offsets)


@functools.partial(jax.jit, static_argnames=("mcfg",))
def _t2i_window(model, carry, ts, step_keys, uncond_input_ids,
                attention_mask, uncond_attention_mask, mcfg):
    """One ≤segment_timesteps window of the MaskGIT t2i loop: model as
    pytree argument, (ts, step_keys) rows traced — all equal-length
    windows of all calls share one executable
    (sampling/t2i.run_timestep_window)."""
    fwd = model._window_forward_fn(mcfg.num_vq_tokens,
                                   model.vocab.image_window)
    return t2i_sampling.run_timestep_window(
        fwd, carry, ts, step_keys, mcfg,
        uncond_input_ids=uncond_input_ids, attention_mask=attention_mask,
        uncond_attention_mask=uncond_attention_mask,
    )


@functools.partial(jax.jit, static_argnames=("mcfg",))
def _t2m_window(model, carry, ts, step_keys, attention_mask, mcfg):
    """One ≤segment_timesteps window of the MotionGIT t2m loop (model as
    pytree argument; sampling/motion.run_timestep_window)."""
    window = (
        model.vocab.motion_offset,
        model.vocab.motion_offset + model.vocab.motion_codebook_size,
    )
    fwd = model._window_forward_fn(mcfg.num_motion_tokens, window)
    return motion_sampling.run_timestep_window(
        fwd, carry, ts, step_keys, mcfg, attention_mask=attention_mask,
    )


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["params"],
    meta_fields=["cfg", "vocab", "policy", "attn_impl", "remat", "mesh",
                 "pipeline_axis"],
)
@dataclasses.dataclass
class MMadaModel:
    """Registered pytree: `params` are leaves, everything else is static
    metadata — so a model passes straight through jit boundaries with its
    weights as runtime arguments. NEVER close over a model inside jit: with
    closure capture the 8-16 GB of weights become lowering constants, which
    this environment's remote compiler ships with the module (observed:
    >10 min compiles vs ~10 s with explicit arguments)."""

    cfg: llada.LLaDAConfig
    params: Any
    vocab: VocabLayout
    policy: Policy = FP32
    attn_impl: str = "auto"
    remat: Any = False
    """Activation checkpointing on the layer scan: False | True/"full" |
    "dots" (save matmul outputs, recompute only elementwise + flash-attn
    forward — llada._wrap_remat). Route config strings through
    core.config.parse_remat (`bool("dots")` is True — the parse_kv_cache
    bug class)."""
    mesh: Any = None
    """Optional jax.sharding.Mesh. When set, attention runs the
    mesh-aware shard_map path (heads over 'tensor', batch over
    data×fsdp) so the Pallas kernel survives multi-device execution
    instead of degrading to XLA attention (llada._dispatch_attention)."""
    pipeline_axis: Any = None
    """Mesh axis name for GPipe pipeline-parallel serving
    (parallel/pipeline.py). Requires `mesh`, params sharded with
    `pipeline.shard_stage_params` (layer axis = stages), and the
    checkpoint-faithful no-bias attention (attention_bias_enabled=False).
    All samplers then run their forwards through the pipeline."""

    # ------------------------------------------------------------- factory
    @classmethod
    def init(cls, key, cfg: llada.LLaDAConfig, vocab: VocabLayout, **kw):
        params = llada.init_params(key, cfg, dtype=kw.pop("dtype", jnp.float32))
        return cls(cfg=cfg, params=params, vocab=vocab, **kw)

    @classmethod
    def from_pretrained(cls, model_dir: str, vocab: VocabLayout,
                        dtype=jnp.bfloat16, **kw):
        from mmada_tpu.checkpoints.hf_import import config_from_hf_json, load_pretrained

        cfg = config_from_hf_json(model_dir)
        params = load_pretrained(model_dir, cfg, dtype=dtype)
        return cls(cfg=cfg, params=params, vocab=vocab, **kw)

    # ------------------------------------------------------------- forward
    def forward(self, input_ids, attention_mask=None, attention_bias=None,
                logit_window=None, logit_positions=None):
        if self.pipeline_axis is not None:
            from mmada_tpu.parallel import pipeline

            if self.cfg.attention_bias_enabled and (
                attention_mask is not None or attention_bias is not None
            ):
                raise ValueError(
                    "pipeline serving supports only the no-bias attention "
                    "path (attention_bias_enabled=False)"
                )
            return pipeline.pipeline_forward(
                self.params, self.cfg, input_ids, self.mesh,
                axis_name=self.pipeline_axis, policy=self.policy,
                logit_window=logit_window, logit_positions=logit_positions,
            )
        return llada.forward(
            self.params, self.cfg, input_ids,
            attention_mask=attention_mask, attention_bias=attention_bias,
            policy=self.policy, logit_window=logit_window,
            logit_positions=logit_positions,
            remat=self.remat, attn_impl=self.attn_impl, mesh=self.mesh,
        )

    def forward_hidden(self, input_ids, attention_mask=None):
        """Post-final-norm hidden states `(B, L, D)` — the vocab head is
        NOT applied. Training-loss path (chunked CE) only; pipeline
        serving keeps the fused head."""
        if self.pipeline_axis is not None:
            raise ValueError("forward_hidden is a training path; pipeline "
                             "sharding is inference-only")
        return llada.forward(
            self.params, self.cfg, input_ids,
            attention_mask=attention_mask, policy=self.policy,
            remat=self.remat, attn_impl=self.attn_impl, mesh=self.mesh,
            return_normed_hidden=True,
        )

    def apply_head(self, normed_hidden, logit_window=None):
        """Vocab-head matmul on (a chunk of) normed hidden states."""
        return llada._head(
            self.params, self.cfg, normed_hidden, logit_window, self.policy
        )

    def _text_forward_fn(self):
        def fn(tokens):
            return self.forward(tokens)
        return fn

    def _text_window_forward_fn(self, block_length: int):
        """Semi-AR block-windowed forward: the vocab head (full 134k width
        — text steps may emit any fused-vocab id, reference semantics) runs
        only over the active block's positions. The pipeline path's head
        has no dynamic-position support; it slices full logits instead."""
        if self.pipeline_axis is not None:
            return text_sampling.as_window_forward_fn(
                self._text_forward_fn(), block_length
            )

        def fn(tokens, start):
            return self.forward(tokens, logit_positions=(start, block_length))
        return fn

    def _validate_kv_cache_support(self):
        if self.pipeline_axis is not None:
            raise ValueError(
                "block_kv_cache is not supported under pipeline serving"
            )
        if self.cfg.attention_bias_enabled:
            raise ValueError(
                "block_kv_cache supports only the no-bias "
                "(checkpoint-faithful) attention path"
            )

    def _text_cache_fns(self, cache_dtype=None):
        """Block-KV-cached decode fns (Fast-dLLM-style DualCache, see
        llada.forward_kv_capture/forward_kv_step): capture full-sequence
        per-layer K/V once per block, then forward only the block's tokens
        per denoise step. APPROXIMATE (out-of-block K/V frozen within a
        block; exact at steps_per_block=1) — opt-in via the samplers'
        `block_kv_cache=True`."""
        self._validate_kv_cache_support()

        def capture(tokens):
            return llada.forward_kv_capture(
                self.params, self.cfg, tokens, policy=self.policy,
                attn_impl=self.attn_impl, mesh=self.mesh,
                cache_dtype=cache_dtype,
            )

        def step(block_tokens, kv, block_start):
            return llada.forward_kv_step(
                self.params, self.cfg, block_tokens, kv, block_start,
                policy=self.policy, attn_impl=self.attn_impl,
            )

        return capture, step

    def _span_cache_fns(self, window: tuple[int, int], num_tokens: int,
                        cache_dtype=None):
        """Cache fns whose step evaluates the head over the given vocab
        window only (image / motion logits) — for the MaskGIT samplers,
        where the cached span is the image/motion token run and the frozen
        out-of-span K/V belong to the static text prompt. The span is
        static (`L - num_tokens - 1`), so the capture drops it from the
        cache entirely (compact form — 3x less cache HBM at the t2i bench
        shape) and the step concatenates its fresh K/V instead."""
        self._validate_kv_cache_support()

        def capture(tokens):
            lo = tokens.shape[1] - (num_tokens + 1)
            return llada.forward_kv_capture(
                self.params, self.cfg, tokens, policy=self.policy,
                attn_impl=self.attn_impl, mesh=self.mesh,
                drop_span=(lo, lo + num_tokens),
                cache_dtype=cache_dtype,
            )

        def step(span_tokens, kv, span_start):
            return llada.forward_kv_step(
                self.params, self.cfg, span_tokens, kv, span_start,
                policy=self.policy, logit_window=window,
                cache_is_compact=True, attn_impl=self.attn_impl,
            )

        return capture, step

    def _window_forward_fn(self, num_tokens: int, window: tuple[int, int]):
        def fn(tokens, attention_mask):
            # vocab AND position windows: the head matmul runs only over the
            # image/motion span's hidden states and the task's vocab slice
            seq_len = tokens.shape[1]
            return self.forward(
                tokens, attention_mask=attention_mask, logit_window=window,
                logit_positions=(seq_len - (num_tokens + 1), num_tokens),
            )
        return fn

    # ---------------------------------------------------------------- text
    def generate(self, prompt, gen_length=128, steps=128, block_length=128,
                 temperature=0.0, cfg_scale=0.0, remasking="low_confidence",
                 key=None, block_kv_cache=False, parallel_threshold=0.0,
                 parallel_warmup_steps=0, cache_refresh_every=0,
                 segment_steps=0):
        """`block_kv_cache=True` switches to the approximate block-cached
        decode (per-step forwards touch only the active block — the big
        long-prompt latency lever; see `_text_cache_fns`).
        `cache_refresh_every=N` (cached mode, 0 = off) re-captures the
        full-sequence K/V every N steps within a block — the
        staleness/quality knob (refresh=1 is token-exact vs the uncached
        sampler; SemiARConfig.cache_refresh_every).
        `parallel_threshold` (0 = off) additionally commits every
        candidate above that confidence per step and exits each block as
        soon as it completes (SemiARConfig.parallel_threshold).
        `segment_steps` (0 = off) runs the EXACT sampler as multiple
        ≤segment_steps-step device programs (token-identical; host loop —
        do not wrap in jit). Required at heavy operating points on the
        tunneled chip, whose worker kills single executions over ~60 s
        (text_sampling.generate_segmented)."""
        scfg = text_sampling.SemiARConfig(
            gen_length=gen_length, steps=steps, block_length=block_length,
            temperature=temperature, cfg_scale=cfg_scale, remasking=remasking,
            mask_id=self.vocab.mask_token_id,
            parallel_threshold=parallel_threshold,
            parallel_warmup_steps=parallel_warmup_steps,
            cache_refresh_every=cache_refresh_every,
        )
        if segment_steps:
            run = self._segmented_run(
                prompt, scfg, key=key, segment_steps=segment_steps,
                block_kv_cache=block_kv_cache,
            )
            while not run.step():
                pass
            return run.x
        if block_kv_cache:
            return text_sampling.generate(
                None, prompt, scfg, key=key,
                cache_fns=self._text_cache_fns(_cache_dtype(block_kv_cache)),
            )
        return text_sampling.generate(
            None, prompt, scfg, key=key,
            window_forward_fn=self._text_window_forward_fn(block_length),
        )

    def generate_stepwise(self, prompt, gen_length=128, steps=128,
                          block_length=128, temperature=0.0, cfg_scale=0.0,
                          remasking="low_confidence", key=None,
                          block_kv_cache=False):
        """Full denoising trajectory (steps, B, P+gen_length) for per-step
        streaming visualization (reference app.py:116-165)."""
        scfg = text_sampling.SemiARConfig(
            gen_length=gen_length, steps=steps, block_length=block_length,
            temperature=temperature, cfg_scale=cfg_scale, remasking=remasking,
            mask_id=self.vocab.mask_token_id,
        )
        if block_kv_cache:
            return text_sampling.generate_stepwise(
                None, prompt, scfg, key=key,
                cache_fns=self._text_cache_fns(_cache_dtype(block_kv_cache)),
            )
        return text_sampling.generate_stepwise(
            None, prompt, scfg, key=key,
            window_forward_fn=self._text_window_forward_fn(block_length),
        )

    def _segmented_run(self, prompt, scfg, key=None, row_keys=None,
                       segment_steps=64, block_kv_cache=False):
        """Build a `text_sampling.SegmentedRun` whose chunks are jitted
        model-as-argument programs (`_segment_block[_per_row]`): all
        equal-length chunks of all blocks of all calls share one
        executable. `row_keys` selects the per-row-key vmapped runner —
        the engine's batched stochastic contract."""
        if block_kv_cache:
            raise ValueError(
                "segment_steps supports the exact sampler only "
                "(per-chunk K/V recapture would change the block-cache "
                "staleness semantics)"
            )
        block_cfg = dataclasses.replace(
            scfg, gen_length=scfg.block_length, steps=scfg.steps_per_block,
            block_length=scfg.block_length,
        )
        if row_keys is not None:
            def run_block(cfg_, x_, pi_, be_, sk_, tr_, so_):
                block_ends = jnp.full((x_.shape[0],), be_, jnp.int32)
                offs = jnp.full((x_.shape[0],), so_, jnp.int32)
                return _segment_block_per_row(self, x_, pi_, block_ends,
                                              sk_, tr_, block_cfg, offs)
        else:
            def run_block(cfg_, x_, pi_, be_, sk_, tr_, so_):
                return _segment_block(self, x_, pi_, be_, sk_, tr_,
                                      block_cfg, so_)

        return text_sampling.SegmentedRun(
            prompt, scfg, key=key, row_keys=row_keys,
            segment_steps=segment_steps, run_block=run_block,
        )

    def segmented_chunk_runner(self, steps_per_block, block_length,
                               temperature=0.0, cfg_scale=0.0,
                               remasking="low_confidence",
                               parallel_threshold=0.0,
                               parallel_warmup_steps=0):
        """Return `run(x, prompt_index, block_ends, step_keys, transfers)`
        — ONE jitted per-row chunk program (`_segment_block_per_row`) for
        the serving engine's continuous-batching streams: every row
        advances its own active block (`block_ends` is per-row), so
        requests at different progress share the executable. Rows with
        all-zero `transfers` whose block holds no masks are exact no-ops
        (select_top_k_dynamic at k=0 commits nothing; confidence is
        NEG_INF without masks so parallel_threshold can't fire) — that is
        what makes free/padded slots safe."""
        block_cfg = text_sampling.SemiARConfig(
            gen_length=block_length, steps=steps_per_block,
            block_length=block_length, temperature=temperature,
            cfg_scale=cfg_scale, remasking=remasking,
            mask_id=self.vocab.mask_token_id,
            parallel_threshold=parallel_threshold,
            parallel_warmup_steps=parallel_warmup_steps,
        )

        def run(x, prompt_index, block_ends, step_keys, transfers,
                step_offsets=None):
            # step_offsets (B,): each row's first in-block step of this
            # chunk — rows join streams mid-flight at different progress,
            # and parallel warmup must bind to the BLOCK step index
            return _segment_block_per_row(
                self, x, prompt_index, block_ends, step_keys, transfers,
                block_cfg, step_offsets,
            )

        return run

    def segmented_stepwise_run(self, prompt, gen_length=128, steps=128,
                               block_length=128, temperature=0.0,
                               cfg_scale=0.0, remasking="low_confidence",
                               key=None, segment_steps=8):
        """Incremental stepwise generation: after each `.step()`,
        `.last_states` holds the chunk's (W, B, L) per-step token states
        — the streamed text demo emits them while later chunks compute
        (concatenated states == `generate_stepwise`'s trajectory)."""
        scfg = text_sampling.SemiARConfig(
            gen_length=gen_length, steps=steps, block_length=block_length,
            temperature=temperature, cfg_scale=cfg_scale,
            remasking=remasking, mask_id=self.vocab.mask_token_id,
        )
        block_cfg = dataclasses.replace(
            scfg, gen_length=scfg.block_length, steps=scfg.steps_per_block,
            block_length=scfg.block_length,
        )

        def run_block(cfg_, x_, pi_, be_, sk_, tr_, so_):
            return _segment_block_stepwise(self, x_, pi_, be_, sk_, tr_,
                                           block_cfg, so_)

        return text_sampling.SegmentedRun(
            prompt, scfg, key=key, segment_steps=segment_steps,
            run_block=run_block, collect_states=True,
        )

    def segmented_run(self, prompt, gen_length=128, steps=128,
                      block_length=128, temperature=0.0, cfg_scale=0.0,
                      remasking="low_confidence", key=None, row_keys=None,
                      segment_steps=64, parallel_threshold=0.0):
        """Incremental exact generation for chunk-granularity scheduling:
        returns a `SegmentedRun` — call `.step()` (one bounded device
        program each) until True, then read `.x`. The serving engine
        interleaves steps of concurrent runs (serve/engine.py)."""
        scfg = text_sampling.SemiARConfig(
            gen_length=gen_length, steps=steps, block_length=block_length,
            temperature=temperature, cfg_scale=cfg_scale,
            remasking=remasking, mask_id=self.vocab.mask_token_id,
            parallel_threshold=parallel_threshold,
        )
        return self._segmented_run(
            prompt, scfg, key=key, row_keys=row_keys,
            segment_steps=segment_steps,
        )

    def mmu_generate(self, input_ids, max_new_tokens=128, steps=128,
                     block_length=128, temperature=0.0, cfg_scale=0.0,
                     remasking="low_confidence", key=None,
                     block_kv_cache=False, parallel_threshold=0.0,
                     parallel_warmup_steps=0, cache_refresh_every=0,
                     segment_steps=0):
        """Identical denoiser; prompt already contains the <|mmu|> image frame."""
        return self.generate(
            input_ids, gen_length=max_new_tokens, steps=steps,
            block_length=block_length, temperature=temperature,
            cfg_scale=cfg_scale, remasking=remasking, key=key,
            block_kv_cache=block_kv_cache,
            parallel_threshold=parallel_threshold,
            parallel_warmup_steps=parallel_warmup_steps,
            cache_refresh_every=cache_refresh_every,
            segment_steps=segment_steps,
        )

    # pinned per-block runner state (set by with_pinned_fast_runner; a
    # plain attribute, NOT a pytree field — used host-side only)
    _pinned_fast_runner = None

    def with_pinned_fast_runner(self, example_prompt, eot_token: int,
                                max_new_tokens=128, steps=128,
                                block_length=128, temperature=0.0,
                                cfg_scale=0.0, block_kv_cache=False,
                                parallel_threshold=0.0):
        """Return a copy of this model whose params are stored in the
        per-block early-stop runner's PREFERRED XLA layout, plus a
        pre-compiled AUTO-layout executable for that runner.

        The per-block runner is a standalone program invoked once per
        semi-AR block (`_early_stop_block`), i.e. exactly the
        multi-program serving case where serve/layouts measured a -27%
        call-time win from layout pinning (default-layout params pay a
        re-layout copy of the stacked q/k/v weights on every call).
        `mmu_generate_fast` uses the pinned executable automatically when
        its settings and shapes match; anything else falls back to the
        plain jitted runner. Measure with tools/bench_layout_pin.py."""
        from mmada_tpu.serve import layouts

        scfg = text_sampling.SemiARConfig(
            gen_length=max_new_tokens, steps=steps,
            block_length=block_length, temperature=temperature,
            cfg_scale=cfg_scale, mask_id=self.vocab.mask_token_id,
            parallel_threshold=parallel_threshold,
        )
        spb = scfg.steps_per_block
        block_cfg = dataclasses.replace(
            scfg, gen_length=block_length, steps=spb,
            block_length=block_length,
        )
        b, p = example_prompt.shape
        x = jnp.concatenate([
            jnp.asarray(example_prompt, jnp.int32),
            jnp.full((b, max_new_tokens), self.vocab.mask_token_id,
                     jnp.int32),
        ], axis=1)
        prompt_index = x != self.vocab.mask_token_id
        step_keys = jnp.zeros((spb, 2), jnp.uint32)
        transfers = text_sampling.num_transfer_schedule(
            jnp.full((b,), block_length, jnp.int32), spb
        )

        def fn(model, x, prompt_index, block_end, step_keys, transfers):
            return _early_stop_block(
                model, x, prompt_index, block_end, step_keys, transfers,
                block_cfg, kv_cached=block_kv_cache,
            )

        compiled, pinned = layouts.compile_with_pinned_layouts(
            fn, self, x, prompt_index, jnp.int32(p + block_length),
            step_keys, transfers,
        )
        model_pinned = pinned[0]
        in_fmt = (compiled.input_formats
                  if hasattr(compiled, "input_formats")
                  else compiled.input_layouts)
        arg_fmts = (in_fmt[0] if (isinstance(in_fmt, tuple)
                                  and len(in_fmt) == 2
                                  and isinstance(in_fmt[1], dict))
                    else in_fmt)
        settings = (x.shape, max_new_tokens, steps, block_length,
                    temperature, cfg_scale, bool(block_kv_cache) if
                    block_kv_cache != "int8" else "int8",
                    parallel_threshold, 0, 0)  # pinned: warmup/refresh 0
        model_pinned._pinned_fast_runner = (compiled, arg_fmts[1:], settings)
        return model_pinned

    def mmu_generate_fast(self, input_ids, eot_token: int, max_new_tokens=128,
                          steps=128, block_length=128, temperature=0.0,
                          cfg_scale=0.0, key=None, block_kv_cache=False,
                          parallel_threshold=0.0, parallel_warmup_steps=0,
                          cache_refresh_every=0):
        scfg = text_sampling.SemiARConfig(
            gen_length=max_new_tokens, steps=steps, block_length=block_length,
            temperature=temperature, cfg_scale=cfg_scale,
            mask_id=self.vocab.mask_token_id,
            parallel_threshold=parallel_threshold,
            parallel_warmup_steps=parallel_warmup_steps,
            cache_refresh_every=cache_refresh_every,
        )
        if block_kv_cache:
            self._validate_kv_cache_support()  # raise before the block loop

        # model passes as a jit ARGUMENT through the module-level runner:
        # `block_end` is traced, so one executable serves every block of
        # every call at these settings (the eager fallback re-traces and
        # re-compiles the whole block scan per block per call).
        pin = self._pinned_fast_runner
        if pin is not None:
            compiled, small_fmts, settings = pin
            b, p = input_ids.shape
            want = ((b, p + max_new_tokens), max_new_tokens, steps,
                    block_length, temperature, cfg_scale,
                    bool(block_kv_cache) if block_kv_cache != "int8"
                    else "int8", parallel_threshold, parallel_warmup_steps,
                    cache_refresh_every)
            if want == settings:
                def run_block(block_cfg, x, prompt_index, block_end,
                              step_keys, transfers):
                    # small args must match the AUTO executable's layouts
                    args = [
                        jax.device_put(a, f) for a, f in zip(
                            (x, prompt_index, jnp.int32(block_end),
                             step_keys, transfers), small_fmts,
                        )
                    ]
                    return compiled(self, *args)

                return text_sampling.generate_with_early_stop(
                    None, input_ids, scfg, eot_token, key=key,
                    run_block=run_block,
                )

        def run_block(block_cfg, x, prompt_index, block_end, step_keys,
                      transfers):
            return _early_stop_block(
                self, x, prompt_index, block_end, step_keys, transfers,
                block_cfg, kv_cached=block_kv_cache,
            )

        return text_sampling.generate_with_early_stop(
            None, input_ids, scfg, eot_token, key=key,
            run_block=run_block,
        )

    # ----------------------------------------------------------------- t2i
    def t2i_generate(self, input_ids, uncond_input_ids=None,
                     attention_mask=None, uncond_attention_mask=None,
                     temperature=1.0, timesteps=18, guidance_scale=0.0,
                     noise_schedule=cosine_schedule, num_vq_tokens=1024,
                     key=None, greedy=False, stepwise=False,
                     block_kv_cache=False, cache_refresh_every=0,
                     segment_timesteps=0, cfg_interval=(0.0, 1.0)):
        """`block_kv_cache=True`: capture the static text prompt's K/V once
        and forward only the image span per MaskGIT step (approximate;
        exact at timesteps=1 — see `_span_cache_fns`).
        `cache_refresh_every=N` re-captures every N steps — the
        staleness/quality knob for the cached mode.
        `segment_timesteps` (0 = off): run the EXACT sampler as multiple
        ≤N-step device programs (host loop — do not wrap in jit; the t2i
        analog of `generate(segment_steps=...)`).
        `cfg_interval=(lo, hi)`: apply CFG only for steps in the
        [lo, hi) step-fraction band; outside it the forward runs at
        SINGLE batch (see sampling/t2i.MaskGITConfig.cfg_interval)."""
        mcfg = t2i_sampling.MaskGITConfig(
            timesteps=timesteps, temperature=temperature,
            guidance_scale=guidance_scale, noise_schedule=noise_schedule,
            mask_id=self.vocab.mask_token_id, num_vq_tokens=num_vq_tokens,
            codebook_size=self.vocab.image_codebook_size,
            text_vocab_size=self.vocab.image_offset, greedy=greedy,
            cache_refresh_every=cache_refresh_every,
            cfg_interval=tuple(cfg_interval),
        )
        if segment_timesteps:
            if stepwise:
                raise ValueError(
                    "stepwise + segment_timesteps: drive t2i_segmented_run "
                    "and read .last_window per chunk instead (true "
                    "incremental streaming)"
                )
            run = self._t2i_segmented_run(
                input_ids, mcfg, key=key,
                uncond_input_ids=uncond_input_ids,
                attention_mask=attention_mask,
                uncond_attention_mask=uncond_attention_mask,
                segment_timesteps=segment_timesteps,
                block_kv_cache=block_kv_cache,
            )
            while not run.step():
                pass
            return run.codes
        fwd = self._window_forward_fn(num_vq_tokens, self.vocab.image_window)
        gen = (t2i_sampling.t2i_generate_stepwise if stepwise
               else t2i_sampling.t2i_generate)
        return gen(
            fwd, input_ids, mcfg, key=key,
            uncond_input_ids=uncond_input_ids,
            attention_mask=attention_mask,
            uncond_attention_mask=uncond_attention_mask,
            cache_fns=(self._span_cache_fns(self.vocab.image_window,
                                               num_vq_tokens,
                                               _cache_dtype(block_kv_cache))
                       if block_kv_cache else None),
        )

    def t2i_segmented_run(self, input_ids, uncond_input_ids=None,
                          attention_mask=None, uncond_attention_mask=None,
                          temperature=1.0, timesteps=18, guidance_scale=0.0,
                          noise_schedule=cosine_schedule, num_vq_tokens=1024,
                          key=None, greedy=False, segment_timesteps=8,
                          block_kv_cache=False, cfg_interval=(0.0, 1.0)):
        """`t2i_generate`'s incremental form (same kwargs): returns a
        `SegmentedT2IRun` — call `.step()` until True, then read
        `.codes`. Used by the serving engine for chunk-granularity t2i
        scheduling and by incremental stepwise streaming."""
        mcfg = t2i_sampling.MaskGITConfig(
            timesteps=timesteps, temperature=temperature,
            guidance_scale=guidance_scale, noise_schedule=noise_schedule,
            mask_id=self.vocab.mask_token_id, num_vq_tokens=num_vq_tokens,
            codebook_size=self.vocab.image_codebook_size,
            text_vocab_size=self.vocab.image_offset, greedy=greedy,
            cfg_interval=tuple(cfg_interval),
        )
        return self._t2i_segmented_run(
            input_ids, mcfg, key=key, uncond_input_ids=uncond_input_ids,
            attention_mask=attention_mask,
            uncond_attention_mask=uncond_attention_mask,
            segment_timesteps=segment_timesteps,
            block_kv_cache=block_kv_cache,
        )

    def _t2i_segmented_run(self, input_ids, mcfg, key=None,
                           uncond_input_ids=None, attention_mask=None,
                           uncond_attention_mask=None, segment_timesteps=8,
                           block_kv_cache=False):
        """Build a `t2i.SegmentedT2IRun` whose windows are jitted
        model-as-argument programs (`_t2i_window`): all equal-length
        windows of all calls share one executable. `.last_window` after
        each `step()` gives (W, B, n) grids for INCREMENTAL stepwise
        streaming — frames can be decoded/shown while later windows are
        still computing."""
        if block_kv_cache:
            raise ValueError(
                "segment_timesteps supports the exact sampler only "
                "(per-window K/V recapture would change the cache's "
                "staleness semantics)"
            )

        def run_window(carry, ts, step_keys, window_cfg):
            # window_cfg is mcfg or its guidance-off variant when a
            # cfg_interval cuts the window list (sampling/t2i): both are
            # static, so at most two executables are compiled and shared
            # across all windows of all calls.
            return _t2i_window(
                self, carry, ts, step_keys, uncond_input_ids,
                attention_mask, uncond_attention_mask, window_cfg,
            )

        return t2i_sampling.SegmentedT2IRun(
            None, input_ids, mcfg, key=key,
            uncond_input_ids=uncond_input_ids,
            attention_mask=attention_mask,
            uncond_attention_mask=uncond_attention_mask,
            segment_timesteps=segment_timesteps, run_window=run_window,
        )

    # ----------------------------------------------------------------- t2m
    def t2m_generate(self, input_ids, attention_mask=None, temperature=1.0,
                     timesteps=18, noise_schedule=cosine_schedule,
                     num_motion_tokens=256, key=None, greedy=False,
                     block_kv_cache=False, cache_refresh_every=0,
                     segment_timesteps=0):
        """`segment_timesteps` (0 = off): run the EXACT sampler as
        multiple ≤N-step device programs (host loop; the motion twin of
        t2i's knob)."""
        if self.vocab.motion_codebook_size == 0:
            raise ValueError("vocab has no motion window; use vocab.with_motion()")
        mcfg = motion_sampling.MotionGITConfig(
            timesteps=timesteps, temperature=temperature,
            noise_schedule=noise_schedule, mask_id=self.vocab.mask_token_id,
            num_motion_tokens=num_motion_tokens,
            motion_vocab_size=self.vocab.motion_codebook_size,
            motion_offset=self.vocab.motion_offset, greedy=greedy,
            cache_refresh_every=cache_refresh_every,
        )
        window = (
            self.vocab.motion_offset,
            self.vocab.motion_offset + self.vocab.motion_codebook_size,
        )
        fwd = self._window_forward_fn(num_motion_tokens, window)
        if segment_timesteps:
            if block_kv_cache:
                raise ValueError(
                    "segment_timesteps supports the exact sampler only "
                    "(per-window K/V recapture would change the cache's "
                    "staleness semantics)"
                )

            def run_window(carry, ts, step_keys):
                return _t2m_window(self, carry, ts, step_keys,
                                   attention_mask, mcfg)

            return motion_sampling.t2m_generate_segmented(
                None, input_ids, mcfg, key=key,
                attention_mask=attention_mask,
                segment_timesteps=segment_timesteps, run_window=run_window,
            )
        return motion_sampling.t2m_generate(
            fwd, input_ids, mcfg, key=key, attention_mask=attention_mask,
            cache_fns=(self._span_cache_fns(window, num_motion_tokens,
                                               _cache_dtype(block_kv_cache))
                       if block_kv_cache else None),
        )

    def t2m_segmented_run(self, input_ids, attention_mask=None,
                          temperature=1.0, timesteps=18,
                          noise_schedule=cosine_schedule,
                          num_motion_tokens=256, key=None, greedy=False,
                          segment_timesteps=8):
        """`t2m_generate`'s incremental form: returns a `SegmentedT2MRun`
        — call `.step()` until True, then read `.codes`. Used by the
        serving engine for chunk-granularity t2m scheduling."""
        if self.vocab.motion_codebook_size == 0:
            raise ValueError(
                "vocab has no motion window; use vocab.with_motion()"
            )
        mcfg = motion_sampling.MotionGITConfig(
            timesteps=timesteps, temperature=temperature,
            noise_schedule=noise_schedule, mask_id=self.vocab.mask_token_id,
            num_motion_tokens=num_motion_tokens,
            motion_vocab_size=self.vocab.motion_codebook_size,
            motion_offset=self.vocab.motion_offset, greedy=greedy,
        )

        def run_window(carry, ts, step_keys):
            return _t2m_window(self, carry, ts, step_keys,
                               attention_mask, mcfg)

        return motion_sampling.SegmentedT2MRun(
            None, input_ids, mcfg, key=key, attention_mask=attention_mask,
            segment_timesteps=segment_timesteps, run_window=run_window,
        )

    # ------------------------------------------------------------ training
    def forward_process(self, *args, **kwargs):
        from mmada_tpu.training.losses import forward_process

        return forward_process(self, *args, **kwargs)
