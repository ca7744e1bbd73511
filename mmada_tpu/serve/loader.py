"""Model/tokenizer construction from config for CLIs and serving.

Mirrors the reference entry-point setup blocks (inference_t2i.py:56-85,
inference_mmu.py:40-71, generate.py:116-131): build text tokenizer,
UniversalPrompting, MAGVIT-v2, and the MMaDA model. Supports:

  * `pretrained_model_path` — local HF checkpoint dir (safetensors);
  * `random_init` — architecture from config, random weights (tiny smoke
    configs; this zero-egress environment has no hub access).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp

from mmada_tpu.core.compile_cache import enable_compilation_cache
from mmada_tpu.core.config import Config, parse_remat
from mmada_tpu.core.precision import BF16, FP32, policy_from_name
from mmada_tpu.core.vocab import MMADA_8B, VocabLayout, tiny_layout
from mmada_tpu.models import llada, magvit2
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.prompting.universal import (
    ByteTokenizer,
    SpecialIds,
    UniversalPrompting,
)

logger = logging.getLogger(__name__)


#: The gate-promoted composed fast stack, FAMILY-RESOLVED (the quality
#: evidence is per-family — BASELINE.md rounds 3q-3u, MMU_GATE_r05):
#: text needs the refresh cadence + warmup to preserve truth accuracy;
#: MMU preserves under the full int8-KV freeze with the τ-parallel
#: commit (2.80× at truth 0.9986, n=32 gate); t2i is within slack under
#: the plain block-KV cache (MaskGIT re-sampling self-corrects).
FAST_STACK_PRESET = {
    "text": {"kv_cache": "int8", "parallel_threshold": 0.9,
             "parallel_warmup_steps": 8, "cache_refresh_every": 4},
    "mmu": {"kv_cache": "int8", "parallel_threshold": 0.9,
            "parallel_warmup_steps": 2, "cache_refresh_every": 0},
    "t2i": {"kv_cache": True, "parallel_threshold": 0.0,
            "parallel_warmup_steps": 0, "cache_refresh_every": 0},
}


def task_serving_defaults(cfg: Config, task: str) -> dict:
    """Resolve the fast-decode deployment defaults for one task family.

    `serving.<task>.<key>` overrides the flat `serving.<key>`, because the
    trained-proxy quality evidence is FAMILY-RESOLVED (BASELINE.md rounds
    3q–3u): text needs `cache_refresh_every=4` or `parallel_warmup_steps=8`
    to preserve quality under the fast stack, MMU preserves quality under
    the full block-KV freeze (static image prefix), t2i is within slack. A
    deployment can therefore enable kv for mmu/t2i while keeping text
    exact:

        serving:
          kv_cache: false           # flat default (text stays exact)
          mmu:  {kv_cache: int8}    # family override
          t2i:  {kv_cache: true}

    Per-request fields still override both levels (app.py handlers).

    `serving.fast_stack: true` (or per-family `serving.<task>.fast_stack`)
    swaps the FALLBACK values for the gate-promoted composed fast stack —
    the one-knob opt-in for the composition every r05 gate promotes
    (MMU_GATE_r05 kv_parallel_warmup2 2.80×; SERVING_r05 engine aggregate
    1.99×; text cadence per BASELINE.md rounds 3r-3u). Explicit
    `serving.<key>` / `serving.<task>.<key>` / per-request fields still
    override every individual knob. cfg_interval is deliberately NOT part
    of the preset: its proxy gate cannot observe whether guiding has
    value (guidance_informative=false), so it stays an individually
    chosen opt-in."""
    from mmada_tpu.core.config import (
        parse_bool, parse_cfg_interval, parse_kv_cache,
    )

    def g(key, fallback, cast):
        v = cfg.get_path(f"serving.{task}.{key}", None)
        if v is None:
            v = cfg.get_path(f"serving.{key}", fallback)
        return cast(v)

    fb = {"kv_cache": False, "parallel_threshold": 0.0,
          "parallel_warmup_steps": 0, "cache_refresh_every": 0}
    if g("fast_stack", False, parse_bool):
        # families without gate evidence (t2m) keep exact fallbacks
        fb = {**fb, **FAST_STACK_PRESET.get(task, {})}

    return {
        "kv_cache": g("kv_cache", fb["kv_cache"], parse_kv_cache),
        "parallel_threshold": g("parallel_threshold",
                                fb["parallel_threshold"], float),
        "parallel_warmup_steps": g("parallel_warmup_steps",
                                   fb["parallel_warmup_steps"], int),
        "cache_refresh_every": g("cache_refresh_every",
                                 fb["cache_refresh_every"], int),
        "segment_steps": g("segment_steps", 0, int),
        "segment_timesteps": g("segment_timesteps", 0, int),
        # t2i guidance interval (sampling/t2i.MaskGITConfig.cfg_interval):
        # CFG only for steps in the [lo, hi) band — exact single-batch
        # forwards elsewhere. Exact-sampler only; kv_cache wins when both
        # are set (same precedence as segmentation).
        "cfg_interval": g("cfg_interval", None, parse_cfg_interval),
    }


def build_text_tokenizer(cfg: Config):
    path = cfg.get_path("model.mmada.tokenizer_path") or cfg.get_path(
        "model.mmada.pretrained_model_path"
    )
    if path and not cfg.get_path("model.mmada.random_init", False):
        from transformers import AutoTokenizer

        try:
            return AutoTokenizer.from_pretrained(path, trust_remote_code=True)
        except Exception as e:
            # locally-exported checkpoints (tools/export_checkpoint.py)
            # carry weights + config.json but no tokenizer assets —
            # serving one must not crash the app (found driving the
            # trained proxy through app.py, round 3)
            logger.warning(
                "AutoTokenizer.from_pretrained(%s) failed (%s); falling "
                "back to ByteTokenizer", path, e,
            )
            return ByteTokenizer()
    logger.warning("using ByteTokenizer (no pretrained tokenizer configured)")
    return ByteTokenizer()


def build_vocab(cfg: Config) -> VocabLayout:
    m = cfg.get_path("model.mmada", Config())
    if m.get("tiny"):
        # ByteTokenizer emits ids up to 16+256=272; keep specials/mask above
        return tiny_layout(
            text_vocab_size=max(m.get("llm_vocab_size", 256), 300),
            image_codebook_size=m.get("codebook_size", 64),
            motion_codebook_size=m.get("motion_vocab_size", 0),
            motion_special=2 if m.get("motion_vocab_size") else 0,
        )
    vocab = MMADA_8B
    nnst = int(m.get("num_new_special_tokens", 0) or 0)
    if nnst:
        # reference offsets the image window by len(tokenizer) +
        # num_new_special_tokens (modeling_mmada.py:168): appended special
        # tokens extend the text region, pushing the VQ windows up
        vocab = dataclasses.replace(
            vocab, text_vocab_size=vocab.text_vocab_size + nnst
        )
    if m.get("motion_vocab_size"):
        vocab = vocab.with_motion(m["motion_vocab_size"])
    return vocab


def build_prompting(cfg: Config, tokenizer, vocab: VocabLayout) -> UniversalPrompting:
    if cfg.get_path("model.mmada.tiny"):
        sp = SpecialIds(
            soi=vocab.text_vocab_size - 20, eoi=vocab.text_vocab_size - 19,
            t2i=vocab.text_vocab_size - 18, mmu=vocab.text_vocab_size - 17,
            r2i=vocab.text_vocab_size - 16, t2m=vocab.text_vocab_size - 15,
            som=vocab.text_vocab_size - 14, eom=vocab.text_vocab_size - 13,
            pad=vocab.pad_token_id,
            bos=getattr(tokenizer, "bos_token_id", 1) or 1,
            eos=getattr(tokenizer, "eos_token_id", 2) or 2,
        )
    else:
        sp = SpecialIds.from_vocab(vocab)
        if getattr(tokenizer, "bos_token_id", None) is not None:
            sp = dataclasses.replace(
                sp, bos=tokenizer.bos_token_id, eos=tokenizer.eos_token_id
            )
        # chat prompt masks key off <|end_header_id|>
        # (prompting_utils.py:271-314); without it lm_chat masks nothing
        if hasattr(tokenizer, "convert_tokens_to_ids"):
            try:
                eh = tokenizer.convert_tokens_to_ids("<|end_header_id|>")
                unk = getattr(tokenizer, "unk_token_id", None)
                if eh is not None and eh >= 0 and eh != unk:
                    sp = dataclasses.replace(sp, end_header=eh)
            except Exception:
                pass
    return UniversalPrompting(
        tokenizer, sp,
        max_text_len=cfg.get_path("dataset.preprocessing.max_seq_length", 512),
        cond_dropout_prob=cfg.get_path("training.cond_dropout_prob", 0.1),
    )


def serving_mesh(cfg: Config):
    """Device mesh for serving when more than one device is visible.

    The reference has no multi-device serving at all; here every CLI/app
    entry point serves sharded by default on a slice: params FSDP+TP
    sharded (`parallel.{data,fsdp,tensor}`, default all-fsdp) and
    attention dispatched through the shard_map kernels
    (models/llada._dispatch_attention). Opt out with `parallel.serving:
    none` (replicated single-device execution)."""
    if jax.device_count() == 1:
        return None
    p = cfg.get_path("parallel", Config())
    if str(p.get("serving", "auto")).lower() == "none":
        return None
    from mmada_tpu.core.mesh import make_mesh

    return make_mesh(
        data=p.get("data", 1), fsdp=p.get("fsdp", -1),
        tensor=p.get("tensor", 1),
    )


def build_model(cfg: Config, vocab: VocabLayout) -> MMadaModel:
    # before any compile: serving cold-start is compile-dominated
    # (core/compile_cache.py); every CLI/app builds its model here
    enable_compilation_cache(cfg)
    m = cfg.get_path("model.mmada", Config())
    policy = policy_from_name(
        cfg.get_path("training.mixed_precision", "bf16")
        if not m.get("tiny") else "fp32"
    )
    # activation checkpointing (reference configuration_llada.py:386-430 /
    # training.gradient_checkpointing): one jax.checkpoint on the layer
    # scan — required to fit full-depth training in HBM. Accepts
    # true/false/"full"/"dots" ("dots" keeps matmul outputs, cutting the
    # recompute tax where memory allows — core.config.parse_remat).
    remat = parse_remat(
        cfg.get_path("training.gradient_checkpointing",
                     cfg.get_path("model.gradient_checkpointing", False))
    )
    if m.get("random_init") or m.get("tiny"):
        if m.get("tiny"):
            arch = llada.tiny_config(vocab_size=vocab.total_vocab_size)
            arch = dataclasses.replace(arch, mask_token_id=vocab.mask_token_id)
        else:
            arch = llada.llada_8b(vocab.total_vocab_size)
            overrides = m.get("arch")
            if overrides:
                # mid-scale proxies: flagship traits (fused vocab, llama
                # block, RoPE 500k) at reduced width/depth — e.g.
                # configs/proxy_160m.yaml for the on-chip gate-evidence run
                arch = dataclasses.replace(
                    arch,
                    **{k: overrides[k] for k in (
                        "d_model", "n_heads", "n_kv_heads", "n_layers",
                        "mlp_hidden_size", "max_sequence_length",
                        "rope_theta", "weight_tying",
                    ) if overrides.get(k) is not None},
                )
        if "tie_word_embeddings" in m:
            # only honored for random init: a pretrained checkpoint's own
            # config decides whether an ff_out head exists in its weights
            arch = dataclasses.replace(
                arch, weight_tying=bool(m["tie_word_embeddings"])
            )
        model = MMadaModel.init(
            jax.random.key(cfg.get_path("training.seed", 0)),
            arch, vocab, policy=policy,
            dtype=policy.param_dtype, remat=remat,
        )
        return _maybe_shard(cfg, model)
    path = m.get("pretrained_model_path")
    if not path:
        raise ValueError("model.mmada.pretrained_model_path or tiny/random_init required")
    model = MMadaModel.from_pretrained(
        path, vocab, dtype=policy.param_dtype, policy=policy, remat=remat
    )
    if m.get("quantize") in ("int8", "w8", "w8a8", "w8a8_smooth", "int4"):
        # full-depth 8B on one 16 GB chip (ops/quantization.py);
        # 'w8a8_smooth' folds SmoothQuant scale migration in first
        # (ops/smoothquant.py) — calibrate with real prompt ids via
        # model.mmada.smoothquant_calib (path to an int32 (N, L) .npy)
        # or fall back to synthetic text+t2i-frame batches. 'int4' is the
        # grouped-nibble CAPACITY scheme (ops/int4_matmul.py — measured
        # 0.61x int8 decode speed, INT4_r03.json; use for memory headroom).
        from mmada_tpu.ops.quantization import quantize_llada_params

        if m.get("quantize") == "w8a8_smooth":
            from mmada_tpu.ops.smoothquant import smooth_quantize

            params = smooth_quantize(
                model.params, model.cfg,
                _calibration_batches(m, model.cfg, vocab),
                alpha=float(m.get("smoothquant_alpha", 0.5)),
            )
        else:
            params = quantize_llada_params(
                model.params,
                activations=m.get("quantize") == "w8a8",
                bits=4 if m.get("quantize") == "int4" else 8,
            )
        model = dataclasses.replace(model, params=params)
    return _maybe_shard(cfg, model)


def _calibration_batches(m, arch, vocab):
    """SmoothQuant calibration ids: a user-supplied prompt-token file when
    available (`model.mmada.smoothquant_calib`), else deterministic
    synthetic batches spanning the fused vocab's regimes — a text-range
    batch and a t2i-shaped frame (text prefix + image-code span + masks).
    Channel-outlier LOCATIONS are a property of the weights far more than
    of the prompt mix (SmoothQuant paper §5.4), so synthetic calibration
    is a serviceable default; prefer real prompts when deployed."""
    import numpy as np

    path = m.get("smoothquant_calib")
    if path:
        ids = np.load(path).astype(np.int32)
        if ids.ndim != 2:
            raise ValueError(f"smoothquant_calib must be (N, L), got {ids.shape}")
        return [ids[i:i + 4] for i in range(0, min(len(ids), 16), 4)]
    rng = np.random.default_rng(0)
    text_hi = min(vocab.text_vocab_size, arch.vocab_size) - 1
    text = rng.integers(3, text_hi, (2, 128), dtype=np.int32)
    frame = rng.integers(3, text_hi, (2, 160), dtype=np.int32)
    img_lo = vocab.image_offset
    img_hi = min(img_lo + vocab.image_codebook_size, arch.vocab_size)
    if img_lo < img_hi:
        frame[:, 32:96] = rng.integers(img_lo, img_hi, (2, 64), dtype=np.int32)
    if vocab.mask_token_id < arch.vocab_size:
        frame[:, 96:] = vocab.mask_token_id
    return [text, frame]


def _maybe_shard(cfg: Config, model: MMadaModel) -> MMadaModel:
    mesh = serving_mesh(cfg)
    if mesh is None:
        return model
    mode = str(cfg.get_path("parallel.serving", "auto")).lower()
    if mode == "pipeline":
        # GPipe over the fsdp axis: layer-sharded stages, ppermute-only
        # transfers (parallel/pipeline.py); raw-array params required
        from mmada_tpu.ops.quantization import is_quantized
        from mmada_tpu.parallel import pipeline

        if any(is_quantized(l) for l in jax.tree.leaves(
                model.params, is_leaf=is_quantized)):
            raise ValueError("parallel.serving=pipeline requires "
                             "unquantized params (bf16 multi-chip regime)")
        if model.cfg.n_layers % mesh.shape["fsdp"]:
            raise ValueError(
                f"{model.cfg.n_layers} layers do not divide the fsdp axis "
                f"({mesh.shape['fsdp']}) for pipeline stages"
            )
        logger.info("pipeline serving: %d stages over mesh %s",
                    mesh.shape["fsdp"], dict(mesh.shape))
        params = pipeline.shard_stage_params(model.params, mesh, "fsdp")
        return dataclasses.replace(
            model, params=params, mesh=mesh, pipeline_axis="fsdp"
        )
    from mmada_tpu.parallel import sharding

    logger.info("serving sharded over mesh %s", dict(mesh.shape))
    params = sharding.shard_params(
        model.params, sharding.llada_param_specs(model.cfg), mesh
    )
    return dataclasses.replace(model, params=params, mesh=mesh)


def build_vq_model(cfg: Config):
    """(params, vq_cfg) for the MAGVIT-v2 tokenizer."""
    v = cfg.get_path("model.vq_model", Config())
    if v.get("tiny"):
        vq_cfg = magvit2.tiny_vqgan()
        params = magvit2.init_magvit2(jax.random.key(1), vq_cfg)
        return params, vq_cfg
    vq_cfg = magvit2.magvit2_default()
    path = v.get("vq_model_path") or v.get("vq_model_name")
    if path and v.get("local", True) and __import__("os").path.isdir(str(path)):
        from mmada_tpu.checkpoints.magvit_import import load_magvit2

        return load_magvit2(str(path), vq_cfg), vq_cfg
    logger.warning("VQ model %s unavailable locally; random init", path)
    return magvit2.init_magvit2(jax.random.key(1), vq_cfg), vq_cfg


def load_all(cfg: Config):
    """(model, vq, vq_cfg, tokenizer, prompting, vocab) — one-call setup."""
    tokenizer = build_text_tokenizer(cfg)
    vocab = build_vocab(cfg)
    prompting = build_prompting(cfg, tokenizer, vocab)
    model = build_model(cfg, vocab)
    vq_params, vq_cfg = build_vq_model(cfg)
    return model, vq_params, vq_cfg, tokenizer, prompting, vocab
