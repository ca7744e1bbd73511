"""CLI multimodal understanding: image → caption/answer.

Parity entry point for `python3 inference_mmu.py config=configs/mmada_demo.yaml
mmu_image_root=./mmu_validation question='Please describe this image in detail.'`
(reference inference_mmu.py:38-115): MAGVIT-v2 encode → <|mmu|> frame →
semi-AR text denoising.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main(argv):
    from PIL import Image

    from mmada_tpu.core.config import load_config
    from mmada_tpu.data.transforms import image_transform
    from mmada_tpu.models import magvit2
    from mmada_tpu.serve.loader import load_all

    cfg = load_config(cli_args=argv)
    image_root = cfg.get("mmu_image_root", "mmu_validation")
    question = cfg.get("question", "Please describe this image in detail.")
    max_new_tokens = int(cfg.get("max_new_tokens", 128))
    steps = int(cfg.get("steps", max_new_tokens // 2))
    block_length = int(cfg.get("block_length", max_new_tokens))
    resolution = int(cfg.get_path("dataset.preprocessing.resolution", 512))
    # family-resolved deployment defaults (serving.mmu.* overrides the
    # flat serving.* — BASELINE.md rounds 3q-3t; loader.task_serving_defaults),
    # with direct CLI keys overriding both
    from mmada_tpu.core.config import parse_kv_cache
    from mmada_tpu.serve.loader import task_serving_defaults
    _d = task_serving_defaults(cfg, "mmu")
    kv_cache = parse_kv_cache(cfg.get("kv_cache", _d["kv_cache"]))
    parallel_threshold = float(cfg.get(
        "parallel_threshold", _d["parallel_threshold"]))
    # τ fires only after K steps/block (warmup=8 preserved trained-proxy
    # truth accuracy at 1.15x — PARALLEL_WARMUP_r03.json)
    parallel_warmup_steps = int(cfg.get(
        "parallel_warmup_steps", _d["parallel_warmup_steps"]))
    # cached-mode staleness knob: re-capture K/V every N steps (0 = once
    # per block; refresh=1 is token-exact vs the uncached sampler)
    cache_refresh_every = int(cfg.get(
        "cache_refresh_every", _d["cache_refresh_every"]))
    # Exact sampler only: split the denoise scan into <=N-step programs
    # (token-identical; needed for heavy op points on the tunneled chip,
    # whose worker kills single executions over ~60 s).
    segment_steps = int(cfg.get("segment_steps", _d["segment_steps"]))
    if kv_cache:
        segment_steps = 0  # cached decode wins when both defaults are set
    seed = int(cfg.get("seed", 0))

    model, vq_params, vq_cfg, tokenizer, prompting, vocab = load_all(cfg)
    sp = prompting.sp

    files = sorted(
        f for f in os.listdir(image_root)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp"))
    ) if os.path.isdir(image_root) else []
    if not files:
        print(f"no images under {image_root}", file=sys.stderr)
        return 1

    for fname in files:
        with Image.open(os.path.join(image_root, fname)) as img:
            pixels = image_transform(img, resolution)
        codes = magvit2.get_code(
            vq_params, vq_cfg, jnp.asarray(pixels)[None]
        )
        fused = np.asarray(codes) + vocab.image_offset

        if hasattr(tokenizer, "apply_chat_template"):
            try:
                text = tokenizer.apply_chat_template(
                    [{"role": "user", "content": question}],
                    add_generation_prompt=True, tokenize=False,
                )
            except Exception:
                text = question
        else:
            text = question
        text_ids = tokenizer([text])["input_ids"][0]
        # frame: <|mmu|> <|soi|> img <|eoi|> <bos> question...
        frame = np.concatenate([
            [sp.mmu, sp.soi], fused[0], [sp.eoi], [sp.bos], text_ids,
        ]).astype(np.int32)[None]

        if cfg.get("fast", False):
            # mmu_generate_fast: stop early when a block ends in EOT
            # (modeling_mmada.py:484-556)
            out = model.mmu_generate_fast(
                jnp.asarray(frame),
                eot_token=prompting.sp.eos,
                max_new_tokens=max_new_tokens,
                steps=steps,
                block_length=block_length,
                key=jax.random.key(seed),
                block_kv_cache=kv_cache,
                parallel_threshold=parallel_threshold,
                parallel_warmup_steps=parallel_warmup_steps,
                cache_refresh_every=cache_refresh_every,
            )
        else:
            out = model.mmu_generate(
                jnp.asarray(frame),
                max_new_tokens=max_new_tokens,
                steps=steps,
                block_length=block_length,
                key=jax.random.key(seed),
                block_kv_cache=kv_cache,
                parallel_threshold=parallel_threshold,
                parallel_warmup_steps=parallel_warmup_steps,
                cache_refresh_every=cache_refresh_every,
                segment_steps=segment_steps,
            )
        answer_ids = np.asarray(out[0, frame.shape[1]:])
        answer_ids = answer_ids[answer_ids < vocab.text_vocab_size]
        print(f"=== {fname}\n{tokenizer.decode(answer_ids.tolist())}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
