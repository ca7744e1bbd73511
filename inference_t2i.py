"""CLI text-to-image generation (MaskGIT + CFG + MAGVIT-v2 decode).

Parity entry point for `python3 inference_t2i.py config=configs/mmada_demo.yaml
batch_size=1 validation_prompts_file=validation_prompts/text2image_prompts.txt
guidance_scale=3.5 generation_timesteps=15 ...` (reference inference_t2i.py:42-129).
Images are written to `{output_dir}/` as PNG (the reference logs to wandb).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main(argv):
    from PIL import Image

    from mmada_tpu.core.config import load_config
    from mmada_tpu.models import magvit2
    from mmada_tpu.serve.loader import load_all

    cfg = load_config(cli_args=argv)
    # the reference promotes top-level CLI keys into the nested config
    # (inference_t2i.py:76-81)
    guidance_scale = float(cfg.get("guidance_scale", 3.5))
    timesteps = int(cfg.get("generation_timesteps", 15))
    temperature = float(cfg.get("generation_temperature", 1.0))
    batch_size = int(cfg.get("batch_size", 1))
    # family-resolved defaults: serving.t2i.* overrides flat serving.*
    # (the t2i arm passed the truth gate within slack — round-3q)
    from mmada_tpu.core.config import parse_kv_cache
    from mmada_tpu.serve.loader import task_serving_defaults
    _d = task_serving_defaults(cfg, "t2i")
    kv_cache = parse_kv_cache(cfg.get("kv_cache", _d["kv_cache"]))
    cache_refresh_every = int(cfg.get(
        "cache_refresh_every", _d["cache_refresh_every"]))
    # exact sampler as <=N-timestep device programs (token-identical;
    # bounds single-program wall time on execution-limited workers)
    segment_timesteps = int(cfg.get(
        "segment_timesteps", _d["segment_timesteps"]
    ))
    # guidance interval (CLI `cfg_interval=0.2,0.8`): CFG only inside the
    # band — exact cond-only forwards elsewhere (sampling/t2i)
    from mmada_tpu.core.config import parse_cfg_interval
    cfg_interval = parse_cfg_interval(
        cfg.get("cfg_interval", _d["cfg_interval"]))
    if kv_cache:
        segment_timesteps = 0  # cached decode wins when both are set
        cfg_interval = (0.0, 1.0)
    seed = int(cfg.get("seed", 0))
    output_dir = cfg.get("output_dir", "t2i_outputs")
    prompts_file = cfg.get(
        "validation_prompts_file", "validation_prompts/text2image_prompts.txt"
    )

    model, vq_params, vq_cfg, tokenizer, prompting, vocab = load_all(cfg)
    num_vq_tokens = int(cfg.get_path("model.mmada.num_vq_tokens", 1024))
    mask_id = vocab.mask_token_id

    if os.path.exists(prompts_file):
        with open(prompts_file) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
    else:
        prompts = [cfg.get("prompt", "a photo of a cat")]

    scorer = None
    if cfg.get("quantative", False):
        # stage-4 quality instruments (CLIP score / ImageReward) when a
        # local CLIP checkpoint is configured (eval/image_quality.py)
        from mmada_tpu.eval.image_quality import load_scorer

        scorer = load_scorer(cfg.get_path("eval.clip_dir"))
    all_pixels, all_prompts = [], []

    os.makedirs(output_dir, exist_ok=True)
    key = jax.random.key(seed)
    for start in range(0, len(prompts), batch_size):
        chunk = prompts[start : start + batch_size]
        image_ids = np.full((len(chunk), num_vq_tokens), mask_id, np.int64)
        input_ids, attn = prompting(( chunk, image_ids ), "t2i_gen")
        uncond_ids, uncond_attn = prompting.t2i_gen_uncond(
            len(chunk), num_vq_tokens, mask_id
        )
        key, sub = jax.random.split(key)
        codes = model.t2i_generate(
            jnp.asarray(input_ids),
            uncond_input_ids=jnp.asarray(uncond_ids),
            attention_mask=jnp.asarray(attn),
            uncond_attention_mask=jnp.asarray(uncond_attn),
            temperature=temperature,
            timesteps=timesteps,
            guidance_scale=guidance_scale,
            num_vq_tokens=num_vq_tokens,
            key=sub,
            block_kv_cache=kv_cache,
            cache_refresh_every=cache_refresh_every,
            segment_timesteps=segment_timesteps,
            cfg_interval=cfg_interval,
        )
        pixels = magvit2.decode_code(vq_params, vq_cfg, codes)
        pixels = np.asarray(jnp.clip((pixels + 1.0) * 127.5, 0, 255)).astype(np.uint8)
        for i, prompt in enumerate(chunk):
            path = os.path.join(output_dir, f"{start + i:04d}.png")
            Image.fromarray(pixels[i]).save(path)
            print(f"{path}: {prompt}")
        if scorer is not None:
            all_pixels.append(pixels.astype(np.float32) / 127.5 - 1.0)
            all_prompts.extend(chunk)

    if scorer is not None and all_pixels:
        import json

        results = scorer.quantitative_images(
            np.concatenate(all_pixels), all_prompts
        )
        with open(os.path.join(output_dir, "quantative.json"), "w") as f:
            json.dump(results, f, indent=2)
        print("quantative:", results or "(scoring models unavailable)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
