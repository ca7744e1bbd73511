"""CLI text generation via semi-autoregressive masked diffusion.

Parity entry point for the reference's `python generate.py`
(generate.py:116-137), config-driven like the other CLIs:

    python generate.py config=configs/mmada_demo.yaml \
        prompt="..." gen_length=512 steps=256 block_length=64

The denoise loop is one jitted program (mmada_tpu/sampling/text.py).
"""

import sys

import jax
import jax.numpy as jnp


def main(argv):
    from mmada_tpu.core.config import load_config
    from mmada_tpu.serve.loader import build_model, build_prompting, build_text_tokenizer, build_vocab

    cfg = load_config(cli_args=argv)
    prompt_text = cfg.get("prompt", "What is the capital of France?")
    gen_length = int(cfg.get("gen_length", 128))
    steps = int(cfg.get("steps", 128))
    block_length = int(cfg.get("block_length", gen_length))
    temperature = float(cfg.get("temperature", 0.0))
    cfg_scale = float(cfg.get("cfg_scale", 0.0))
    # family-resolved deployment defaults (serving.text.* overrides the
    # flat serving.* — BASELINE.md rounds 3q-3t; loader.task_serving_defaults),
    # with direct CLI keys overriding both
    from mmada_tpu.core.config import parse_kv_cache
    from mmada_tpu.serve.loader import task_serving_defaults
    _d = task_serving_defaults(cfg, "text")
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
    # exact sampler as <=N-step device programs (token-identical; for
    # heavy op points under bounded execution time)
    segment_steps = int(cfg.get("segment_steps", _d["segment_steps"]))
    if kv_cache:
        segment_steps = 0  # cached decode wins when both defaults are set
    seed = int(cfg.get("seed", 0))

    tokenizer = build_text_tokenizer(cfg)
    vocab = build_vocab(cfg)
    prompting = build_prompting(cfg, tokenizer, vocab)
    model = build_model(cfg, vocab)

    if hasattr(tokenizer, "apply_chat_template") and cfg.get("chat", True):
        try:
            text = tokenizer.apply_chat_template(
                [{"role": "user", "content": prompt_text}],
                add_generation_prompt=True, tokenize=False,
            )
        except Exception:
            text = prompt_text
    else:
        text = prompt_text
    ids = list(tokenizer([text])["input_ids"][0])
    # every LM training frame starts with BOS (the reference chat template
    # prepends bos_token, app.py:115); tokenizers without a chat template
    # (ByteTokenizer) never insert it themselves — idempotent for HF ones
    if not ids or ids[0] != vocab.bos_token_id:
        ids = [vocab.bos_token_id] + ids
    prompt = jnp.asarray([ids], jnp.int32)

    out = model.generate(
        prompt,
        gen_length=gen_length,
        steps=steps,
        block_length=block_length,
        temperature=temperature,
        cfg_scale=cfg_scale,
        key=jax.random.key(seed) if temperature > 0 else None,
        block_kv_cache=kv_cache,
        parallel_threshold=parallel_threshold,
        parallel_warmup_steps=parallel_warmup_steps,
        cache_refresh_every=cache_refresh_every,
        segment_steps=segment_steps,
    )
    answer = out[0, prompt.shape[1]:]
    # filter to the text vocab: sampled ids can land in the image/motion
    # windows, which HF tokenizers cannot decode
    answer = answer[answer < vocab.text_vocab_size].tolist()
    print(tokenizer.decode(answer))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
