"""Multimodal API quickstart — text / t2i / MMU in one script.

Runs out of the box with the tiny random demo config:

    python examples/multimodal_quickstart.py

Swap `configs/tiny_test.yaml` for a real config (with
`model.mmada.pretrained_model_path` and `model.vq_model.pretrained`) to run
trained weights; every call below is unchanged. Mirrors the reference's
three inference CLIs (generate.py, inference_t2i.py, inference_mmu.py) as
library calls.
"""

import argparse
import os
import sys

import numpy as np

# runnable as `python examples/multimodal_quickstart.py` without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/tiny_test.yaml")
    ap.add_argument("--prompt", default="a photo of a red cube")
    ap.add_argument("--out_png", default=None, help="save the t2i image here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmada_tpu.core.config import load_config
    from mmada_tpu.models import magvit2
    from mmada_tpu.serve.loader import load_all

    cfg = load_config(
        args.config,
        overrides=["model.mmada.num_vq_tokens=64",
                   "dataset.preprocessing.resolution=16"],
    )
    model, vq_params, vq_cfg, tokenizer, prompting, vocab = load_all(cfg)
    num_vq = int(cfg.get_path("model.mmada.num_vq_tokens", 1024))

    # ------------------------------------------------ 1. text generation
    ids = tokenizer([args.prompt])["input_ids"]
    out = model.generate(
        jnp.asarray(ids, jnp.int32), gen_length=16, steps=8, block_length=8,
        temperature=1.0, key=jax.random.key(0),
    )
    answer = np.asarray(out[0, len(ids[0]):])
    answer = answer[answer < vocab.text_vocab_size]
    print("text:", repr(tokenizer.decode(answer.tolist())))

    # ------------------------------- 2. per-step trajectory (streaming UI)
    # temperature>0: with random demo weights, greedy argmax can keep
    # re-predicting the mask token itself; Gumbel sampling shows the
    # commit-per-step schedule clearly
    traj = model.generate_stepwise(
        jnp.asarray(ids, jnp.int32), gen_length=16, steps=8, block_length=8,
        temperature=1.0, key=jax.random.key(2),
    )
    masked_per_step = (np.asarray(traj) == vocab.mask_token_id).sum(axis=(1, 2))
    print("stepwise masked counts:", masked_per_step.tolist())

    # --------------------------------------------------- 3. text-to-image
    mask_id = vocab.mask_token_id
    image_ids = np.full((1, num_vq), mask_id, np.int64)
    input_ids, attn = prompting(([args.prompt], image_ids), "t2i_gen")
    uncond_ids, uncond_attn = prompting.t2i_gen_uncond(1, num_vq, mask_id)
    codes = model.t2i_generate(
        jnp.asarray(input_ids), uncond_input_ids=jnp.asarray(uncond_ids),
        attention_mask=jnp.asarray(attn),
        uncond_attention_mask=jnp.asarray(uncond_attn),
        timesteps=4, guidance_scale=3.5, num_vq_tokens=num_vq,
        key=jax.random.key(1),
    )
    pixels = magvit2.decode_code(vq_params, vq_cfg, codes)
    arr = np.asarray((np.asarray(pixels[0]) + 1.0) * 127.5).clip(0, 255)
    print(f"t2i: {num_vq} VQ codes -> image {arr.shape}")
    if args.out_png:
        from PIL import Image

        Image.fromarray(arr.astype(np.uint8)).save(args.out_png)
        print("wrote", args.out_png)

    # ------------------------------------------- 4. image understanding
    img = jnp.asarray(arr / 127.5 - 1.0, jnp.float32)[None]
    img_codes = magvit2.get_code(vq_params, vq_cfg, img)
    fused = np.asarray(img_codes)[0] + vocab.image_offset
    sp = prompting.sp
    q_ids = tokenizer(["What is in this image?"])["input_ids"][0]
    frame = np.concatenate(
        [[sp.mmu, sp.soi], fused, [sp.eoi, sp.bos], q_ids]
    ).astype(np.int32)[None]
    out = model.mmu_generate(
        jnp.asarray(frame), max_new_tokens=16, steps=8, block_length=16,
    )
    ans = np.asarray(out[0, frame.shape[1]:])
    ans = ans[ans < vocab.text_vocab_size]
    print("mmu:", repr(tokenizer.decode(ans.tolist())))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
