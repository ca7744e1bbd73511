"""Text-to-motion generation walkthrough — runs end-to-end out of the box.

Counterpart of the reference `examples/text_to_motion_generation.py`, which
calls `generate_motion_from_text` / `t2m_generate_with_cfg` — APIs that do
not exist (only `t2m_generate` is real, modelling_ours.py:557). This
walkthrough uses the REAL API with a tiny random model:

    python examples/text_to_motion_generation.py --gif /tmp/motion.gif

For trained weights, load via `MMadaModel.from_pretrained` and
`checkpoints/motion_import` instead of the `*_random_*` blocks below.

Pipeline: caption → t2m prompt frame → MaskGIT denoise over the motion
vocab window → motion-VQ decode to HumanML3D features → recover joint
positions → stick-figure GIF.
"""

import argparse
import dataclasses
import os
import sys

import numpy as np

# runnable as `python examples/text_to_motion_generation.py` without install
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--caption", default="a person walks forward")
    ap.add_argument("--num_motion_tokens", type=int, default=16)
    ap.add_argument("--timesteps", type=int, default=8)
    ap.add_argument("--gif", default=None, help="write a stick-figure GIF here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmada_tpu.core.vocab import tiny_layout
    from mmada_tpu.models import llada, motion_vq
    from mmada_tpu.models.mmada import MMadaModel
    from mmada_tpu.prompting.universal import (
        ByteTokenizer,
        SpecialIds,
        UniversalPrompting,
    )

    # -------------------------------------------------- model (tiny random)
    vocab = tiny_layout(
        text_vocab_size=300, image_codebook_size=16,
        motion_codebook_size=32, motion_special=2,
    )
    cfg = llada.tiny_config(vocab_size=vocab.total_vocab_size)
    cfg = dataclasses.replace(cfg, mask_token_id=vocab.mask_token_id)
    model = MMadaModel.init(jax.random.key(0), cfg, vocab)
    print(f"model: {model.cfg.n_layers}L d={model.cfg.d_model} "
          f"vocab={vocab.total_vocab_size} "
          f"(motion window {vocab.motion_codebook_size})")

    # --------------------------------------------------- prompt frame (t2m)
    sp = SpecialIds.from_vocab(vocab)
    prompting = UniversalPrompting(
        ByteTokenizer(), sp, max_text_len=24, cond_dropout_prob=0.0
    )
    masked = np.full((1, args.num_motion_tokens), vocab.mask_token_id, np.int64)
    input_ids, attn, _ = prompting(
        ([args.caption], masked, masked), "t2m", dropout=False
    )
    print(f"t2m frame: {input_ids.shape[1]} tokens "
          f"({args.num_motion_tokens} masked motion positions)")

    # ------------------------------------------------------------ denoise
    codes = model.t2m_generate(
        jnp.asarray(input_ids), attention_mask=jnp.asarray(attn),
        temperature=1.0, timesteps=args.timesteps,
        num_motion_tokens=args.num_motion_tokens, key=jax.random.key(7),
    )
    codes = np.asarray(codes)[0]
    print(f"VQ codes: {codes.tolist()}")

    # -------------------------------------------------- decode to features
    vq_cfg = dataclasses.replace(
        motion_vq.tiny_motion_cfg(),
        pose_dim=263, nb_code=vocab.motion_codebook_size,
    )
    vq_params = motion_vq.init_motion_vq(jax.random.key(1), vq_cfg)
    motion = motion_vq.decode(vq_params, vq_cfg, jnp.asarray(codes)[None])
    motion = np.asarray(motion)[0]  # (frames, 263) normalized HumanML3D
    print(f"decoded motion: {motion.shape[0]} frames x {motion.shape[1]} dims")

    # ------------------------------------------------------ visualization
    if args.gif:
        from mmada_tpu.eval.motion_math import recover_from_ric
        from mmada_tpu.eval.visualize import plot_3d_motion

        joints = np.asarray(
            recover_from_ric(motion.astype(np.float32), 22)
        )
        plot_3d_motion(joints, args.gif, title=args.caption)
        print(f"wrote {args.gif}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
