"""Pre-tokenize raw motion features into VQ code files.

Equivalent of the reference's `dataset_tokenize` flow (dataset/
dataset_tokenize.py): encode every `new_joint_vecs/{name}.npy` through the
trained motion VQ-VAE and write `{out_name}/{name}.npy` code sequences that
`MotionTokenDataset` consumes.

    python tools/tokenize_motions.py config=configs/t2m_instruct.yaml \
        dataset.split_file=data/HumanML3D/train.txt out_name=VQVAE_tokens
"""

import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logger = logging.getLogger(__name__)


def main(argv):
    logging.basicConfig(level=logging.INFO)
    import jax
    import jax.numpy as jnp

    from mmada_tpu.core.config import load_config
    from mmada_tpu.checkpoints.manager import load_params_only
    from mmada_tpu.models import motion_vq

    cfg = load_config(cli_args=argv)
    root = cfg.get_path("dataset.motion_root")
    split_file = cfg.get_path("dataset.split_file")
    out_name = cfg.get("out_name", "VQVAE_tokens")

    mcfg_raw = cfg.get_path("model.motion_vq_model", {})
    mcfg = motion_vq.MotionVQConfig(
        pose_dim=mcfg_raw.get("pose_dim", 263),
        code_dim=mcfg_raw.get("code_dim", 512),
        nb_code=mcfg_raw.get("nb_code", 512),
        width=mcfg_raw.get("width", 512),
        down_t=mcfg_raw.get("down_t", 2),
        depth=mcfg_raw.get("depth", 3),
        dilation_growth_rate=mcfg_raw.get("dilation_growth_rate", 3),
    )
    ckpt_path = mcfg_raw.get("pretrained_path")
    template = motion_vq.init_motion_vq(jax.random.key(0), mcfg)
    if ckpt_path and os.path.exists(ckpt_path):
        params = load_params_only(ckpt_path, template)
    else:
        logger.warning("no VQ checkpoint at %s; using random init", ckpt_path)
        params = template

    mean_path = os.path.join(root, "Mean.npy")
    std_path = os.path.join(root, "Std.npy")
    mean = np.load(mean_path) if os.path.exists(mean_path) else None
    std = np.load(std_path) if os.path.exists(std_path) else None

    encode = jax.jit(lambda m: motion_vq.encode(params, mcfg, m))

    out_dir = os.path.join(root, out_name)
    os.makedirs(out_dir, exist_ok=True)
    names = [ln.strip() for ln in open(split_file) if ln.strip()]
    n_done = 0
    for name in names:
        try:
            m = np.load(os.path.join(root, "new_joint_vecs", f"{name}.npy"))
            if mean is not None and std is not None:
                m = (m - mean) / (std + 1e-8)
            stride = 2 ** mcfg.down_t
            t = (m.shape[0] // stride) * stride
            if t < stride:
                continue
            codes = encode(jnp.asarray(m[None, :t], jnp.float32))
            np.save(os.path.join(out_dir, f"{name}.npy"), np.asarray(codes[0]))
            n_done += 1
        except Exception as e:
            logger.warning("skip %s: %s", name, e)
    logger.info("tokenized %d/%d motions into %s", n_done, len(names), out_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
