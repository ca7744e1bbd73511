"""On-chip motion-family training soak + generation eval.

Round 3 trained the 165M multimodal proxy on hardware (PROXY_TRAIN_r03);
this tool extends the hardware soak to the MOTION family end-to-end
through the PRODUCTION entry points (reference counterparts:
scripts/train_motion_vq.sh + training/train_t2m.py, which need HumanML3D
— unavailable in this zero-egress environment):

  1. vq_train  — subprocess `train_motion_vq.py` on the learnable
                 deterministic clip bank (data/synthetic.motion_clip) at
                 the configured flagship-size VQ (512x512 codebook).
  2. tokenize  — encode each clip with the trained VQ (motion_vq.encode),
                 pad MotionTokenDataset-style (codes, EOM, PAD...), write
                 token_bank.npz.
  3. t2m_train — subprocess `train.py` task=t2m on the bank: caption ->
                 fixed code sequence (memorizable), full-parameter
                 training of the proxy-sized LLaDA over the fused motion
                 vocab window.
  4. eval      — greedy t2m_generate on every bank caption: token
                 accuracy vs the bank and decoded-motion MSE vs the
                 original clips (through the trained VQ decoder).

    python tools/motion_soak.py [vq_steps=1500] [t2m_steps=3000]
        [config=configs/motion_soak.yaml] [out=MOTION_SOAK_r03.json]
        [workdir=motion-soak]
"""

import json
import logging
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

logger = logging.getLogger("motion_soak")


def _run(cmd):
    logger.info("$ %s", " ".join(cmd))
    t0 = time.time()
    r = subprocess.run(cmd, cwd=os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".."))
    if r.returncode != 0:
        raise RuntimeError(f"stage failed ({r.returncode}): {' '.join(cmd)}")
    return round(time.time() - t0, 1)


def main(argv):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    cfg_path = args.get("config", "configs/motion_soak.yaml")
    vq_steps = int(args.get("vq_steps", 1500))
    t2m_steps = int(args.get("t2m_steps", 3000))
    out_path = args.get("out", "MOTION_SOAK_r03.json")
    workdir = args.get("workdir", "motion-soak")
    report = {"config": cfg_path, "stages": {}}

    resume = args.get("resume") == "1"

    # ------------------------------------------------------- 1. VQ train
    vq_dir = f"{workdir}/vq"
    if resume and os.path.isdir(vq_dir):
        secs = 0.0
    else:
        secs = _run([
        sys.executable, "train_motion_vq.py", f"config={cfg_path}",
        f"training.max_train_steps={vq_steps}",
            f"experiment.output_dir={vq_dir}",
        ])
    report["stages"]["vq_train"] = {"steps": vq_steps, "seconds": secs,
                                    "output_dir": vq_dir}

    # ------------------------------------------------------- 2. tokenize
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmada_tpu.checkpoints.manager import CheckpointManager
    from mmada_tpu.core.config import load_config
    from mmada_tpu.data import synthetic
    from mmada_tpu.models import motion_vq

    cfg = load_config(cfg_path)
    mraw = cfg.get_path("model.motion_vq_model", {})
    mcfg = motion_vq.MotionVQConfig(
        nb_code=mraw.get("nb_code", 512), code_dim=mraw.get("code_dim", 512),
        down_t=mraw.get("down_t", 2), mu=mraw.get("mu", 0.99),
        quantizer=mraw.get("quantizer", "ema_reset"),
    )
    template = motion_vq.init_motion_vq(jax.random.key(0), mcfg)
    vq_params, _ = CheckpointManager(vq_dir).restore(template)
    assert vq_params is not None, f"no VQ checkpoint in {vq_dir}"
    n_clips = int(cfg.get_path("dataset.n_patterns", 48))
    n_motion = int(cfg.get_path("dataset.max_motion_length", 55))
    window = int(cfg.get_path("dataset.window_size", 64))
    clip_len = 3 * window
    clips = np.stack([
        synthetic.motion_clip(k, length=clip_len, pose_dim=mcfg.pose_dim)
        for k in range(n_clips)
    ])
    codes = np.asarray(motion_vq.encode(vq_params, mcfg, jnp.asarray(clips)))
    eom, pad = mcfg.nb_code, mcfg.nb_code + 1
    m_len = codes.shape[1]
    assert m_len + 1 <= n_motion, (m_len, n_motion)
    padded = np.concatenate([
        codes,
        np.full((n_clips, 1), eom),
        np.full((n_clips, n_motion - 1 - m_len), pad),
    ], axis=1).astype(np.int64)
    caps = [synthetic.motion_caption(k) for k in range(n_clips)]
    bank_path = f"{workdir}/token_bank.npz"
    np.savez(bank_path, captions=np.asarray(caps), tokens=padded,
             lengths=np.full(n_clips, m_len))
    uniq = len({tuple(r) for r in codes.tolist()})
    report["stages"]["tokenize"] = {
        "clips": n_clips, "codes_per_clip": int(m_len),
        "distinct_code_sequences": uniq, "bank": bank_path,
    }
    logger.info("tokenized %d clips -> %d codes each (%d distinct seqs)",
                n_clips, m_len, uniq)

    # ------------------------------------------------------ 3. t2m train
    t2m_dir = f"{workdir}/t2m"
    if resume and os.path.exists(f"{t2m_dir}/metrics.jsonl"):
        secs = 0.0
    else:
        secs = _run([
        sys.executable, "train.py", f"config={cfg_path}",
        f"dataset.token_bank={bank_path}",
        f"training.max_train_steps={t2m_steps}",
            f"experiment.output_dir={t2m_dir}",
        ])
    tail = {}
    with open(f"{t2m_dir}/metrics.jsonl") as f:
        for line in f:
            tail = json.loads(line)
    report["stages"]["t2m_train"] = {"steps": t2m_steps, "seconds": secs,
                                     "final_metrics": tail}

    # ------------------------------------------------------------ 4. eval
    from mmada_tpu.serve.loader import (
        build_model, build_prompting, build_text_tokenizer, build_vocab,
    )
    from mmada_tpu.training import optimizers
    from mmada_tpu.training.train_step import TrainState

    tokenizer = build_text_tokenizer(cfg)
    vocab = build_vocab(cfg)
    if vocab.motion_codebook_size == 0:
        vocab = vocab.with_motion(
            cfg.get_path("model.mmada.motion_vocab_size", 512)
        )
    prompting = build_prompting(cfg, tokenizer, vocab)
    model = build_model(cfg, vocab)
    # the optimizer must match the t2m trainer's construction exactly or
    # the TrainState template's opt-state STRUCTURE won't restore
    from mmada_tpu.training.lr_schedules import from_config as lr_from_config

    lr = lr_from_config(cfg.get_path("lr_scheduler", {}),
                        total_steps=t2m_steps)
    opt = optimizers.adamw(lr, params_for_mask=model.params)
    state, _ = CheckpointManager(t2m_dir).restore(
        TrainState.create(model.params, opt)
    )
    assert state is not None, f"no t2m checkpoint in {t2m_dir}" 
    import dataclasses

    model = dataclasses.replace(model, params=state.params)

    masked = np.full((n_clips, n_motion), vocab.mask_token_id, np.int64)
    ids, attn, _ = prompting((caps, masked, masked), "t2m", dropout=False)
    gen = np.asarray(model.t2m_generate(
        jnp.asarray(ids), attention_mask=jnp.asarray(attn),
        temperature=0.0, greedy=True, timesteps=18,
        num_motion_tokens=n_motion, key=jax.random.key(0),
    ))
    # `gen` holds raw codebook ids: the sampler's logit window is the
    # motion CODEBOOK only (models/mmada.py t2m_generate) — EOM/PAD rows
    # are dataset-side framing the sampler cannot emit by design, so the
    # gate judges the code span; the padded-row accuracy is recorded as
    # an FYI (its tail positions are structurally unreachable).
    token_acc = float((gen == padded).mean())
    code_acc = float((gen[:, :m_len] == codes).mean())

    # fast-decode arms, truth-anchored on the SAME code bank (the t2m
    # family row of the per-family gate, BASELINE.md round-3t; t2m is
    # MaskGIT-style so parallel_threshold does not apply): promote an
    # arm iff its code accuracy is within 0.01 of exact's
    fast_arms = {}
    for arm_name, arm_kw in (
        ("kv_cache", dict(block_kv_cache=True)),
        ("kv_refresh2", dict(block_kv_cache=True, cache_refresh_every=2)),
    ):
        agen = np.asarray(model.t2m_generate(
            jnp.asarray(ids), attention_mask=jnp.asarray(attn),
            temperature=0.0, greedy=True, timesteps=18,
            num_motion_tokens=n_motion, key=jax.random.key(0), **arm_kw,
        ))
        acc = float((agen[:, :m_len] == codes).mean())
        fast_arms[arm_name] = {
            "code_accuracy": round(acc, 4),
            "promote": bool(acc >= code_acc - 0.01),
        }
        logger.info("t2m fast arm %s: code_acc %.4f promote=%s",
                    arm_name, acc, fast_arms[arm_name]["promote"])

    # decode generated codes (clipped into the codebook) back to motion
    # and compare against the ORIGINAL clips — the full-pipeline metric
    dec = np.asarray(motion_vq.decode(
        vq_params, mcfg, jnp.asarray(np.clip(gen[:, :m_len], 0,
                                             mcfg.nb_code - 1))
    ))
    ref = np.asarray(motion_vq.decode(vq_params, mcfg, jnp.asarray(codes)))
    gen_mse = float(((dec - clips[:, :dec.shape[1]]) ** 2).mean())
    vq_recon_mse = float(((ref - clips[:, :ref.shape[1]]) ** 2).mean())
    clip_var = float(clips.var())
    report["stages"]["eval"] = {
        "token_accuracy_incl_eom_pad": round(token_acc, 4),
        "code_accuracy": round(code_acc, 4),
        "decoded_motion_mse_vs_clip": round(gen_mse, 5),
        "vq_recon_mse_vs_clip": round(vq_recon_mse, 5),
        "clip_variance": round(clip_var, 5),
        "fast_arms": fast_arms,
    }
    report["ok"] = bool(code_acc > 0.9 and vq_recon_mse < 0.5 * clip_var
                        and gen_mse < 0.5 * clip_var)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"ok": report["ok"], **report["stages"]["eval"]}))
    logger.info("wrote %s", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
