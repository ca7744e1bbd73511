"""Motion VQ-VAE parity and training-path tests."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# quantizer variant goldens (quantize_cnn.py:6-413, all four codebooks)
# ---------------------------------------------------------------------------

def _load_quantizer_goldens():
    import pathlib
    path = pathlib.Path(__file__).parent / "goldens" / "motion_quantizers.npz"
    return dict(np.load(path))


def _nct_to_flat(x):
    # reference preprocess: NCT -> NTC -> (N*T, C) (quantize_cnn.py:75-79)
    return jnp.asarray(np.transpose(x, (0, 2, 1)).reshape(-1, x.shape[1]))


@pytest.mark.parametrize("variant", ["ema_reset", "ema", "reset"])
def test_quantizer_variant_golden(variant):
    """Two training steps (init+update, then steady-state update) match the
    torch reference bit-close. The golden batch has N*T >= nb_code so
    seeding is the deterministic no-noise branch."""
    g = _load_quantizer_goldens()
    nb_code, code_dim = g[f"{variant}::codebook1"].shape
    cfg = dataclasses.replace(
        motion_vq.tiny_motion_cfg(), nb_code=nb_code, code_dim=code_dim,
        quantizer=variant,
    )
    codebook = (
        jnp.zeros((nb_code, code_dim))
        if variant != "reset"
        # QuantizeReset inits as randn, but the first training step replaces
        # it with batch seeds before quantizing, so any value works
        else jnp.ones((nb_code, code_dim))
    )
    state = motion_vq.CodebookState.create(cfg)
    key = jax.random.key(0)

    for step, xname in ((1, "x1"), (2, "x2")):
        x_flat = _nct_to_flat(g[xname])
        z_q, codes, codebook, state, ppl = motion_vq.quantizer_forward(
            key, codebook, state, x_flat, cfg
        )
        commit = jnp.mean(jnp.square(x_flat - z_q))
        n, c, t = g[xname].shape
        xd_ref = np.transpose(
            np.asarray(z_q).reshape(n, t, c), (0, 2, 1)
        )  # back to NCT like the reference output
        np.testing.assert_allclose(
            xd_ref, g[f"{variant}::xd{step}"], atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            float(commit), g[f"{variant}::commit{step}"], atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            float(ppl), g[f"{variant}::ppl{step}"], atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(codebook), g[f"{variant}::codebook{step}"],
            atol=1e-5, rtol=1e-5,
        )


def test_gradient_quantizer_golden():
    """`Quantizer` (optimizer-trained codebook) forward parity: z_q, the
    two-term VQ loss, and perplexity with the torch embedding weights."""
    g = _load_quantizer_goldens()
    codebook = jnp.asarray(g["gradient::embedding"])
    x_flat = _nct_to_flat(g["x1"])
    z_q, loss, ppl, codes = motion_vq.gradient_quantizer_losses(
        codebook, x_flat, beta=1.0
    )
    n, c, t = g["x1"].shape
    zq_nct = np.transpose(np.asarray(z_q).reshape(n, t, c), (0, 2, 1))
    np.testing.assert_allclose(zq_nct, g["gradient::zq"], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(loss), g["gradient::loss"], atol=1e-6)
    np.testing.assert_allclose(float(ppl), g["gradient::ppl"], atol=1e-4)


@pytest.mark.parametrize("variant", ["ema_reset", "ema", "reset", "gradient"])
def test_forward_train_all_variants(variant):
    """forward_train runs jitted for every quantizer config and returns
    finite losses."""
    cfg = dataclasses.replace(motion_vq.tiny_motion_cfg(), quantizer=variant)
    params = motion_vq.init_motion_vq(jax.random.key(0), cfg)
    state = motion_vq.CodebookState.create(cfg)
    motion = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, cfg.pose_dim))
        .astype(np.float32)
    )

    @jax.jit
    def run(params, state, motion, key):
        return motion_vq.forward_train(key, params, state, cfg, motion)

    recon, commit, ppl, new_cb, new_state = run(
        params, state, motion, jax.random.key(1)
    )
    assert recon.shape == motion.shape
    assert np.isfinite(float(commit)) and np.isfinite(float(ppl))
    if variant == "gradient":
        np.testing.assert_array_equal(
            np.asarray(new_cb), np.asarray(params["codebook"])
        )
    else:
        assert not np.array_equal(
            np.asarray(new_cb), np.asarray(params["codebook"])
        )
