"""MAGVIT-v2 tokenizer parity vs PyTorch reference goldens.

The LFQ is deterministic (sign + binary code), so VQ codes must match
bit-exactly; encoder latents and decoder reconstructions match to fp32 conv
tolerance. Goldens from tools/gen_goldens.py:golden_magvit (tiny VQGAN,
16px, z_channels=5 → 8×8 = 64 codes over a 32-code book).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.checkpoints.magvit_import import magvit2_params_from_torch
from mmada_tpu.models import magvit2

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def load():
    data = np.load(os.path.join(GOLDENS, "magvit_tiny.npz"))
    enc = {k[4:]: data[k] for k in data.files if k.startswith("we::")}
    dec = {k[4:]: data[k] for k in data.files if k.startswith("wd::")}
    rest = {k: data[k] for k in data.files if "::" not in k}
    cfg = magvit2.tiny_vqgan()
    params = magvit2_params_from_torch(enc, dec, cfg)
    return params, cfg, rest


def test_encoder_latent_parity():
    params, cfg, rest = load()
    pixels = jnp.asarray(rest["pixels"]).transpose(0, 2, 3, 1)  # NCHW->NHWC
    latents = magvit2.encoder_forward(params["encoder"], cfg, pixels)
    want = rest["latents"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(latents), want, atol=2e-4, rtol=1e-3)


def test_vq_codes_bit_exact():
    params, cfg, rest = load()
    pixels = jnp.asarray(rest["pixels"]).transpose(0, 2, 3, 1)
    codes = magvit2.get_code(params, cfg, pixels)
    np.testing.assert_array_equal(np.asarray(codes), rest["codes"])


def test_codebook_entry_parity():
    params, cfg, rest = load()
    z = magvit2.lfq_codebook_entry(jnp.asarray(rest["codes"]), cfg.z_channels)
    want = rest["z_entry"].transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(np.asarray(z), want)


def test_decode_parity():
    params, cfg, rest = load()
    recon = magvit2.decode_code(params, cfg, jnp.asarray(rest["codes"]))
    want = rest["recon"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(recon), want, atol=5e-4, rtol=1e-3)


def test_roundtrip_codes_stable():
    """decode(encode(x)) re-encodes to codes whose entries are fixed points
    of the quantizer: sign(z_entry) == z_entry."""
    params, cfg, rest = load()
    codes = jnp.asarray(rest["codes"])
    z = magvit2.lfq_codebook_entry(codes, cfg.z_channels)
    again = magvit2.lfq_indices(z, cfg.z_channels)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(codes))


def test_jit_end_to_end():
    params, cfg, rest = load()
    pixels = jnp.asarray(rest["pixels"]).transpose(0, 2, 3, 1)

    @jax.jit
    def roundtrip(px):
        codes = magvit2.get_code(params, cfg, px)
        return magvit2.decode_code(params, cfg, codes)

    out = roundtrip(pixels)
    assert out.shape == pixels.shape
