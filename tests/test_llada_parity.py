"""Numerical parity of the JAX LLaDA backbone vs PyTorch reference goldens.

Fixtures in tests/goldens/*.npz are produced by tools/gen_goldens.py from
tiny randomly-initialized reference models (/root/reference). Forward logits
must match elementwise in fp32.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from mmada_tpu.checkpoints.hf_import import params_from_torch_state_dict
from mmada_tpu.models import llada

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")

TINY = dict(
    d_model=64,
    n_heads=4,
    n_layers=2,
    mlp_hidden_size=128,
    vocab_size=96,
    max_sequence_length=128,
    rope_theta=10000.0,
)


def load_golden(name):
    data = np.load(os.path.join(GOLDENS, f"{name}.npz"))
    state = {
        k[len("w::"):]: data[k] for k in data.files if k.startswith("w::")
    }
    rest = {k: data[k] for k in data.files if not k.startswith("w::")}
    return state, rest


def make_cfg(**over):
    base = dict(TINY)
    base.update(over)
    return llada.LLaDAConfig(
        embedding_size=base["vocab_size"], mask_token_id=90, **base
    )


@pytest.mark.parametrize(
    "tag,cfg_kwargs",
    [
        ("mha", {}),
        ("gqa", {"n_kv_heads": 2}),
        ("seq", {"block_type": "sequential", "weight_tying": True}),
    ],
)
def test_forward_parity(tag, cfg_kwargs):
    state, rest = load_golden(f"forward_{tag}")
    cfg = make_cfg(**cfg_kwargs)
    params = params_from_torch_state_dict(state, cfg)

    logits = llada.forward(params, cfg, jnp.asarray(rest["input_ids"]))
    np.testing.assert_allclose(
        np.asarray(logits), rest["logits"], atol=2e-4, rtol=1e-3
    )


def test_forward_parity_with_attention_mask():
    """The reference IGNORES attention masks in attention (SDPA is called
    with attn_mask=None, modeling_llada.py:652-660) — its masked and
    unmasked logits are bit-identical. Default config replicates that."""
    state, rest = load_golden("forward_mha")
    np.testing.assert_array_equal(rest["logits"], rest["logits_masked"])

    cfg = make_cfg()
    params = params_from_torch_state_dict(state, cfg)
    logits = llada.forward(
        params,
        cfg,
        jnp.asarray(rest["input_ids"]),
        attention_mask=jnp.asarray(rest["attention_mask"]),
    )
    np.testing.assert_allclose(
        np.asarray(logits), rest["logits_masked"], atol=2e-4, rtol=1e-3
    )


def test_attention_bias_enabled_isolates_pads():
    """With attention_bias_enabled=True (our fixed semantics), masked pad
    positions cannot influence valid positions."""
    import dataclasses

    state, rest = load_golden("forward_mha")
    cfg = dataclasses.replace(make_cfg(), attention_bias_enabled=True)
    params = params_from_torch_state_dict(state, cfg)

    ids = np.asarray(rest["input_ids"]).copy()
    mask = np.asarray(rest["attention_mask"])
    out1 = llada.forward(
        params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )
    ids2 = ids.copy()
    ids2[0, :4] = (ids2[0, :4] + 7) % 90  # perturb only padded positions
    out2 = llada.forward(
        params, cfg, jnp.asarray(ids2), attention_mask=jnp.asarray(mask)
    )
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(out1)[valid], np.asarray(out2)[valid], atol=1e-5
    )
    # and the flag actually changes results vs the faithful default
    cfg_off = make_cfg()
    out_off = llada.forward(
        params, cfg_off, jnp.asarray(ids), attention_mask=jnp.asarray(mask)
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out_off))


def test_param_count_tiny():
    state, _ = load_golden("forward_mha")
    cfg = make_cfg()
    params = params_from_torch_state_dict(state, cfg)
    torch_total = sum(v.size for v in state.values())
    assert llada.param_count(params) == torch_total


def test_rope_half_precision_variant():
    """rope_full_precision=False applies rotary math in the compute dtype;
    results track the fp32 path closely at fp32 inputs."""
    import dataclasses

    state, rest = load_golden("forward_mha")
    cfg = make_cfg()
    params = params_from_torch_state_dict(state, cfg)
    cfg_half = dataclasses.replace(cfg, rope_full_precision=False)
    a = llada.forward(params, cfg, jnp.asarray(rest["input_ids"]))
    b = llada.forward(params, cfg_half, jnp.asarray(rest["input_ids"]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gemma_rms_variant():
    """gemma_rms computes x*(1+w): with w=1 it doubles the rms-normed
    activations vs layer weight semantics."""
    import dataclasses

    from mmada_tpu.ops.norms import rms_norm

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8)).astype(np.float32))
    w = jnp.full((8,), 0.5)
    plain = rms_norm(x, w)
    gemma = rms_norm(x, w, gemma_style=True)
    base = rms_norm(x, None)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(base) * 0.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gemma), np.asarray(base) * 1.5, rtol=1e-6)


def test_scale_logits_and_input_emb_norm():
    import dataclasses
    import math

    state, rest = load_golden("forward_mha")
    cfg = make_cfg()
    params = params_from_torch_state_dict(state, cfg)
    ids = jnp.asarray(rest["input_ids"])
    base = llada.forward(params, cfg, ids)
    scaled = llada.forward(
        params, dataclasses.replace(cfg, scale_logits=True), ids
    )
    np.testing.assert_allclose(
        np.asarray(scaled), np.asarray(base) / math.sqrt(cfg.d_model),
        rtol=1e-5,
    )
    embn = llada.forward(
        params, dataclasses.replace(cfg, input_emb_norm=True), ids
    )
    assert not np.allclose(np.asarray(embn), np.asarray(base))
