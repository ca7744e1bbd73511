"""Tensor-parallel (head-sharded) attention on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.core.mesh import make_mesh
from mmada_tpu.ops.attention import xla_attention
from mmada_tpu.parallel.tp_attention import tp_attention


@pytest.mark.parametrize("tensor", [4, 8])
def test_tp_matches_full_attention(rng, tensor):
    mesh = make_mesh(data=1, fsdp=8 // tensor, tensor=tensor)
    b, h, l, d = 2, 8, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    want = xla_attention(q, k, v)
    got = tp_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tp_gqa_and_bool_bias(rng):
    """GQA (groups stay device-local) + replicated (B,1,L,L) allowed-pairs
    bias shard correctly."""
    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    b, h, kvh, l, d = 2, 8, 4, 32, 16
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, kvh, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, kvh, l, d)), jnp.float32)
    bias = jnp.asarray(rng.random((b, 1, l, l)) > 0.2)
    # every query must attend somewhere or softmax degenerates
    bias = bias.at[:, :, :, 0].set(True)
    want = xla_attention(q, k, v, bias=bias)
    got = tp_attention(q, k, v, mesh, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tp_per_head_float_bias(rng):
    mesh = make_mesh(data=1, fsdp=1, tensor=8)
    b, h, l, d = 1, 8, 32, 16
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(b, h, l, l)), jnp.float32)
    want = xla_attention(q, k, v, bias=bias)
    got = tp_attention(q, k, v, mesh, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_tp_rejects_indivisible_heads(rng):
    mesh = make_mesh(data=1, fsdp=1, tensor=8)
    q = jnp.zeros((1, 6, 32, 16), jnp.float32)
    with pytest.raises(ValueError, match="divide"):
        tp_attention(q, q, q, mesh)


def test_auto_is_multichip_safe():
    """'auto' dispatch outside shard_map must not pick Pallas when more than
    one device is visible (pallas_call has no GSPMD partitioning rule)."""
    from mmada_tpu.ops.attention import _pallas_eligible

    q = jnp.zeros((1, 2, 256, 128), jnp.float32)
    assert jax.device_count() > 1
    assert not _pallas_eligible(q, q, None)
