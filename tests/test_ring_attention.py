"""Ring attention correctness on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_tpu.core.mesh import make_mesh
from mmada_tpu.ops.attention import xla_attention
from mmada_tpu.parallel.ring_attention import ring_attention


@pytest.mark.parametrize("mesh_shape,axis", [
    ((1, 8, 1), "fsdp"),
    ((1, 4, 2), "fsdp"),
])
def test_ring_matches_full_attention(rng, mesh_shape, axis):
    data, fsdp, tensor = mesh_shape
    mesh = make_mesh(data=data, fsdp=fsdp, tensor=tensor)
    b, h, l, d = 2, 4, 64 * mesh.shape[axis], 32
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32)

    want = xla_attention(q, k, v)
    got = ring_attention(q, k, v, mesh, axis_name=axis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_bf16(rng):
    mesh = make_mesh(data=1, fsdp=8, tensor=1)
    b, h, l, d = 1, 2, 8 * 32, 32
    q = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.bfloat16)
    want = xla_attention(q, k, v)
    got = ring_attention(q, k, v, mesh)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_ring_inside_jit_with_sharded_inputs(rng):
    """The intended usage: jit over sequence-sharded arrays."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=1, fsdp=8, tensor=1)
    b, h, l, d = 1, 2, 512, 32
    spec = NamedSharding(mesh, P(None, None, "fsdp", None))
    q = jax.device_put(jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32), spec)
    k = jax.device_put(jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32), spec)
    v = jax.device_put(jnp.asarray(rng.normal(size=(b, h, l, d)), jnp.float32), spec)

    fn = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))
    got = fn(q, k, v)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
