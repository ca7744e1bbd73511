"""Device-mesh construction for ICI/DCN parallelism.

The reference distributes only via data parallelism (HF Accelerate +
DeepSpeed ZeRO, accelerate_configs/*.yaml). TPU-native we use one logical
mesh with three axes and let GSPMD insert all collectives:

  * ``data``   — batch sharding across slices/hosts (rides DCN when multi-slice)
  * ``fsdp``   — parameter/optimizer sharding (ZeRO-3 analog, rides ICI)
  * ``tensor`` — tensor parallelism for attention heads / MLP hidden (ICI)

Most configs collapse unused axes to size 1; an 8-chip v5e slice training the
8B model typically runs (data=1, fsdp=8, tensor=1) and serving runs
(data=2, fsdp=1, tensor=4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)


def make_mesh(
    data: int = 1,
    fsdp: int = -1,
    tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, fsdp, tensor) mesh. One axis may be -1 (inferred)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = [data, fsdp, tensor]
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, MESH_AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, fsdp=1, tensor=1, devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: batch dim sharded over data+fsdp (both act as data parallel
    for activations), everything else replicated."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
