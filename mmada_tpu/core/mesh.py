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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host initialization (`jax.distributed.initialize`) — the
    NCCL/static-rendezvous analog of the reference's
    accelerate_configs/8_node_8_gpus_*.yaml topology. On Cloud TPU slices
    arguments come from the runtime metadata; returns False when already
    initialized or single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError):
        return False


def process_local_batch_slice(global_batch: int) -> slice:
    """Each host feeds its shard of the global batch
    (`jax.make_array_from_process_local_data` pairing)."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, fsdp=1, tensor=1, devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: batch dim sharded over data+fsdp (both act as data parallel
    for activations), everything else replicated."""
    return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
