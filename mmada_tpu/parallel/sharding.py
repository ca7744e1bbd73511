"""GSPMD sharding rules for the LLaDA backbone over a (data, fsdp, tensor) mesh.

The reference's only distribution strategy is DeepSpeed ZeRO data
parallelism (accelerate_configs/*.yaml). TPU-native we express everything as
PartitionSpecs and let GSPMD insert the collectives:

  * FSDP axis shards every weight's largest non-contracting-output dim —
    the ZeRO-3 analog; XLA all-gathers weights per layer and
    reduce-scatters grads over ICI.
  * Tensor axis shards attention heads and MLP hidden — megatron-style TP
    for serving 8B on small slices (SURVEY.md §2.6: required to fit 8B
    on a single v5e host: 8B bf16 ≈ 16.2 GB > 16 GB HBM/chip).
  * Batch shards over (data × fsdp) jointly for activations.

Specs are written against the layer-stacked param pytree of
models/llada.py (leading axis = n_layers, never sharded).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmada_tpu.core.mesh import DATA_AXIS, FSDP_AXIS, TENSOR_AXIS
from mmada_tpu.models.llada import LLaDAConfig


def llada_param_specs(cfg: LLaDAConfig) -> Any:
    """Pytree of PartitionSpec matching `llada.init_params` output."""
    block_specs = {
        "attn_norm": P(None, None),
        "ff_norm": P(None, None),
        "attn_out": P(None, TENSOR_AXIS, FSDP_AXIS),
        "ff_out": P(None, TENSOR_AXIS, FSDP_AXIS),
    }
    if cfg.block_type == "llama":
        block_specs.update(
            q_proj=P(None, FSDP_AXIS, TENSOR_AXIS),
            k_proj=P(None, FSDP_AXIS, TENSOR_AXIS),
            v_proj=P(None, FSDP_AXIS, TENSOR_AXIS),
            ff_proj=P(None, FSDP_AXIS, TENSOR_AXIS),
            up_proj=P(None, FSDP_AXIS, TENSOR_AXIS),
        )
        if cfg.include_bias or cfg.include_qkv_bias:
            block_specs.update(
                q_bias=P(None, TENSOR_AXIS),
                k_bias=P(None, TENSOR_AXIS),
                v_bias=P(None, TENSOR_AXIS),
            )
    else:
        block_specs.update(
            att_proj=P(None, FSDP_AXIS, TENSOR_AXIS),
            ff_proj=P(None, FSDP_AXIS, TENSOR_AXIS),
        )
        if cfg.include_bias or cfg.include_qkv_bias:
            block_specs["att_proj_bias"] = P(None, TENSOR_AXIS)
    if cfg.attention_layer_norm:
        block_specs["q_norm"] = P(None, None)
        block_specs["k_norm"] = P(None, None)

    specs = {
        # vocab-row sharding (megatron embedding): GSPMD lowers the lookup
        # to a masked local gather + psum, and the activation comes out
        # ready to batch-shard. Sharding d instead (the old layout) made
        # every lookup emit a d-sharded activation whose reshard to
        # batch-sharded hit SPMD's "involuntary full rematerialization"
        # fallback. Rows split over fsdp*tensor: 134,656x4096 bf16 is
        # ~138 MB/device on 8 devices.
        "wte": P((FSDP_AXIS, TENSOR_AXIS), None),
        "ln_f": P(None),
        "blocks": block_specs,
    }
    if not cfg.weight_tying:
        specs["ff_out"] = P(FSDP_AXIS, TENSOR_AXIS)
    return specs


def shard_params(params: Any, specs: Any, mesh: Mesh) -> Any:
    """Place a param pytree on the mesh with the given specs. Dims not
    divisible by their axis size fall back to replication on that dim.
    Quantized leaves (ops/quantization) shard their int8 values with the
    weight's spec; the tiny scale vectors replicate."""
    from mmada_tpu.ops.quantization import (
        Int4Tensor, QuantizedTensor, W8A8Tensor,
    )

    def place(param, spec):
        if isinstance(param, (QuantizedTensor, W8A8Tensor)):
            vspec = _divisibility_fallback(param.values.shape, spec, mesh)
            return type(param)(
                values=jax.device_put(param.values, NamedSharding(mesh, vspec)),
                scales=jax.device_put(param.scales, NamedSharding(mesh, P())),
            )
        if isinstance(param, Int4Tensor):
            # packed (.., K/2, N) shards on the same spec (nibble packing
            # is within-group, group 128 ≫ any axis size here); scales
            # replicate like the int8 scale vectors
            vspec = _divisibility_fallback(param.packed.shape, spec, mesh)
            return Int4Tensor(
                packed=jax.device_put(param.packed, NamedSharding(mesh, vspec)),
                scales=jax.device_put(param.scales, NamedSharding(mesh, P())),
            )
        fixed = _divisibility_fallback(param.shape, spec, mesh)
        return jax.device_put(param, NamedSharding(mesh, fixed))

    return jax.tree.map(
        place, params, specs,
        is_leaf=lambda x: _is_quantized_leaf(x),
    )


def abstract_shard_params(shapes: Any, specs: Any, mesh: Mesh) -> Any:
    """ShapeDtypeStruct analog of `shard_params` for AOT compilation
    (tools/project_v5e8.py): attach NamedShardings to an eval_shape tree
    with the same quantized-leaf rules (values take the weight's spec,
    scales replicate) instead of device_put-ing real arrays."""
    from mmada_tpu.ops.quantization import (
        Int4Tensor, QuantizedTensor, W8A8Tensor,
    )

    def sds(s, spec):
        return jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, spec))

    def place(leaf, spec):
        if isinstance(leaf, (QuantizedTensor, W8A8Tensor)):
            vspec = _divisibility_fallback(leaf.values.shape, spec, mesh)
            return type(leaf)(values=sds(leaf.values, vspec),
                              scales=sds(leaf.scales, P()))
        if isinstance(leaf, Int4Tensor):
            vspec = _divisibility_fallback(leaf.packed.shape, spec, mesh)
            return Int4Tensor(packed=sds(leaf.packed, vspec),
                              scales=sds(leaf.scales, P()))
        return sds(leaf, _divisibility_fallback(leaf.shape, spec, mesh))

    return jax.tree.map(place, shapes, specs, is_leaf=_is_quantized_leaf)


def _is_quantized_leaf(x) -> bool:
    from mmada_tpu.ops.quantization import is_quantized

    return is_quantized(x)


def _axis_size(mesh: Mesh, axis) -> int:
    if axis is None:
        return 1
    if isinstance(axis, (tuple, list)):
        return int(np.prod([mesh.shape[a] for a in axis]))
    return mesh.shape[axis]


def _divisibility_fallback(shape, spec: P, mesh: Mesh) -> P:
    fixed = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is not None and dim % _axis_size(mesh, axis) != 0:
            fixed.append(None)
        else:
            fixed.append(axis)
    return P(*fixed)


def param_shardings(cfg: LLaDAConfig, params: Any, mesh: Mesh) -> Any:
    """NamedShardings (with divisibility fallback) for jit in_shardings."""
    specs = llada_param_specs(cfg)
    return jax.tree.map(
        lambda p, s: NamedSharding(mesh, _divisibility_fallback(p.shape, s, mesh)),
        params, specs,
    )


def batch_spec() -> P:
    return P((DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
