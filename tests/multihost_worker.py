"""Worker process for tests/test_multihost.py.

Run as: python multihost_worker.py <proc_id> <num_procs> <port>

Real MULTI-PROCESS jax.distributed over the CPU (Gloo) backend — the
DCN-analog of the reference's 8-node static-rendezvous NCCL topology
(accelerate_configs/8_node_8_gpus_deepspeed_zero2.yaml, SURVEY §2.6
"comm backend"): two host processes with 4 local devices each form one
8-device global mesh; parameters shard over (fsdp, tensor), the batch over
data×fsdp with each host feeding only its local rows
(make_array_from_process_local_data), and GSPMD inserts the cross-process
collectives. The worker prints LOSS/GEN lines; the test asserts both
processes agree (the gradient all-reduce crossed the process boundary).
"""

import dataclasses
import os
import sys

proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from mmada_tpu.core.mesh import (  # noqa: E402
    initialize_distributed,
    make_mesh,
    process_local_batch_slice,
)
from mmada_tpu.core.vocab import tiny_layout  # noqa: E402
from mmada_tpu.models import llada  # noqa: E402
from mmada_tpu.models.mmada import MMadaModel  # noqa: E402
from mmada_tpu.parallel import sharding  # noqa: E402
from mmada_tpu.training import optimizers  # noqa: E402
from mmada_tpu.training.train_step import (  # noqa: E402
    StepConfig,
    TrainState,
    make_train_step,
)


def main():
    assert initialize_distributed(f"127.0.0.1:{port}", num_procs, proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    n_global = len(jax.devices())
    assert n_global == 4 * num_procs, n_global

    mesh = make_mesh(data=2, fsdp=n_global // 4, tensor=2,
                     devices=jax.devices())

    vocab = tiny_layout(text_vocab_size=256, image_codebook_size=64)
    cfg = llada.tiny_config(
        vocab_size=vocab.total_vocab_size, d_model=64, n_heads=4,
        n_layers=2, mlp_hidden_size=128,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=vocab.mask_token_id)
    # identical seed on every host: replicated init, then GSPMD-sharded
    params = llada.init_params(jax.random.key(0), cfg)
    params = sharding.shard_params(
        params, sharding.llada_param_specs(cfg), mesh
    )
    model = MMadaModel(cfg=cfg, params=params, vocab=vocab, mesh=mesh)

    bt = 8
    sc = StepConfig(batch_size_t2i=bt, batch_size_lm=bt, batch_size_mmu=bt,
                    max_seq_length=8)
    n_img = 16
    l_total = sc.max_seq_length + 1 + n_img + 1
    rng = np.random.default_rng(0)  # same global batch materialized per host
    t2i_ids = rng.integers(3, 250, size=(bt, l_total))
    t2i_ids[:, sc.max_seq_length + 1:-1] = (
        rng.integers(0, 64, size=(bt, n_img)) + vocab.image_offset
    )
    lm_ids = rng.integers(3, 250, size=(bt, l_total))
    mmu_ids = rng.integers(3, 250, size=(bt, l_total))
    mmu_prompt = np.zeros((bt, l_total), np.int64)
    mmu_prompt[:, :6] = 1

    batch_sharding = NamedSharding(mesh, P(("data", "fsdp"), None))
    local_rows = process_local_batch_slice(bt)

    def put(x):
        # each host contributes ONLY its local slice of the global batch
        return jax.make_array_from_process_local_data(
            batch_sharding, np.asarray(x)[local_rows], x.shape
        )

    batch = {
        "t2i_input_ids": put(t2i_ids),
        "t2i_masks": put(np.ones((bt, l_total), np.int64)),
        "lm_input_ids": put(lm_ids),
        "lm_labels": put(lm_ids),
        "mmu_input_ids": put(mmu_ids),
        "mmu_labels": put(np.where(mmu_prompt == 1, -100, mmu_ids)),
        "mmu_prompt_masks": put(mmu_prompt),
    }

    opt = optimizers.adamw(1e-4, params_for_mask=params)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(model, opt, sc))
    state, metrics = step(state, batch, jax.random.key(0))
    # loss is replicated: every process reads the same all-reduced value
    loss = float(metrics["loss"])
    grad_norm = float(metrics["grad_norm"])
    assert np.isfinite(loss)
    print(f"LOSS {loss:.6f} GRADNORM {grad_norm:.6f}", flush=True)

    # sharded serving across hosts: semi-AR generate on the same mesh
    prompt_global = rng.integers(3, 250, size=(bt, 8)).astype(np.int32)
    prompt = jax.make_array_from_process_local_data(
        batch_sharding, prompt_global[local_rows], prompt_global.shape
    )
    out = jax.jit(
        lambda m, p: m.generate(p, gen_length=8, steps=4, block_length=4)
    )(model, prompt)
    gathered = multihost_utils.process_allgather(out, tiled=True)
    gen = np.asarray(gathered)  # (bt, P+gen) global result on every host
    assert not (gen[:, 8:] == vocab.mask_token_id).any(), "masks left"
    print(f"GEN {int(gen.sum())}", flush=True)
    print("MULTIHOST_WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
