"""Collective-budget audit of the sharded programs' compiled HLO.

GSPMD inserts the collectives; this test pins down WHAT it inserted so a
sharding regression (a stray all-gather of the batch, an accidental
replicate-reshard, a lost reduce-scatter) fails CI instead of silently
multiplying ICI traffic at scale. Budgets are per-op-type counts over the
optimized HLO of (a) the sharded model forward and (b) the full multi-task
train step on the 8-virtual-device (2, 2, 2) mesh.

The layer loop is a `lax.scan`, so per-layer collectives appear ONCE in
the HLO (inside the while body) regardless of depth — budgets are
depth-independent.
"""

import dataclasses
import re

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.core.mesh import make_mesh
from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.parallel import sharding

VOCAB = tiny_layout(text_vocab_size=256, image_codebook_size=64)

# an op DEFINITION looks like `%name = f32[...] all-gather(...)`; operand
# references repeat the name, so match only the `= <shape> opcode(` form
COLLECTIVE_RE = re.compile(
    r"= [^=\n]*?\b(all-gather|all-reduce|reduce-scatter|all-to-all|"
    r"collective-permute)(?:-start)?\("
)


def collective_counts(hlo_text: str) -> dict:
    counts: dict[str, int] = {}
    for m in COLLECTIVE_RE.finditer(hlo_text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def build(mesh):
    cfg = llada.tiny_config(
        vocab_size=VOCAB.total_vocab_size, d_model=64, n_heads=8,
        n_layers=2, mlp_hidden_size=128,
    )
    cfg = dataclasses.replace(cfg, mask_token_id=VOCAB.mask_token_id)
    params = llada.init_params(jax.random.key(0), cfg)
    params = sharding.shard_params(params, sharding.llada_param_specs(cfg), mesh)
    return cfg, params


def test_forward_collective_budget():
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    cfg, params = build(mesh)
    model = MMadaModel(cfg=cfg, params=params, vocab=VOCAB, mesh=mesh)
    ids = jnp.zeros((8, 16), jnp.int32)
    compiled = jax.jit(lambda m, i: m.forward(i)).lower(model, ids).compile()
    hlo = compiled.as_text()

    assert "involuntary" not in hlo.lower()
    counts = collective_counts(hlo)
    total = sum(counts.values())
    # budget: embedding psum (row-sharded wte) + per-layer FSDP weight
    # all-gathers + head-sharded attention boundary + vocab-head psum.
    # Measured 12 at the time of writing; headroom for compiler drift,
    # but a runaway (per-token or per-position collective) blows past it.
    assert total <= 20, counts
    # FSDP must actually gather weights (not have everything replicated)
    assert counts.get("all-gather", 0) >= 1, counts


def test_train_step_collective_budget_and_reduce_scatter():
    from mmada_tpu.core.vocab import tiny_layout as tl
    from mmada_tpu.training import optimizers
    from mmada_tpu.training.train_step import StepConfig, TrainState, make_train_step

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    cfg, params = build(mesh)
    model = MMadaModel(cfg=cfg, params=params, vocab=VOCAB, mesh=mesh, remat=True)
    sc = StepConfig(batch_size_t2i=8, batch_size_lm=8, batch_size_mmu=8,
                    max_seq_length=8)
    n_img = 16
    l_total = sc.max_seq_length + 1 + n_img + 1
    rng = np.random.default_rng(0)
    shard = sharding.batch_sharding(mesh)

    def put(x):
        return jax.device_put(jnp.asarray(x), shard)

    ids = rng.integers(3, 250, size=(8, l_total))
    batch = {
        "t2i_input_ids": put(ids),
        "t2i_masks": put(np.ones((8, l_total), np.int64)),
        "lm_input_ids": put(ids),
        "lm_labels": put(ids),
        "mmu_input_ids": put(ids),
        "mmu_labels": put(ids),
        "mmu_prompt_masks": put(np.zeros((8, l_total), np.int64)),
    }
    opt = optimizers.adamw(1e-4, params_for_mask=params)
    state = TrainState.create(params, opt)
    compiled = jax.jit(make_train_step(model, opt, sc)).lower(
        state, batch, jax.random.key(0)
    ).compile()
    hlo = compiled.as_text()
    counts = collective_counts(hlo)
    total = sum(counts.values())
    # forward + backward + optimizer; measured 49 at the time of writing
    assert total <= 80, counts
    # the FSDP grad path must communicate (reduce-scatter or all-reduce)
    assert (
        counts.get("reduce-scatter", 0) + counts.get("all-reduce", 0) >= 1
    ), counts
