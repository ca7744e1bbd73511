"""Checkpoint manager tests: save/restore roundtrip, rotation, resume-latest,
and the safetensors export ↔ import inverse."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.checkpoints import manager
from mmada_tpu.checkpoints.hf_import import params_from_torch_state_dict
from mmada_tpu.models import llada
from mmada_tpu.training import optimizers
from mmada_tpu.training.train_step import TrainState


def tiny_state():
    cfg = llada.tiny_config(vocab_size=64, d_model=16, n_heads=2, n_layers=2,
                            mlp_hidden_size=32)
    params = llada.init_params(jax.random.key(0), cfg)
    opt = optimizers.adamw(1e-3, params_for_mask=params)
    return cfg, TrainState.create(params, opt)


def test_save_restore_roundtrip(tmp_path):
    cfg, state = tiny_state()
    mgr = manager.CheckpointManager(str(tmp_path / "out"))
    mgr.save(5, state)
    restored, step = mgr.restore(state)
    assert step == 5
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rotation_and_latest(tmp_path):
    cfg, state = tiny_state()
    mgr = manager.CheckpointManager(str(tmp_path / "out"), total_limit=2)
    for step in (10, 20, 30):
        mgr.save(step, state)
    ckpts = manager.list_checkpoints(str(tmp_path / "out"))
    assert [s for s, _ in ckpts] == [20, 30]
    assert manager.latest_checkpoint(str(tmp_path / "out")).endswith("checkpoint-30")
    _, step = mgr.restore(state)
    assert step == 30


def test_restore_empty_dir(tmp_path):
    cfg, state = tiny_state()
    mgr = manager.CheckpointManager(str(tmp_path / "empty"))
    restored, step = mgr.restore(state)
    assert restored is None and step == 0


def test_safetensors_export_import_inverse(tmp_path):
    cfg, state = tiny_state()
    path = str(tmp_path / "model.safetensors")
    manager.export_safetensors(path, state.params, cfg)

    from safetensors.numpy import load_file

    flat = load_file(path)
    again = params_from_torch_state_dict(flat, cfg)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(again)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_save_roundtrip_and_inflight_invisibility(tmp_path):
    """wait=False saves land on finalize(); a directory without
    metadata.json (in-flight/torn) is invisible to latest/restore."""
    from mmada_tpu.checkpoints.manager import (
        CheckpointManager,
        latest_checkpoint,
    )

    cfg, state = tiny_state()
    m = CheckpointManager(str(tmp_path), total_limit=2)
    m.save(1, state, wait=False)
    m.save(2, state, wait=False)  # finalizes save 1 first
    m.finalize()
    restored, step = m.restore(state)
    assert step == 2
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored)[0]),
        np.asarray(jax.tree.leaves(state)[0]),
    )

    # a torn checkpoint dir (no metadata.json) must not be resumable
    torn = tmp_path / "checkpoint-99"
    torn.mkdir()
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-2")
