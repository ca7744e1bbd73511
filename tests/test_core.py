"""Core infrastructure tests: vocab layout, config system, mesh."""

import jax
import numpy as np
import pytest

from mmada_tpu.core.config import Config, load_config, parse_overrides
from mmada_tpu.core.mesh import make_mesh
from mmada_tpu.core.vocab import MMADA_8B, MMADA_8B_T2M, tiny_layout


def test_flagship_vocab_layout():
    assert MMADA_8B.total_vocab_size == 134656  # configs/mmada_demo.yaml:19
    assert MMADA_8B.image_offset == 126464
    assert MMADA_8B.mask_token_id == 126336
    assert MMADA_8B.image_window == (126464, 134656)
    assert MMADA_8B.special("<|soi|>") == 126084
    assert MMADA_8B.special("<|eom|>") == 126097


def test_t2m_vocab_layout():
    assert MMADA_8B_T2M.motion_offset == 134656
    assert MMADA_8B_T2M.total_vocab_size == 134656 + 512 + 2
    np.testing.assert_array_equal(
        np.asarray(MMADA_8B_T2M.motion_to_fused(np.asarray([0, 511]))),
        [134656, 135167],
    )


def test_vocab_roundtrip():
    vl = tiny_layout()
    ids = np.asarray([0, 5, 63])
    np.testing.assert_array_equal(vl.fused_to_image(vl.image_to_fused(ids)), ids)


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "model:\n  lr: 5e-5\n  name: test\ntraining:\n"
        "  lr: ${model.lr}\n  steps: 100\n"
    )
    cfg = load_config(str(p))
    assert cfg.training.lr == 5e-5
    assert cfg.model.name == "test"
    # dotted override + save/reload
    cfg2 = load_config(str(p), cli_args=["training.steps=7", "a.b.c=[1,2]"])
    assert cfg2.training.steps == 7
    assert cfg2.a.b.c == [1, 2]
    out = tmp_path / "out.yaml"
    cfg2.save(str(out))
    cfg3 = load_config(str(out))
    assert cfg3.training.steps == 7


def test_config_scientific_notation():
    cfg = parse_overrides(["opt.lr=1e-4", "opt.eps=1E-8", "opt.n=3"])
    assert cfg.opt.lr == 1e-4 and isinstance(cfg.opt.lr, float)
    assert cfg.opt.eps == 1e-8
    assert cfg.opt.n == 3 and isinstance(cfg.opt.n, int)


def test_config_flatten():
    cfg = Config({"a": {"b": 1, "c": {"d": 2}}, "e": 3})
    flat = dict(cfg.flatten())
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}


def test_mesh_construction():
    mesh = make_mesh(data=1, fsdp=-1, tensor=2)
    assert mesh.shape == {"data": 1, "fsdp": 4, "tensor": 2}
    with pytest.raises(ValueError):
        make_mesh(data=3, fsdp=3, tensor=1)


def test_process_local_batch_slice_single_host():
    """Multi-host data sharding helper: on one process it owns the whole
    batch; the per-host arithmetic is what multi-host feeding relies on
    (core/mesh.py, make_array_from_process_local_data pairing)."""
    from mmada_tpu.core.mesh import process_local_batch_slice

    s = process_local_batch_slice(32)
    assert (s.start, s.stop) == (0, 32)


def test_initialize_distributed_single_process_is_safe():
    """initialize_distributed returns False instead of raising when no
    coordinator exists (single-process run)."""
    from mmada_tpu.core.mesh import initialize_distributed

    assert initialize_distributed() is False


def test_topology_fragment_merge():
    """`topology=configs/topologies/*.yaml` merges the launch topology over
    the base config (the reference's `accelerate launch --config_file`
    analog) while dotted CLI overrides still win last."""
    from mmada_tpu.core.config import load_config

    cfg = load_config(cli_args=[
        "config=configs/tiny_test.yaml",
        "topology=configs/topologies/v5e8_fsdp_tp.yaml",
        "parallel.tensor=4",
    ])
    assert cfg.get_path("parallel.fsdp") == 4       # from the fragment
    assert cfg.get_path("parallel.tensor") == 4     # CLI override wins
    assert cfg.get_path("parallel.serving") == "auto"
    # base config survives the merge
    assert cfg.get_path("model.mmada.num_vq_tokens") is not None


def test_parse_kv_cache_flag():
    """bool("int8") is True — the serving surfaces must route the flag
    through parse_kv_cache so the quantized cache is actually reachable."""
    from mmada_tpu.core.config import parse_kv_cache

    assert parse_kv_cache("int8") == "int8"
    assert parse_kv_cache("true") is True
    assert parse_kv_cache("false") is False
    assert parse_kv_cache(True) is True
    assert parse_kv_cache(False) is False
    assert parse_kv_cache("int8") != True or parse_kv_cache("int8") == "int8"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_kv_cache("quantized")


def test_parse_cfg_interval():
    """`cfg_interval` deployment values (yaml list, CLI 'lo,hi' string,
    None) normalize to a validated (lo, hi) tuple at config time."""
    from mmada_tpu.core.config import parse_cfg_interval

    assert parse_cfg_interval(None) == (0.0, 1.0)
    assert parse_cfg_interval("") == (0.0, 1.0)
    assert parse_cfg_interval("off") == (0.0, 1.0)
    assert parse_cfg_interval("0.2,0.8") == (0.2, 0.8)
    assert parse_cfg_interval("0.2:0.8") == (0.2, 0.8)
    assert parse_cfg_interval([0.0, 0.6]) == (0.0, 0.6)
    assert parse_cfg_interval((0.25, 0.75)) == (0.25, 0.75)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="lo <= hi"):
        parse_cfg_interval("0.8,0.2")
    with _pytest.raises(ValueError, match="lo <= hi"):
        parse_cfg_interval([-0.1, 0.5])
    with _pytest.raises(ValueError, match="lo,hi"):
        parse_cfg_interval("0.5")
