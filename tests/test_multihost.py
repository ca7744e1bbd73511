"""REAL multi-process distributed execution (SURVEY §2.6 "comm backend").

The reference's multi-node story is NCCL + static rendezvous across 8
nodes (accelerate_configs/8_node_8_gpus_deepspeed_zero2.yaml). The
TPU-native analog is `jax.distributed.initialize` + a global mesh whose
collectives ride ICI/DCN. Real multi-host TPU hardware is not available
here, so this test runs the SAME code path as two host processes on the
CPU (Gloo) backend: 2 processes × 4 local devices = one 8-device global
mesh, parameters sharded over (fsdp, tensor), each host feeding only its
local batch rows. That exercises cross-process rendezvous, global-array
construction from per-host shards, the gradient all-reduce across the
process boundary, and cross-host allgather of sampler output — everything
multi-host except the physical interconnect.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_generate():
    port = _free_port()
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "MULTIHOST_WORKER_OK" in out, out

    def grab(tag, out):
        return [ln for ln in out.splitlines() if ln.startswith(tag)]

    # the loss is the all-reduced global loss: identical on both hosts
    assert grab("LOSS", outs[0]) == grab("LOSS", outs[1]), outs
    # sampler output allgathered across hosts agrees
    assert grab("GEN", outs[0]) == grab("GEN", outs[1]), outs
