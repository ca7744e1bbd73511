"""Persistent XLA compilation cache wiring (core/compile_cache.py).

Serving cold-start is compile-dominated (first t2i 189.6 s vs 0.8 s warm,
SERVE_PROXY_r03.json), so every entry point routes through
`enable_compilation_cache`. The cache itself is JAX's; what we own — and
pin here — is the config plumbing (falsy values disable, first dir wins)
and that an enabled process actually persists executables a SECOND
process reuses (subprocess pair, real disk round-trip).
"""

import json
import os
import subprocess
import sys
import textwrap

from mmada_tpu.core import compile_cache
from mmada_tpu.core.config import Config

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def test_falsy_config_values_disable(monkeypatch):
    monkeypatch.setattr(compile_cache, "_enabled_dir", None)
    for raw in ("", "false", "none", "0", False, None):
        cfg = Config({"serving": {"compilation_cache_dir": raw}})
        assert compile_cache.enable_compilation_cache(cfg) is None
    assert compile_cache.enable_compilation_cache(Config({})) is None


def test_first_directory_wins(monkeypatch, tmp_path):
    monkeypatch.setattr(compile_cache, "_enabled_dir", str(tmp_path / "a"))
    cfg = Config({"serving": {"compilation_cache_dir": str(tmp_path / "b")}})
    assert compile_cache.enable_compilation_cache(cfg) == str(tmp_path / "a")


_CHILD = textwrap.dedent("""
    import json, os, sys, time
    sys.path.insert(0, {repo!r})
    from mmada_tpu.core.compile_cache import enable_compilation_cache
    from mmada_tpu.core.config import Config

    cache_dir = sys.argv[1]
    cfg = Config({{"serving": {{"compilation_cache_dir": cache_dir}}}})
    got = enable_compilation_cache(cfg)
    assert got == cache_dir, got

    import jax
    # force CPU IN-PROCESS: the axon sitecustomize pins JAX_PLATFORMS and
    # the env var cannot override it, so without this the child would
    # initialize the tunneled TPU backend — observed hanging this test
    # whenever the tunnel was degraded (an accidental hardware
    # dependency in a disk-roundtrip test)
    jax.config.update("jax_platforms", "cpu")
    # admit even this tiny test program into the persistent cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    t0 = time.perf_counter()
    out = jax.jit(lambda x: jnp.sin(x) @ x.T)(jnp.ones((64, 64))).sum()
    print(json.dumps({{
        "result": float(out),
        "seconds": time.perf_counter() - t0,
        "entries": len(os.listdir(cache_dir)),
    }}))
""")


def test_second_process_reuses_cache(tmp_path):
    cache_dir = str(tmp_path / "xla-cache")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}

    def run():
        out = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=REPO), cache_dir],
            capture_output=True, text=True, env=env, timeout=300,
        )
        assert out.returncode == 0, out.stderr
        return json.loads(out.stdout.strip().splitlines()[-1])

    cold = run()
    assert cold["entries"] >= 1  # executable persisted to disk
    warm = run()
    assert warm["entries"] == cold["entries"]  # reused, not re-added
    assert warm["result"] == cold["result"]
