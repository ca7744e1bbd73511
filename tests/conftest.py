"""Test harness: force an 8-virtual-device CPU platform.

Sharding/parallelism tests run against a fake 8-device CPU mesh
(`--xla_force_host_platform_device_count=8`), the standard JAX pattern for
validating multi-chip pjit programs without TPU hardware. The environment's
axon plugin pins `JAX_PLATFORMS=axon`, so CPU must be forced in-process
before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import gc

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _vm_map_count() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no limit to guard
        return 0


#: vm.max_map_count defaults to 65530; headroom for one sampler-scale
#: compile (hundreds of mappings while LLVM runs) plus fixture state.
#: 35k (was 45k): the round-4 full suite peaked at 45,011 — one new test
#: file from re-triggering the SIGSEGV class. Clearing earlier costs a
#: few extra recompiles mid-suite and buys ~30k mappings of headroom
#: (VERDICT r4 #8).
_MAP_CLEAR_THRESHOLD = 35_000
_map_high_water = 0
_cache_dir_setter: str | None = None


def pytest_runtest_teardown(item, nextitem):
    """Guard against vm.max_map_count exhaustion from jit-cache growth.

    XLA:CPU's LLVM JIT mmap()s code/data segments per compiled executable
    and never unmaps them while JAX's jit caches hold a reference. A full
    suite run compiles thousands of distinct programs (x 8 virtual
    devices), marching the process toward the kernel's per-process
    mapping limit (vm.max_map_count, 65530 default) — past it, mmap
    fails inside the next big compile and LLVM aborts with SIGSEGV
    instead of raising (observed: exit 139 at ~78% of the suite, in the
    largest text-sampler scan compile, while the same test passes in
    isolation). Dropping the caches releases the executables and their
    mappings; the threshold confines the recompile tax to long runs.
    """
    global _map_high_water, _cache_dir_setter
    n = _vm_map_count()
    if n > _map_high_water:
        _map_high_water = n
    if n > _MAP_CLEAR_THRESHOLD:
        jax.clear_caches()
        gc.collect()
    # the suite must never enable the persistent compilation cache on the
    # REAL shared dir (a concurrent chip process writes it); record the
    # first test that flips it so leaks are attributable
    if _cache_dir_setter is None and jax.config.jax_compilation_cache_dir:
        _cache_dir_setter = (
            f"{item.nodeid} -> {jax.config.jax_compilation_cache_dir}"
        )


def _kernel_map_limit():
    """vm.max_map_count, or 'n/a' if unreadable (mirrors _vm_map_count)."""
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read())
    except OSError:
        return "n/a"


def pytest_terminal_summary(terminalreporter):
    terminalreporter.write_line(
        f"vm maps high-water: {_map_high_water} "
        f"(clear threshold {_MAP_CLEAR_THRESHOLD}, "
        f"kernel limit {_kernel_map_limit()})"
    )
    terminalreporter.write_line(
        f"compilation cache dir set during suite: {_cache_dir_setter or 'never'}"
    )
