"""Persistent XLA compilation cache wiring.

Serving cold-start is dominated by XLA compiles, not weight loading: the
first big-sampler compile takes 2-7 min on the tunneled chip, and the
serve-proxy drive measured first-t2i 189.6 s vs 0.8 s warm in the SAME
process (SERVE_PROXY_r03.json). JAX ships a persistent disk cache keyed
on (HLO, compile options, backend/compiler version); pointing every
entry point at a stable directory makes the SECOND process boot with its
executables deserialized from disk instead of recompiled. The torch
reference has no equivalent — every process re-dispatches eagerly and
any torch.compile state is process-local.

Opt-in via `serving.compilation_cache_dir` (configs/mmada_demo.yaml);
empty/false disables. One knob on purpose: cache sizing/expiry stay at
JAX defaults except `min_compile_time_secs`, lowered so sampler-scale
programs (tens of seconds on CPU, minutes on chip) always land while
trivial sub-second programs stay out of the write path.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_enabled_dir: Optional[str] = None


def enable_compilation_cache(cfg=None, path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a stable directory.

    `path` wins over `cfg`; with neither (or an empty/false config value)
    this is a no-op returning None. Safe to call repeatedly and from
    multiple entry points — the first enabled directory sticks.
    """
    global _enabled_dir
    if path is None and cfg is not None:
        raw = cfg.get_path("serving.compilation_cache_dir", "")
        if not raw or str(raw).lower() in ("false", "none", "0"):
            return _enabled_dir
        path = str(raw)
    if path is None:
        return _enabled_dir
    path = os.path.expanduser(path)
    if _enabled_dir is not None:
        if _enabled_dir != path:
            logger.warning(
                "compilation cache already enabled at %s; ignoring %s",
                _enabled_dir, path,
            )
        return _enabled_dir

    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_enable_compilation_cache", True)
    # default is 1.0 s which already admits every sampler program; lower it
    # so CPU-sized test programs exercise the same path the chip uses
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    # executables below this size are cheap to recompile; keep the default
    # min-entry-size (0) so the cache is byte-for-byte deterministic to test
    _enabled_dir = path
    logger.info("persistent XLA compilation cache: %s", path)
    return path
