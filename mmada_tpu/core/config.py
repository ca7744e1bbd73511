"""YAML config system with dotted CLI overrides and `${a.b.c}` interpolation.

OmegaConf-compatible in behavior for everything the reference uses
(reference: training/utils.py:12-17 `get_config` merges a yaml file with
`key.sub=value` CLI args; configs use `${optimizer.params.learning_rate}`
interpolation, e.g. configs/mmada_demo.yaml). Implemented on plain dicts so
it carries no dependency; values round-trip through PyYAML.
"""

from __future__ import annotations

import copy
import re
import sys
from typing import Any, Iterator, Mapping, Optional

import yaml

_INTERP_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


class Config(dict):
    """dict with attribute access, deep merge, and interpolation resolution."""

    def __init__(self, data: Optional[Mapping[str, Any]] = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = _wrap(v)

    # attribute access --------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __delattr__(self, name: str) -> None:
        del self[name]

    def get_path(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self
        for part in parts[:-1]:
            nxt = node.get(part)
            if not isinstance(nxt, Config):
                nxt = Config()
                node[part] = nxt
            node = nxt
        node[parts[-1]] = _wrap(value)

    # merge --------------------------------------------------------------
    def merge(self, other: Mapping[str, Any]) -> "Config":
        for k, v in other.items():
            if isinstance(v, Mapping) and isinstance(self.get(k), Config):
                self[k].merge(v)
            else:
                self[k] = _wrap(v)
        return self

    # interpolation ------------------------------------------------------
    def resolve(self, root: Optional["Config"] = None) -> "Config":
        root = root if root is not None else self
        for k, v in list(self.items()):
            if isinstance(v, Config):
                v.resolve(root)
            elif isinstance(v, list):
                self[k] = [_resolve_value(item, root) for item in v]
            else:
                self[k] = _resolve_value(v, root)
        return self

    # serialization ------------------------------------------------------
    def to_dict(self) -> dict:
        out: dict = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [i.to_dict() if isinstance(i, Config) else i for i in v]
            else:
                out[k] = v
        return out

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_yaml())

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def flatten(self, prefix: str = "") -> Iterator[tuple[str, Any]]:
        """Flat (dotted_key, leaf) pairs — the reference's
        `flatten_omega_conf` equivalent for experiment logging."""
        for k, v in self.items():
            key = f"{prefix}{k}" if not prefix else f"{prefix}.{k}"
            if isinstance(v, Config):
                yield from v.flatten(key)
            else:
                yield key, v


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, Mapping):
        return Config(value)
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def _resolve_value(value: Any, root: Config) -> Any:
    if not isinstance(value, str):
        return value
    m = _INTERP_RE.fullmatch(value)
    if m:  # whole-string reference keeps the referent's type
        target = root.get_path(m.group(1))
        if target is None:
            raise KeyError(f"unresolvable interpolation: {value}")
        return _resolve_value(target, root)
    # embedded references become strings
    def repl(match: re.Match) -> str:
        target = root.get_path(match.group(1))
        if target is None:
            raise KeyError(f"unresolvable interpolation: {match.group(0)}")
        return str(_resolve_value(target, root))
    return _INTERP_RE.sub(repl, value)


_FLOAT_RE = re.compile(r"[-+]?(\d+\.?\d*|\.\d+)[eE][-+]?\d+")


def _coerce_floats(node: Any) -> Any:
    """PyYAML 1.1 reads bare `5e-5` as a string; OmegaConf (the reference's
    config layer) reads it as float. Recursively coerce to match."""
    if isinstance(node, dict):
        return {k: _coerce_floats(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_coerce_floats(v) for v in node]
    if isinstance(node, str) and _FLOAT_RE.fullmatch(node.strip()):
        return float(node)
    return node


def _load_yaml_with_base(path: str, _depth: int = 0) -> Config:
    """Load yaml honoring a `_base_: other.yaml` inheritance key (resolved
    relative to the cwd first, then to the file's directory)."""
    import os

    if _depth > 8:
        raise ValueError(f"_base_ chain too deep at {path}")
    with open(path) as f:
        loaded = yaml.safe_load(f) or {}
    loaded = _coerce_floats(loaded)
    base_path = loaded.pop("_base_", None)
    cfg = Config()
    if base_path:
        if not os.path.exists(base_path):
            candidate = os.path.join(os.path.dirname(path), base_path)
            base_path = candidate if os.path.exists(candidate) else base_path
        cfg.merge(_load_yaml_with_base(base_path, _depth + 1))
    cfg.merge(loaded)
    return cfg


def _parse_scalar(text: str) -> Any:
    # YAML 1.1 reads bare "1e-4" as a string (needs "1.0e-4"); accept the
    # common scientific-notation spelling as float like OmegaConf does.
    if _FLOAT_RE.fullmatch(text.strip()):
        return float(text)
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def parse_overrides(args: list[str]) -> Config:
    """Parse `a.b.c=value` CLI tokens into a nested Config."""
    cfg = Config()
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"override must look like key=value, got: {arg!r}")
        key, _, raw = arg.partition("=")
        cfg.set_path(key.strip(), _parse_scalar(raw))
    return cfg


def load_config(
    path: Optional[str] = None,
    overrides: Optional[list[str]] = None,
    cli_args: Optional[list[str]] = None,
) -> Config:
    """Load yaml + dotted overrides, matching the reference CLI contract
    `python train.py config=path.yaml a.b=1` (training/utils.py:12-17)."""
    argv = list(cli_args if cli_args is not None else [])
    kv = [a for a in argv if "=" in a]
    topology = None
    for item in kv:
        k, _, v = item.partition("=")
        if k == "config" and path is None:
            path = v
        elif k == "topology":
            # topology fragment (configs/topologies/*.yaml) merged over the
            # base config — the reference's `accelerate launch
            # --config_file accelerate_configs/*.yaml` analog: the model/
            # data config stays fixed while the launch topology swaps
            topology = v
    kv = [a for a in kv
          if not (a.startswith("config=") or a.startswith("topology="))]

    cfg = Config()
    if path:
        cfg.merge(_load_yaml_with_base(path))
    if topology:
        cfg.merge(_load_yaml_with_base(topology))
    if overrides:
        cfg.merge(parse_overrides(overrides))
    if kv:
        cfg.merge(parse_overrides(kv))
    cfg.resolve()
    return cfg


def get_config() -> Config:
    """Drop-in for the reference's `training.utils.get_config`."""
    return load_config(cli_args=sys.argv[1:])


def parse_kv_cache(value):
    """CLI/HTTP `kv_cache` values -> False | True | "int8".

    `bool("int8")` is True, which would silently downgrade the quantized
    cache to the full-precision one — every serving surface routes the
    flag through here instead."""
    if isinstance(value, str):
        v = value.strip().lower()
        if v == "int8":
            return "int8"
        if v in ("1", "true", "yes", "on"):
            return True
        if v in ("0", "false", "no", "off", ""):
            return False
        raise ValueError(f"kv_cache must be true/false/int8, got {value!r}")
    return "int8" if value == "int8" else bool(value)


def parse_bool(value):
    """Strict bool parse for CLI/HTTP/yaml flags — `bool("false")` is
    True (the parse_kv_cache bug class), so string values go through an
    explicit table."""
    if isinstance(value, str):
        v = value.strip().lower()
        if v in ("1", "true", "yes", "on"):
            return True
        if v in ("0", "false", "no", "off", ""):
            return False
        raise ValueError(f"expected a boolean, got {value!r}")
    return bool(value)


def parse_cfg_interval(value):
    """CLI/HTTP/yaml `cfg_interval` values -> (lo, hi) float tuple.

    Accepts a 2-sequence ([0.2, 0.8]), a "lo,hi" / "lo:hi" string (CLI
    `cfg_interval=0.2,0.8`), or None/"" (trivial (0.0, 1.0) = CFG every
    step, the reference behavior). Validates 0 <= lo <= hi <= 1 here so a
    malformed deployment value fails at config time, not inside a traced
    sampler."""
    if value is None:
        return (0.0, 1.0)
    if isinstance(value, str):
        v = value.strip()
        if v in ("", "off", "none"):
            return (0.0, 1.0)
        parts = v.replace(":", ",").split(",")
        if len(parts) != 2:
            raise ValueError(
                f"cfg_interval must be 'lo,hi', got {value!r}")
        value = [float(p) for p in parts]
    lo, hi = (float(value[0]), float(value[1]))
    if not (0.0 <= lo <= hi <= 1.0):
        raise ValueError(
            f"cfg_interval must satisfy 0 <= lo <= hi <= 1, got {value!r}")
    return (lo, hi)


def parse_remat(value):
    """`training.gradient_checkpointing` values -> False | "full" | "dots".

    Same bug class as parse_kv_cache: `bool("dots")` is True, which would
    silently promote the selective policy to full-layer recompute. "full"
    rematerializes the whole layer in backward (minimal memory, ~25%
    extra MXU work at stage-1 shapes); "dots" saves every matmul output
    (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) so the
    backward recomputes only elementwise ops + the flash-attention
    forward — more activation memory, near-zero recompute FLOPs."""
    if isinstance(value, str):
        v = value.strip().lower()
        if v in ("dots", "auto"):
            # "auto": the Trainer resolves dots-vs-full at the first step
            # by compiled-memory fit (training/remat_auto.pick_remat);
            # outside the trainer it behaves as "full"
            return v
        if v in ("1", "true", "yes", "on", "full"):
            return "full"
        if v in ("0", "false", "no", "off", ""):
            return False
        raise ValueError(
            f"gradient_checkpointing must be true/false/full/dots/auto, "
            f"got {value!r}"
        )
    return "full" if value else False


def parse_structured(cls, cfg: Mapping[str, Any]):
    """Config section → dataclass instance, ignoring unknown keys
    (the reference's `models/misc.py:parse_structured` contract)."""
    import dataclasses

    names = {f.name for f in dataclasses.fields(cls)}
    kwargs = {k: v for k, v in dict(cfg).items() if k in names}
    return cls(**kwargs)
