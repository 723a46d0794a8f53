"""Layered configuration system.

Replaces the reference's four coexisting config mechanisms (argparse flat
namespaces, ConvNets' layered-YAML-to-argparse-defaults ``launch.py:30-53`` +
``configs.yml``, DLRM's absl.flags, and the feature-spec YAML) with one
dataclass-based system:

- configs are plain ``@dataclass`` trees registered per model family
- YAML layers compose in the reference's order: ``precision × platform ×
  model × mode`` (reference ``PyTorch/Classification/ConvNets/launch.py:35-45``)
- CLI overrides use dotted paths (``--optimizer.lr 2.048``) while preserving
  the reference's flag spellings where feasible (``--lr``, ``--batch-size``)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Mapping, Sequence

import yaml

__all__ = [
    "resolve",
    "to_dict",
    "from_dict",
    "merge",
    "add_dataclass_args",
    "apply_namespace",
    "load_yaml_layers",
]


def to_dict(cfg: Any) -> dict:
    """Recursively convert a dataclass config to a plain dict (for logging)."""
    if is_dataclass(cfg) and not isinstance(cfg, type):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return type(cfg)(to_dict(v) for v in cfg)
    if isinstance(cfg, Mapping):
        return {k: to_dict(v) for k, v in cfg.items()}
    return cfg


def from_dict(cls: type, d: Mapping[str, Any]) -> Any:
    """Build dataclass ``cls`` from a nested dict, recursing into dataclass fields."""
    kwargs = {}
    field_map = {f.name: f for f in fields(cls)}
    for k, v in d.items():
        if k not in field_map:
            raise KeyError(f"unknown config key {k!r} for {cls.__name__}")
        f = field_map[k]
        if is_dataclass(f.type) and isinstance(v, Mapping):
            kwargs[k] = from_dict(f.type, v)
        else:
            kwargs[k] = v
    return cls(**kwargs)


def merge(cfg: Any, overrides: Mapping[str, Any]) -> Any:
    """Return a copy of dataclass ``cfg`` with a nested dict of overrides applied."""
    if not overrides:
        return cfg
    updates = {}
    field_map = {f.name: f for f in fields(cfg)}
    for k, v in overrides.items():
        if k not in field_map:
            raise KeyError(
                f"unknown config key {k!r} for {type(cfg).__name__}; "
                f"valid: {sorted(field_map)}"
            )
    for name, f in field_map.items():
        if name not in overrides:
            continue
        cur = getattr(cfg, name)
        v = overrides[name]
        if is_dataclass(cur) and isinstance(v, Mapping):
            updates[name] = merge(cur, v)
        else:
            updates[name] = v
    return dataclasses.replace(cfg, **updates)


def set_by_path(overrides: dict, path: str, value: Any) -> None:
    """Set ``overrides['a']['b'] = value`` for path ``"a.b"``."""
    keys = path.split(".")
    d = overrides
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


def _parse_value(s: str) -> Any:
    """Parse a CLI string into bool/int/float/list/str (YAML-subset semantics)."""
    try:
        return json.loads(s)
    except (json.JSONDecodeError, ValueError):
        pass
    low = s.lower()
    if low in ("true", "yes"):
        return True
    if low in ("false", "no"):
        return False
    if low in ("null", "none"):
        return None
    return s


def load_yaml_layers(
    path: str,
    *,
    precision: str | None = None,
    platform: str | None = None,
    model: str | None = None,
    mode: str | None = None,
) -> dict:
    """Compose override layers from a configs.yml-style file.

    The file holds top-level sections ``precision``, ``platform``, ``models``
    (keyed by model, then platform, then precision), and ``mode``; they merge
    in that order, later layers winning — the same composition the reference's
    ``launch.py:35-45`` performs on argparse defaults.
    """
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    out: dict = {}

    def deep_update(dst: dict, src: Mapping) -> None:
        for k, v in src.items():
            if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
                deep_update(dst[k], v)
            else:
                dst[k] = v if not isinstance(v, Mapping) else dict(v)

    if precision and precision in doc.get("precision", {}):
        deep_update(out, doc["precision"][precision])
    if platform and platform in doc.get("platform", {}):
        deep_update(out, doc["platform"][platform])
    if model and model in doc.get("models", {}):
        node = doc["models"][model]
        # model section may itself be layered by platform then precision
        if platform and platform in node:
            node = node[platform]
        if precision and isinstance(node, Mapping) and precision in node:
            node = node[precision]
        if isinstance(node, Mapping):
            deep_update(out, node)
    if mode and mode in doc.get("mode", {}):
        deep_update(out, doc["mode"][mode])
    return out


def _flatten_fields(cls: type, prefix: str = "") -> list[tuple[str, Any, Any]]:
    out = []
    for f in fields(cls):
        path = f"{prefix}{f.name}"
        if is_dataclass(f.type):
            out.extend(_flatten_fields(f.type, path + "."))
        else:
            if f.default is not dataclasses.MISSING:
                default = f.default
            elif f.default_factory is not dataclasses.MISSING:  # type: ignore
                default = f.default_factory()  # type: ignore
            else:
                default = None
            out.append((path, f.type, default))
    return out


def add_dataclass_args(
    parser: argparse.ArgumentParser, cls: type, aliases: Mapping[str, str] | None = None
) -> None:
    """Register ``--a.b.c`` flags for every leaf field of a dataclass tree.

    ``aliases`` maps short reference-style flags to dotted paths, e.g.
    ``{"lr": "optimizer.lr", "batch-size": "data.batch_size"}``.
    """
    seen = set()
    for path, _ftype, default in _flatten_fields(cls):
        flag = "--" + path
        parser.add_argument(
            flag, dest=path, default=None, type=str, help=f"(default: {default})"
        )
        seen.add(path)
    for alias, path in (aliases or {}).items():
        if path not in seen:
            raise KeyError(f"alias {alias!r} -> unknown path {path!r}")
        parser.add_argument("--" + alias, dest=path, default=None, type=str)


def apply_namespace(cfg: Any, ns: argparse.Namespace) -> Any:
    """Apply parsed dotted-path CLI values onto a dataclass config."""
    overrides: dict = {}
    for path, raw in vars(ns).items():
        if raw is None or "." not in path and not _is_field(cfg, path):
            continue
        set_by_path(overrides, path, _parse_value(raw) if isinstance(raw, str) else raw)
    return merge(cfg, overrides)


def _is_field(cfg: Any, name: str) -> bool:
    return is_dataclass(cfg) and name in {f.name for f in fields(cfg)}


def resolve(
    cfg: Any,
    *,
    yaml_path: str | None = None,
    precision: str | None = None,
    platform: str | None = None,
    model: str | None = None,
    mode: str | None = None,
    cli_overrides: Mapping[str, Any] | None = None,
) -> Any:
    """Full resolution: defaults → YAML layers → CLI overrides."""
    if yaml_path:
        cfg = merge(
            cfg,
            load_yaml_layers(
                yaml_path, precision=precision, platform=platform, model=model, mode=mode
            ),
        )
    if cli_overrides:
        nested: dict = {}
        for path, v in cli_overrides.items():
            set_by_path(nested, path, v)
        cfg = merge(cfg, nested)
    return cfg
