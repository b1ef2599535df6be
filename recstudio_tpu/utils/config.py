"""Layered YAML configuration system.

Mirrors the reference's four-group config schema (data / model / train / eval)
and its merge order: base defaults -> family defaults -> per-model YAML ->
programmatic overrides -> CLI flags.  (Reference: recstudio/utils/utils.py:57-154,
recstudio/model/basemodel/basemodel.yaml.)
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG_GROUPS = ("data", "model", "train", "eval")


class _SafeLoaderWithTuple(yaml.SafeLoader):
    pass


_SafeLoaderWithTuple.add_constructor(
    "tag:yaml.org,2002:python/tuple",
    lambda loader, node: tuple(loader.construct_sequence(node)),
)


import re

_SCI_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _coerce_sci(obj):
    """YAML 1.1 parses '1e-4' as a string; coerce scientific notation to float."""
    if isinstance(obj, dict):
        return {k: _coerce_sci(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_coerce_sci(v) for v in obj]
    if isinstance(obj, str) and _SCI_RE.match(obj):
        return float(obj)
    return obj


def load_yaml(path: str) -> Dict[str, Any]:
    """Load one YAML file into a dict ({} for empty files)."""
    with open(path, "r", encoding="utf-8") as f:
        conf = yaml.load(f, Loader=_SafeLoaderWithTuple)
    return _coerce_sci(conf) if conf is not None else {}


def deep_update(base: Dict[str, Any], update: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    """Recursively merge ``update`` into ``base`` (returns a new dict).

    Nested dicts are merged key-wise; any other value type is replaced.
    """
    out = copy.deepcopy(base)
    if not update:
        return out
    for k, v in update.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_update(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def parser_yaml(path: str) -> Dict[str, Any]:
    """Alias kept for API familiarity with the reference."""
    return load_yaml(path)


def get_base_model_config() -> Dict[str, Any]:
    return load_yaml(os.path.join(PKG_ROOT, "models", "basemodel", "basemodel.yaml"))


def color_dict_normal(d: Dict[str, Any]) -> str:
    """Pretty printable nested config (no ANSI; used in logs)."""
    lines = []
    for group, sub in d.items():
        lines.append(f"[{group}]")
        if isinstance(sub, dict):
            for k, v in sorted(sub.items(), key=lambda kv: str(kv[0])):
                lines.append(f"  {k}={v}")
        else:
            lines.append(f"  {sub}")
    return "\n".join(lines)
