"""YAML config loading with ``$import`` composition
(reference: modelopt/torch/opt/config_loader.py:619 load_config, :81
BUILTIN_CONFIG_ROOT; recipe YAMLs in modelopt_recipes/).

A YAML file may contain ``$import: other.yaml`` (string or list) anywhere in
a mapping; imported mappings are deep-merged underneath the importing one
(importer wins). Paths resolve relative to the importing file, with the
builtin recipe root (modelopt_tpu/recipes/) as fallback.
"""

from __future__ import annotations

import os
from typing import Any

import yaml

BUILTIN_CONFIG_ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "recipes")


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _resolve_path(name: str, rel_to: str | None) -> str:
    cands = []
    if rel_to:
        cands.append(os.path.join(os.path.dirname(rel_to), name))
    cands.append(os.path.join(BUILTIN_CONFIG_ROOT, name))
    cands.append(name)
    for c in cands:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(f"config {name!r} not found (tried {cands})")


def _expand(node: Any, src: str | None) -> Any:
    if isinstance(node, dict):
        node = dict(node)
        imports = node.pop("$import", None)
        expanded = {k: _expand(v, src) for k, v in node.items()}
        if imports:
            if isinstance(imports, str):
                imports = [imports]
            base: dict = {}
            for imp in imports:
                base = _deep_merge(base, load_config(_resolve_path(imp, src)))
            expanded = _deep_merge(base, expanded)
        return expanded
    if isinstance(node, list):
        return [_expand(v, src) for v in node]
    return node


def load_config(path: str) -> dict:
    """Load a YAML config, expanding $import recursively."""
    path = _resolve_path(path, None)
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return _expand(raw, path)


def apply_dotlist(cfg: dict, overrides: list[str]) -> dict:
    """CLI dotlist overrides: ["a.b=3", "x=foo"]
    (reference: recipe/loader.py:122)."""
    out = dict(cfg)
    for item in overrides:
        key, _, val = item.partition("=")
        parsed = yaml.safe_load(val)
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            nxt = dict(node.get(p, {}))
            node[p] = nxt
            node = nxt
        node[parts[-1]] = parsed
    return out
