"""Immutable nested-dict (pytree) path utilities used by calibration
algorithms to functionally rewrite params/quant state."""

from __future__ import annotations

from typing import Any, Sequence


def get_in(tree: dict, path: Sequence[str], default=None):
    cur = tree
    for k in path:
        if not isinstance(cur, dict) or k not in cur:
            return default
        cur = cur[k]
    return cur


def set_in(tree: dict, path: Sequence[str], value) -> dict:
    """Return a copy of ``tree`` with ``value`` at ``path`` (creating dicts)."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    new = dict(tree) if isinstance(tree, dict) else {}
    new[head] = set_in(new.get(head, {}), rest, value)
    return new


def update_in(tree: dict, path: Sequence[str], fn) -> dict:
    return set_in(tree, path, fn(get_in(tree, path)))


def del_in(tree: dict, path: Sequence[str]) -> dict:
    """Return a copy of ``tree`` without the leaf at ``path`` (no-op if absent)."""
    if not path or not isinstance(tree, dict) or path[0] not in tree:
        return tree
    new = dict(tree)
    if len(path) == 1:
        del new[path[0]]
        return new
    new[path[0]] = del_in(new[path[0]], path[1:])
    return new


def flatten_with_paths(tree: Any, prefix=()):
    """Yield ('/'-joined path, leaf) pairs for a nested dict."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten_with_paths(v, prefix + (str(k),))
    else:
        yield "/".join(prefix), tree
