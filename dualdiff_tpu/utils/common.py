"""Misc utilities (reference ``magicdrive/misc/common.py``)."""

from __future__ import annotations

import importlib
from typing import Any, Callable

import jax

__all__ = ["load_module", "move_to"]


def load_module(name: str) -> Any:
    """Dynamic import of ``pkg.mod.Class`` config strings (reference
    ``misc/common.py:11-15`` — the runner/pipe/model module indirection is
    part of the public config surface)."""
    module, _, attr = name.rpartition(".")
    return getattr(importlib.import_module(module), attr)


def move_to(tree, dtype=None, predicate: Callable = None):
    """Tree-map dtype cast with an optional per-leaf predicate (reference
    ``misc/common.py:18-39``)."""
    def fn(x):
        if hasattr(x, "astype") and (predicate is None or predicate(x)):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(fn, tree)
