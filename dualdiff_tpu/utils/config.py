"""Hydra-style YAML config system (composition + overlays + interpolation).

The reference framework exposes its entire experiment surface through Hydra
configs (``configs/config.yaml`` composition root, ``+exp=`` overlays with
``# @package _global_``, ``${}`` interpolation; see reference
``MD_txt_con_fusion/configs/config.yaml:1-45`` and
``tools/train.py:42`` ``@hydra.main``).  We reproduce that public surface with
a small dependency-free implementation:

* ``defaults:`` lists compose group files (``- model: SDv1.5mv_rawbox`` loads
  ``configs/model/SDv1.5mv_rawbox.yaml`` under key ``model``).
* ``+exp=name`` overlay files are merged at the root (the reference marks them
  ``# @package _global_``).
* ``${a.b.c}`` absolute and ``${..rel}`` relative interpolation (OmegaConf
  semantics: one leading dot = current node, each extra dot = one level up).
* Dotted command-line overrides ``a.b=value`` (YAML-parsed scalar values).

Configs behave like both dicts and attribute objects (``cfg.model.name``).
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional

import yaml

__all__ = ["ConfigNode", "load_config", "to_dict", "merge", "save_config",
           "pop_config_name"]


def pop_config_name(overrides: List[str], default: str = "config"):
    """Strip hydra's ``--config-name NAME`` / ``--config-name=NAME`` / ``-cn``
    from a CLI override list (reference tools run e.g. ``--config-name
    test_config`` to start from the canned eval presets,
    ``configs/test_config.yaml``).  Returns ``(name, remaining_overrides)``.
    """
    name = default
    rest: List[str] = []
    i = 0
    while i < len(overrides):
        tok = overrides[i]
        if tok in ("--config-name", "-cn"):
            if i + 1 >= len(overrides):
                raise ValueError(f"{tok} needs a value")
            name = overrides[i + 1]
            i += 2
            continue
        if tok.startswith("--config-name="):
            name = tok.split("=", 1)[1]
        elif tok.startswith("-cn="):
            name = tok.split("=", 1)[1]
        else:
            rest.append(tok)
        i += 1
    return name, rest


class ConfigNode(dict):
    """dict with attribute access, nested-auto-wrapping."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        for k, v in dict(*args, **kwargs).items():
            self[k] = v  # route through __setitem__ to wrap nested values

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __setitem__(self, key, value):
        super().__setitem__(key, _wrap(value))

    def __deepcopy__(self, memo):
        return ConfigNode({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, ConfigNode) and part in node:
                node = node[part]
            elif isinstance(node, list) and part.lstrip("-").isdigit():
                idx = int(part)
                if -len(node) <= idx < len(node):
                    node = node[idx]
                else:
                    return default
            else:
                return default
        return node

    def set_path(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node: Any = self
        for part in parts[:-1]:
            if isinstance(node, list):
                node = node[int(part)]
                continue
            if part not in node or not isinstance(node[part], (ConfigNode, list)):
                node[part] = ConfigNode()
            node = node[part]
        last = parts[-1]
        if isinstance(node, list):
            node[int(last)] = _wrap(value)
        else:
            node[last] = _wrap(value)


def _wrap(value: Any) -> Any:
    if isinstance(value, ConfigNode):
        return value
    if isinstance(value, dict):
        return ConfigNode({k: _wrap(v) for k, v in value.items()})
    if isinstance(value, list):
        return [_wrap(v) for v in value]
    return value


def to_dict(node: Any) -> Any:
    """Recursively convert ConfigNode tree back to plain python types."""
    if isinstance(node, ConfigNode):
        return {k: to_dict(v) for k, v in node.items()}
    if isinstance(node, list):
        return [to_dict(v) for v in node]
    return node


def merge(base: ConfigNode, overlay: Dict[str, Any]) -> ConfigNode:
    """Deep-merge ``overlay`` into ``base`` (in place); overlay wins.

    Lists are replaced wholesale (OmegaConf behavior)."""
    for key, value in overlay.items():
        if (
            key in base
            and isinstance(base[key], ConfigNode)
            and isinstance(value, dict)
        ):
            merge(base[key], value)
        else:
            base[key] = _wrap(value)
    return base


def _load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


def _resolve_node(root: ConfigNode, value: Any, self_path: List[str]) -> Any:
    """Resolve all interpolations in a single scalar string."""
    if not isinstance(value, str):
        return value

    def lookup(expr: str) -> Any:
        expr = expr.strip()
        if expr.startswith("."):
            # relative: one dot = current node, each further dot = one up
            ndots = len(expr) - len(expr.lstrip("."))
            rest = expr[ndots:]
            base_path = self_path[: len(self_path) - (ndots - 1)] if ndots > 1 else list(self_path)
            dotted = ".".join(base_path + ([rest] if rest else []))
        else:
            dotted = expr
        sentinel = object()
        out = root.get_path(dotted, sentinel)
        if out is sentinel:
            raise KeyError(f"Interpolation ${{{expr}}} not found (from {'.'.join(self_path)})")
        return out

    full = _INTERP_RE.fullmatch(value.strip())
    if full:
        return lookup(full.group(1))

    def sub(m: re.Match) -> str:
        out = lookup(m.group(1))
        return str(out)

    return _INTERP_RE.sub(sub, value)


def _resolve_tree(root: ConfigNode, node: Any, path: List[str], depth: int = 0) -> Any:
    if depth > 32:
        raise RecursionError("config interpolation too deep (cycle?)")
    if isinstance(node, ConfigNode):
        for k in list(node.keys()):
            node[k] = _resolve_tree(root, node[k], path + [k], depth)
        return node
    if isinstance(node, list):
        return [_resolve_tree(root, v, path + [str(i)], depth) for i, v in enumerate(node)]
    if isinstance(node, str) and "${" in node:
        resolved = _resolve_node(root, node, path[:-1])
        if isinstance(resolved, str) and "${" in resolved:
            return _resolve_tree(root, resolved, path, depth + 1)
        return _wrap(copy.deepcopy(to_dict(resolved)) if isinstance(resolved, (ConfigNode, list)) else resolved)
    return node


def _parse_override_value(text: str) -> Any:
    try:
        out = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(out, str):
        # YAML 1.1 misses dot-less scientific notation ("1e-3" -> str)
        try:
            return float(out)
        except ValueError:
            return out
    return out


def _compose_file(config_dir: str, rel: str, visited: Optional[set] = None) -> ConfigNode:
    """Load one yaml with its defaults list composed (no interpolation yet)."""
    visited = visited or set()
    path = os.path.join(config_dir, rel if rel.endswith(".yaml") else rel + ".yaml")
    if path in visited:
        raise RecursionError(f"defaults cycle via {path}")
    visited.add(path)
    raw = _load_yaml(path)
    defaults = raw.pop("defaults", None)
    self_node = _wrap(raw)
    if defaults is None:
        return self_node

    out = ConfigNode()
    placed_self = False
    rel_dir = os.path.dirname(rel)
    for entry in defaults:
        if entry == "_self_":
            merge(out, self_node)
            placed_self = True
            continue
        if isinstance(entry, str):
            # leading slash: absolute to the config ROOT (hydra semantics —
            # exp-hd overlays chain `- /exp/dual_branch_augloss_fusion`)
            if entry.startswith("/"):
                merge(out, _compose_file(config_dir, entry[1:], visited))
                continue
            # plain string: sibling file first (hydra group-relative), then root
            sib = os.path.join(rel_dir, entry) if rel_dir else entry
            target = sib if os.path.exists(
                os.path.join(config_dir, sib + ".yaml")) else entry
            merge(out, _compose_file(config_dir, target, visited))
            continue
        (group, name), = entry.items()
        if name is None:
            continue
        sub = _compose_file(config_dir, os.path.join(group, str(name)), visited)
        merge(out, ConfigNode({group.split("/")[-1]: sub}))
    if not placed_self:
        merge(out, self_node)
    return out


def load_config(
    config_dir: str,
    name: str = "config",
    overrides: Optional[List[str]] = None,
    resolve: bool = True,
) -> ConfigNode:
    """Compose a config like ``hydra.main(config_name=name)`` would.

    Overrides understand three forms:
      * ``+exp=foo``  — merge ``<config_dir>/exp/foo.yaml`` at root
        (also ``+exp-hd=...`` etc.: any ``+group=name`` merges at root).
      * ``group=name`` for groups present in the defaults list — replaces the
        group selection (e.g. ``runner=debug``).
      * ``a.b.c=value`` — dotted set.
    """
    cfg = _compose_file(config_dir, name)

    # hydra ordering regardless of CLI order: group re-selections
    # (``runner=debug`` — part of the defaults list) apply FIRST, then
    # ``+exp=`` overlays (which may patch inside groups), then dotted sets.
    # Applying a group replacement after an exp overlay would silently drop
    # the overlay's patches to that group (e.g. rgd_stage2's
    # ``runner.decode_chunk``).
    groups, overlays, dotted = [], [], []
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"Bad override (need key=value): {ov}")
        key, value = ov.split("=", 1)
        if key.startswith("+"):
            overlays.append((key[1:], value))
        elif "." not in key and isinstance(cfg.get(key), ConfigNode) and \
                os.path.isdir(os.path.join(config_dir, key)):
            groups.append((key, value))
        else:
            dotted.append((key, value))

    for key, value in groups:
        cfg[key] = _compose_file(config_dir, os.path.join(key, value))
    for group, value in overlays:
        merge(cfg, _compose_file(config_dir, os.path.join(group, value)))
    for key, value in dotted:
        cfg.set_path(key, _parse_override_value(value))

    if resolve:
        _resolve_tree(cfg, cfg, [])
    return cfg


def save_config(cfg: ConfigNode, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)
