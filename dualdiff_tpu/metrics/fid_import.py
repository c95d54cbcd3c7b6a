"""Importer for the standard FID inception weights
(``pt_inception-2015-12-05``, the pytorch-fid port of the original TF
InceptionV3; reference downloads it in ``magicdrive/misc/inception.py:16-341``).

The torch state dict layout is torchvision ``inception_v3`` with
``num_classes=1008, aux_logits=False``: every conv block ``<mod>`` carries
``<mod>.conv.weight`` (O, I, kh, kw), ``<mod>.bn.{weight,bias,running_mean,
running_var,num_batches_tracked}``, plus the (unused for pool3 features)
``fc.{weight,bias}`` head.  ``PT_INCEPTION_CONV_MODULES`` below is the
vendored authoritative module list — the importer asserts it consumes 100%
of the state dict and fills 100% of the Flax tree, so a key naming drift on
either side fails loudly instead of silently dropping weights.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

__all__ = ["PT_INCEPTION_CONV_MODULES", "pt_inception_key_list",
           "import_pt_inception", "export_pt_inception"]


def _blocks() -> List[str]:
    stem = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
            "Conv2d_3b_1x1", "Conv2d_4a_3x3"]
    a = ["branch1x1", "branch5x5_1", "branch5x5_2",
         "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
    b = ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"]
    c = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
         "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
         "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
    d = ["branch3x3_1", "branch3x3_2",
         "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"]
    e = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
         "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
         "branch3x3dbl_3b", "branch_pool"]
    mods = list(stem)
    for mixed in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        mods += [f"{mixed}.{m}" for m in a]
    mods += [f"Mixed_6a.{m}" for m in b]
    for mixed in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        mods += [f"{mixed}.{m}" for m in c]
    mods += [f"Mixed_7a.{m}" for m in d]
    for mixed in ("Mixed_7b", "Mixed_7c"):
        mods += [f"{mixed}.{m}" for m in e]
    return mods


PT_INCEPTION_CONV_MODULES: List[str] = _blocks()  # 94 conv blocks
assert len(PT_INCEPTION_CONV_MODULES) == 94

_BN_KEYS = ("weight", "bias", "running_mean", "running_var",
            "num_batches_tracked")


def pt_inception_key_list() -> List[str]:
    """Every key in the canonical pt_inception-2015-12-05 state dict."""
    keys = []
    for mod in PT_INCEPTION_CONV_MODULES:
        keys.append(f"{mod}.conv.weight")
        keys += [f"{mod}.bn.{k}" for k in _BN_KEYS]
    keys += ["fc.weight", "fc.bias"]
    return keys


def import_pt_inception(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torch state dict -> Flax variables ``{"params", "batch_stats"}`` for
    ``metrics.fid.InceptionV3``.  Asserts full key consumption."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, dotted, leaf):
        node = tree
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    consumed = set()
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    # every weight-bearing key must be present (the fc head and the
    # bookkeeping num_batches_tracked counters are optional)
    required = {k for k in pt_inception_key_list()
                if not k.startswith("fc.")
                and not k.endswith("num_batches_tracked")}
    missing = required - set(sd)
    assert not missing, f"state dict missing keys: {sorted(missing)[:8]}"

    for mod in PT_INCEPTION_CONV_MODULES:
        w = sd[f"{mod}.conv.weight"]  # (O, I, kh, kw) -> (kh, kw, I, O)
        put(params, f"{mod}.conv.kernel", w.transpose(2, 3, 1, 0))
        put(params, f"{mod}.bn.scale", sd[f"{mod}.bn.weight"])
        put(params, f"{mod}.bn.bias", sd[f"{mod}.bn.bias"])
        put(stats, f"{mod}.bn.mean", sd[f"{mod}.bn.running_mean"])
        put(stats, f"{mod}.bn.var", sd[f"{mod}.bn.running_var"])
        consumed.update(
            {f"{mod}.conv.weight"} | {f"{mod}.bn.{k}" for k in _BN_KEYS})
    consumed.update({"fc.weight", "fc.bias"})  # classifier head: unused

    leftover = set(sd) - consumed
    assert not leftover, f"unconsumed pt_inception keys: {sorted(leftover)[:8]}"
    return {"params": params, "batch_stats": stats}


def export_pt_inception(variables: Dict) -> Dict[str, np.ndarray]:
    """Flax variables -> torch-layout state dict (roundtrip testing / interop).
    ``num_batches_tracked`` is emitted as 0 and ``fc`` omitted (pool3-only)."""
    import flax

    out: Dict[str, np.ndarray] = {}
    flat_p = flax.traverse_util.flatten_dict(variables["params"], sep=".")
    flat_s = flax.traverse_util.flatten_dict(variables["batch_stats"], sep=".")
    for mod in PT_INCEPTION_CONV_MODULES:
        out[f"{mod}.conv.weight"] = np.asarray(
            flat_p[f"{mod}.conv.kernel"]).transpose(3, 2, 0, 1)
        out[f"{mod}.bn.weight"] = np.asarray(flat_p[f"{mod}.bn.scale"])
        out[f"{mod}.bn.bias"] = np.asarray(flat_p[f"{mod}.bn.bias"])
        out[f"{mod}.bn.running_mean"] = np.asarray(flat_s[f"{mod}.bn.mean"])
        out[f"{mod}.bn.running_var"] = np.asarray(flat_s[f"{mod}.bn.var"])
        out[f"{mod}.bn.num_batches_tracked"] = np.zeros((), np.int64)
    return out
