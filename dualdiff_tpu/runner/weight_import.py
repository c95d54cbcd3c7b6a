"""Torch/diffusers checkpoint -> Flax param importer.

The reference loads pretrained SD v1.5 + ControlNet weights through diffusers
``from_pretrained`` (reference ``multiview_runner.py:142-211``,
``test_utils.py:97-171``).  Here we translate diffusers/transformers
state-dict names directly into our param trees:

* Conv2d  (O, I, kh, kw) -> (kh, kw, I, O)
* Linear  (O, I)         -> (I, O)
* Norm weight/bias       -> scale/bias
* Embedding weight       -> embedding table (no transpose)

Entry points take a ``state_dict``-like mapping of numpy arrays (use
``load_torch_file`` for ``.bin``/``.safetensors``).
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import flax
import numpy as np

__all__ = [
    "import_unet",
    "import_controlnet",
    "import_vae",
    "import_clip_text",
    "merge_imported",
    "load_torch_file",
]


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


# leaves that are raw parameters (no weight/bias suffix, no transpose)
_RAW_LEAVES = (
    "uncond_cam", "class_tokens", "null_pos_feature", "null_class_feature",
    "position_embedding", "alpha",
)


def _leaf_and_value(parts, value: np.ndarray):
    name = parts[-1]
    if name in _RAW_LEAVES:
        return name, value
    mod = parts[-2] if len(parts) >= 2 else ""
    if name == "weight":
        if value.ndim == 1:
            return "scale", value  # any 1-d weight is a norm scale
        if "embedding" in mod and value.ndim == 2 and mod != "time_embedding":
            return "embedding", value
        if value.ndim == 4:
            return "kernel", np.transpose(value, (2, 3, 1, 0))
        if value.ndim == 2:
            return "kernel", value.T
    return name, value


def _import_tree(state_dict: Mapping[str, np.ndarray], rules, skip=()):
    flat = {}
    for tk, v in state_dict.items():
        if any(s in tk for s in skip):
            continue
        name = tk
        for pat, rep in rules:
            name = re.sub(pat, rep, name)
        parts = name.split(".")
        leaf, val = _leaf_and_value(parts, np.asarray(v))
        flat[tuple(parts[:-1]) + (leaf,)] = val
    return flax.traverse_util.unflatten_dict(flat)


_ATTN_RULES = [
    (r"ff\.net\.0\.proj", "ff.net_0_proj"),
    (r"ff\.net\.2", "ff.net_2"),
    (r"to_out\.0", "to_out_0"),
]
_INDEX = (r"\.(\d+)\.", r"_\1.")


def import_unet(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """diffusers ``UNet2DConditionModel`` -> our UNet params.  New
    multiview/video modules are absent from SD checkpoints; merge the result
    over an initialized tree (they keep their zero-init)."""
    rules = _ATTN_RULES + [_INDEX]
    return _import_tree(state_dict, rules, skip=("time_proj",))


def import_controlnet(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Reference BEVControlNetModel / diffusers ControlNet state dict ->
    our BEVControlNet params."""
    rules = _ATTN_RULES + [
        (r"bbox_embedder\._class_tokens", "bbox_embedder.class_tokens"),
        (r"uncond_cam\.weight", "uncond_cam"),
        _INDEX,
    ]
    return _import_tree(state_dict, rules, skip=("time_proj",))


def import_vae(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """diffusers ``AutoencoderKL`` -> our VAE params (flattened block names:
    ``down_blocks_0_resnets_1``, ``mid_attn``, ...)."""
    rules = [
        (r"to_out\.0", "to_out_0"),
        # pre-0.15-diffusers dumps (the original hub SD v1.5 VAE) use the
        # legacy attention names; newer re-dumps use to_q/to_k/to_v/to_out.0
        (r"attentions\.0\.query", "attentions.0.to_q"),
        (r"attentions\.0\.key", "attentions.0.to_k"),
        (r"attentions\.0\.value", "attentions.0.to_v"),
        (r"attentions\.0\.proj_attn", "attentions.0.to_out_0"),
        (r"mid_block\.attentions\.0", "mid_attn"),
        (r"mid_block\.resnets\.(\d+)", r"mid_resnets_\1"),
        (r"(down|up)_blocks\.(\d+)\.resnets\.(\d+)",
         r"\1_blocks_\2_resnets_\3"),
        (r"(down|up)_blocks\.(\d+)\.(down|up)samplers\.0\.conv",
         r"\1_blocks_\2_\3samplers_0"),
        _INDEX,
    ]
    return _import_tree(state_dict, rules)


def import_clip_text(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """transformers ``CLIPTextModel`` -> our CLIPTextModel params."""
    rules = [
        (r"^text_model\.", ""),
        (r"embeddings\.token_embedding", "token_embedding"),
        (r"embeddings\.position_embedding\.weight", "position_embedding"),
        (r"encoder\.layers\.(\d+)", r"layers_\1"),
        (r"mlp\.fc1", "mlp_fc1"),
        (r"mlp\.fc2", "mlp_fc2"),
        (r"out_proj", "out_proj"),
        _INDEX,
    ]
    sd = {k: v for k, v in state_dict.items() if "position_ids" not in k}
    return _import_tree(sd, rules)


# ----------------------------------------------------------------------
# Exporters (inverse mapping): our params -> diffusers/transformers-style
# state dicts, so checkpoints stay consumable by torch stacks (and so the
# import/export pair can be roundtrip-tested without real SD assets).
# ----------------------------------------------------------------------

_LISTY = (
    "resnets", "attentions", "transformer_blocks", "down_blocks", "up_blocks",
    "downsamplers", "upsamplers", "layers", "blocks",
    "controlnet_down_blocks", "second_linear",
)


def _to_torch_name(path: Tuple[str, ...], kind: str) -> str:
    parts = []
    for p in path:
        m = re.fullmatch(r"(" + "|".join(_LISTY) + r")_(\d+)", p)
        if m:
            parts.extend([m.group(1), m.group(2)])
        else:
            parts.append(p)
    name = ".".join(parts)
    name = name.replace("net_0_proj", "net.0.proj").replace("net_2", "net.2")
    name = name.replace("to_out_0", "to_out.0")
    name = re.sub(r"\.kernel$", ".weight", name)
    name = re.sub(r"\.scale$", ".weight", name)
    name = re.sub(r"\.embedding$", ".weight", name)
    if kind == "vae":
        name = re.sub(r"mid_attn", "mid_block.attentions.0", name)
        name = re.sub(r"mid_resnets\.(\d+)" if False else r"mid_resnets_(\d+)",
                      r"mid_block.resnets.\1", name)
        name = re.sub(
            r"(down|up)_blocks_(\d+)_resnets_(\d+)",
            r"\1_blocks.\2.resnets.\3", name)
        name = re.sub(
            r"(down|up)_blocks_(\d+)_(down|up)samplers_0",
            r"\1_blocks.\2.\3samplers.0.conv", name)
    if kind == "clip":
        name = re.sub(r"^layers\.", "encoder.layers.", name)
        name = name.replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2")
        name = name.replace("token_embedding", "embeddings.token_embedding")
        if name.startswith("position_embedding"):
            name = "embeddings.position_embedding.weight"
        name = "text_model." + name
    if kind == "controlnet":
        name = name.replace("bbox_embedder.class_tokens",
                            "bbox_embedder._class_tokens")
        if name == "uncond_cam":
            name = "uncond_cam.weight"
    return name


def export_params(params: Dict, kind: str) -> Dict[str, np.ndarray]:
    """kind in {unet, controlnet, vae, clip}."""
    out = {}
    for path, v in flax.traverse_util.flatten_dict(params).items():
        v = np.asarray(v)
        leaf = path[-1]
        if leaf == "kernel":
            v = np.transpose(v, (3, 2, 0, 1)) if v.ndim == 4 else v.T
        out[_to_torch_name(path, kind)] = v
    return out


def merge_imported(initialized: Dict, imported: Dict, strict: bool = False):
    """Overlay imported leaves onto an initialized tree (new multiview params
    keep their init — the reference's ``ignore_mismatched_sizes`` load path,
    ``multiview_runner.py:178-179``).  -> (params, missing, unexpected)."""
    base = dict(flax.traverse_util.flatten_dict(initialized))
    imp = flax.traverse_util.flatten_dict(imported)
    missing = [k for k in base if k not in imp]
    unexpected = []
    for k, v in imp.items():
        if k in base:
            if tuple(base[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {k}: {base[k].shape} vs {v.shape}")
            base[k] = v.astype(base[k].dtype)
        else:
            unexpected.append(k)
    if strict and unexpected:
        raise KeyError(f"unexpected imported keys: {unexpected[:10]}")
    return flax.traverse_util.unflatten_dict(base), missing, unexpected
