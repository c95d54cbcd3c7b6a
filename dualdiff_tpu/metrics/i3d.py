"""I3D (Inflated 3D Inception) in Flax for canonical FVD.

Architecture + state-dict naming follow the standard pytorch port
(``i3d_pretrained_400.pt`` — piergiaj/pytorch-i3d `InceptionI3d`, the
weights every public FVD implementation loads; the reference's FVD eval
uses the same Kinetics-400 I3D).  Layout is NDHWC; convolutions and pools
use TF-style SAME padding like the original TF hub model.

``import_i3d`` maps that torch state dict onto this module with a vendored
authoritative key list and hard asserts (same policy as
``metrics/fid_import.py``): any dropped or mistransposed key fails loudly.

Feature conventions: ``InceptionI3d.__call__`` returns ``(logits_400,
pool_1024)`` per clip.  Canonical FVD uses the 400-d logits (the original
TF frechet_video_distance feeds `logits`); the 1024-d average-pooled
features are exposed for the StyleGAN-V-style variant.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["InceptionI3d", "I3D_CONV_UNITS", "i3d_key_list", "import_i3d"]

Dtype = Any

# [b0, b1a, b1b, b2a, b2b, b3b] output channels per inception module
_MIXED: List[Tuple[str, Tuple[int, int, int, int, int, int]]] = [
    ("Mixed_3b", (64, 96, 128, 16, 32, 32)),
    ("Mixed_3c", (128, 128, 192, 32, 96, 64)),
    ("Mixed_4b", (192, 96, 208, 16, 48, 64)),
    ("Mixed_4c", (160, 112, 224, 24, 64, 64)),
    ("Mixed_4d", (128, 128, 256, 24, 64, 64)),
    ("Mixed_4e", (112, 144, 288, 32, 64, 64)),
    ("Mixed_4f", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5b", (256, 160, 320, 32, 128, 128)),
    ("Mixed_5c", (384, 192, 384, 48, 128, 128)),
]


class Unit3D(nn.Module):
    out: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, self.kernel, strides=self.strides,
                    padding="SAME", use_bias=not self.use_bn,
                    dtype=self.dtype, name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                             dtype=jnp.float32, name="bn")(x)
        return nn.relu(x) if self.relu else x


def _maxpool_same(x, kernel, strides):
    return nn.max_pool(x, kernel, strides=strides, padding="SAME")


class InceptionModule(nn.Module):
    ch: Tuple[int, int, int, int, int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c0, c1a, c1b, c2a, c2b, c3b = self.ch
        b0 = Unit3D(c0, dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(c1a, dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(c1b, (3, 3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(c2a, dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(c2b, (3, 3, 3), dtype=self.dtype, name="b2b")(b2)
        b3 = _maxpool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(c3b, dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], -1)


class InceptionI3d(nn.Module):
    """Input (B, T, H, W, 3) in [-1, 1], T >= 9, HxW nominally 224x224.
    Returns (logits (B, 400), pooled (B, 1024))."""

    num_classes: int = 400
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="Conv3d_1a_7x7")(x)
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, dtype=self.dtype, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="Conv3d_2c_3x3")(x)
        x = _maxpool_same(x, (1, 3, 3), (1, 2, 2))
        for name, ch in _MIXED[:2]:
            x = InceptionModule(ch, dtype=self.dtype, name=name)(x)
        x = _maxpool_same(x, (3, 3, 3), (2, 2, 2))
        for name, ch in _MIXED[2:7]:
            x = InceptionModule(ch, dtype=self.dtype, name=name)(x)
        x = _maxpool_same(x, (2, 2, 2), (2, 2, 2))
        for name, ch in _MIXED[7:]:
            x = InceptionModule(ch, dtype=self.dtype, name=name)(x)
        # global spatial average; the torch port avg-pools (2,7,7) then
        # averages remaining frames — equivalent up to edge effects, and
        # exact for the canonical 224x224 input it was exported for
        pooled_t = jnp.mean(x, axis=(2, 3))  # (B, T', 1024)
        logits_t = Unit3D(self.num_classes, use_bn=False, relu=False,
                          dtype=self.dtype, name="logits")(
            pooled_t[:, :, None, None, :])[:, :, 0, 0, :]
        return jnp.mean(logits_t, 1), jnp.mean(pooled_t, 1)


# ------------------------------------------------------------------ import

def _stem_units() -> List[str]:
    return ["Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3"]


I3D_CONV_UNITS: List[str] = _stem_units() + [
    f"{mixed}.{b}" for mixed, _ in _MIXED
    for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")
]  # 3 + 9*6 = 57 BN conv units (+ the bias-only logits conv)

_BN_KEYS = ("weight", "bias", "running_mean", "running_var",
            "num_batches_tracked")


def i3d_key_list() -> List[str]:
    keys = []
    for mod in I3D_CONV_UNITS:
        keys.append(f"{mod}.conv3d.weight")
        keys += [f"{mod}.bn.{k}" for k in _BN_KEYS]
    keys += ["logits.conv3d.weight", "logits.conv3d.bias"]
    return keys


def import_i3d(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torch ``i3d_pretrained_400.pt`` state dict -> Flax variables
    ``{"params", "batch_stats"}``.  Conv3d (O, I, kt, kh, kw) ->
    (kt, kh, kw, I, O).  Asserts 100% consumption both ways."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, dotted, leaf):
        node = tree
        parts = dotted.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    required = {k for k in i3d_key_list()
                if not k.endswith("num_batches_tracked")}
    missing = required - set(sd)
    assert not missing, f"i3d state dict missing keys: {sorted(missing)[:8]}"

    consumed = set()
    for mod in I3D_CONV_UNITS:
        w = sd[f"{mod}.conv3d.weight"]
        put(params, f"{mod}.conv3d.kernel", w.transpose(2, 3, 4, 1, 0))
        put(params, f"{mod}.bn.scale", sd[f"{mod}.bn.weight"])
        put(params, f"{mod}.bn.bias", sd[f"{mod}.bn.bias"])
        put(stats, f"{mod}.bn.mean", sd[f"{mod}.bn.running_mean"])
        put(stats, f"{mod}.bn.var", sd[f"{mod}.bn.running_var"])
        consumed.update(
            {f"{mod}.conv3d.weight"} | {f"{mod}.bn.{k}" for k in _BN_KEYS})
    put(params, "logits.conv3d.kernel",
        sd["logits.conv3d.weight"].transpose(2, 3, 4, 1, 0))
    put(params, "logits.conv3d.bias", sd["logits.conv3d.bias"])
    consumed.update({"logits.conv3d.weight", "logits.conv3d.bias"})

    leftover = set(sd) - consumed
    assert not leftover, f"unconsumed i3d keys: {sorted(leftover)[:8]}"
    return {"params": params, "batch_stats": stats}
