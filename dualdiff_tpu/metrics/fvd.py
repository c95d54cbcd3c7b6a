"""FVD — Frechet Video Distance for the DualDiff+ video stage.

Canonical FVD uses Kinetics-400 I3D features; ``metrics/i3d.py`` provides
the Flax I3D + importer for the standard ``i3d_pretrained_400.pt`` asset.
This module separates the *metric* (Frechet distance over per-clip
features) from the *feature extractor*:

* ``build_i3d_extractor`` loads the real I3D when the weights file is
  present — canonical FVD;
* the fallback builds clip features from frame-level features
  (e.g. the FID Inception pool3): ``[mean_t(f), std_t(f), mean_t(|df/dt|)]``
  — capturing appearance + temporal dynamics.  Relative comparisons only;
  clearly labeled, not comparable to published FVD numbers.
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Optional

import numpy as np

from .fid import frechet_distance, compute_statistics

__all__ = ["clip_features_from_frames", "fvd_from_features",
           "build_i3d_extractor", "i3d_features"]


def build_i3d_extractor(
    weights_path: str = "pretrained/i3d_pretrained_400.pt",
    feature: str = "logits",  # logits (canonical 400-d) | pool (1024-d)
):
    """-> (extract_fn, label) with extract_fn (B, T, H, W, 3) in [-1, 1] ->
    (B, d) features, or (None, 'fallback') when the asset is absent."""
    import jax

    from .i3d import InceptionI3d, import_i3d

    model = InceptionI3d()
    if os.path.exists(weights_path):
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        variables = import_i3d({k: v.numpy() for k, v in sd.items()})
        label = f"i3d_{feature}"
    else:
        print("# WARNING: I3D weights not found; FVD falls back to "
              "frame-feature statistics (relative comparisons only)",
              file=sys.stderr)
        return None, "fallback"

    idx = 0 if feature == "logits" else 1

    @jax.jit
    def extract(clips):
        return model.apply(variables, clips)[idx]

    return extract, label


def i3d_features(clips: np.ndarray, extract: Callable,
                 batch: int = 4) -> np.ndarray:
    """(N, T, H, W, 3) clips in [-1, 1] -> (N, d) I3D features."""
    import jax.numpy as jnp

    acts = []
    for i in range(0, len(clips), batch):
        acts.append(np.asarray(extract(jnp.asarray(clips[i:i + batch]))))
    return np.concatenate(acts)


def clip_features_from_frames(frame_feats: np.ndarray) -> np.ndarray:
    """(n_clips, n_frames, d) frame features -> (n_clips, 3d) clip features."""
    mean = frame_feats.mean(1)
    std = frame_feats.std(1)
    vel = np.abs(np.diff(frame_feats, axis=1)).mean(1)
    return np.concatenate([mean, std, vel], axis=-1)


def fvd_from_features(real: np.ndarray, generated: np.ndarray) -> float:
    """Frechet distance between clip-feature distributions."""
    return frechet_distance(*compute_statistics(real),
                            *compute_statistics(generated))
