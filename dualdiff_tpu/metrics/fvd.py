"""FVD — Frechet Video Distance for the DualDiff+ video stage.

Canonical FVD uses I3D logits; the I3D weights are external assets.  This
implementation separates the *metric* (Frechet distance over per-clip
features) from the *feature extractor*:

* with an I3D-style extractor provided (``clip_features_fn``), this computes
  standard FVD;
* the built-in fallback builds clip features from frame-level features
  (e.g. the FID Inception pool3): ``[mean_t(f), std_t(f), mean_t(|df/dt|)]``
  — capturing appearance + temporal dynamics.  Relative comparisons only;
  clearly labeled, not comparable to published FVD numbers.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .fid import frechet_distance, compute_statistics

__all__ = ["clip_features_from_frames", "fvd_from_features"]


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
