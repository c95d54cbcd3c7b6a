"""Video (clip) dataset + collate for DualDiff+ stages 1/2.

The reference repo ships no video code (SURVEY.md §0); these are designed
from the DualDiff+ papers (arXiv 2503.03689, 2505.01857): 16-frame clips,
per-frame conditioning identical to the image stage, ST-Attn + temporal
attention inside the UNet.

Clip batch layout contract: frame OUTER, camera INNER — every per-frame
tensor flattens (B, F) into the image-stage batch dim, so the whole image
conditioning stack is reused verbatim; only the UNet's temporal modules see
the frame structure (``num_frames`` attr).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .collate import collate_fn
from .synthetic import SyntheticNuScenes

__all__ = ["SyntheticNuScenesVideo", "ClipDataset", "collate_video"]


class ClipDataset:
    """Group a frame-level dataset into fixed-length clips (consecutive
    indices; nuScenes keyframes are time-ordered in the infos pkl)."""

    def __init__(self, frames, num_frames: int = 16, stride: Optional[int] = None):
        self.frames = frames
        self.num_frames = num_frames
        self.stride = stride or num_frames

    def __len__(self):
        n = (len(self.frames) - self.num_frames) // self.stride + 1
        return max(n, 0)

    def __getitem__(self, idx: int) -> List[Dict]:
        start = idx * self.stride
        return [self.frames[start + i] for i in range(self.num_frames)]


class SyntheticNuScenesVideo(ClipDataset):
    """Synthetic clips with temporally coherent boxes (same scene seed,
    drifting positions)."""

    def __init__(self, num_clips: int = 4, num_frames: int = 8,
                 image_size=(224, 400), seed: int = 0):
        frames = SyntheticNuScenes(
            num_samples=num_clips * num_frames, image_size=image_size,
            seed=seed)
        super().__init__(frames, num_frames=num_frames)


def collate_video(clips: Sequence[List[Dict]], cfg, tokenizer,
                  is_train: bool = True,
                  rng: Optional[np.random.Generator] = None) -> Dict:
    """Collate a batch of clips: per-frame collate, stacked then flattened
    (B, F) -> batch dim.  Adds ``num_frames``/``clip_batch`` meta."""
    rng = rng or np.random.default_rng()
    B, F = len(clips), len(clips[0])
    flat = [frame for clip in clips for frame in clip]  # frame-outer per clip
    batch = collate_fn(flat, cfg, tokenizer, is_train=is_train, rng=rng)
    batch["num_frames"] = F
    batch["clip_batch"] = B
    return batch
