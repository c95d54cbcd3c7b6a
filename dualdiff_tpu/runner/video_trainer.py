"""Video trainer: DualDiff+ stage 1 (ST-Attn/temporal) + stage 2 (RGD).

Designed from the DualDiff+ papers (arXiv 2503.03689, 2505.01857) — the
reference repo contains no video code (SURVEY.md §0).

Stage 1: 16-frame clips; the image-stage conditioning path runs per frame
(the clip flattens into the batch dim, frame-outer/camera-inner); ST-Attn
and temporal attention in the UNet couple the frames; one shared timestep
per clip.

Stage 2 (Reward-Guided Diffusion): freeze everything except LoRA adapters on
the UNet attention projections; add a reward term computed on the decoded
denoised prediction plus the FGM foreground-masked loss.  The reward model
is pluggable (``reward_fn(pred_images, gt_images, batch) -> per-image
score``); the config default is the paper's FGM-masked foreground-fidelity
reward + temporal motion consistency (``runner/rewards.py``), selectable via
``video.rgd.reward`` (``mse_proxy`` keeps the simple reconstruction proxy).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.video import collate_video
from .rewards import make_rgd_reward, mse_proxy_reward
from .trainer import MultiviewTrainer, make_train_step, prepare_batch

log = logging.getLogger(__name__)

__all__ = ["VideoTrainer", "default_reward_fn"]

# back-compat alias; the config-selected default is make_rgd_reward(cfg)
default_reward_fn = mse_proxy_reward


class VideoTrainer(MultiviewTrainer):
    """Trains on clip datasets (``__getitem__`` returns a list of frame
    samples).  ``cfg.use_video`` must be set so the factory builds the UNet
    with ST-Attn/temporal modules (and LoRA when rgd.enable)."""

    def __init__(self, cfg, train_set, val_set=None, tiny: bool = False,
                 mesh=None, reward_fn: Optional[Callable] = None):
        assert bool(cfg.get("use_video")), "VideoTrainer needs use_video=true"
        self.num_frames = int(cfg.video.num_frames)
        self._reward_fn = reward_fn
        super().__init__(cfg, train_set, val_set, tiny=tiny, mesh=mesh)
        rgd = bool(cfg.video.rgd.enable)
        from ..parallel.mesh import replicate

        repl = replicate(self.mesh)
        self.train_step = jax.jit(make_train_step(
            self.models, cfg, self.schedule, self.tx, self.latent_hw,
            self.image_hw, frames=self.num_frames,
            reward_fn=(reward_fn or make_rgd_reward(cfg)) if rgd else None,
            reward_weight=float(cfg.video.rgd.reward_weight) if rgd else 0.0,
            cached_cond=self.cache_cond,
            # frame-subset reward estimate (r5): the reward's image-res VAE
            # decode fwd+bwd dominates the RGD step — video.rgd.reward_frames
            # decodes only that many leading frames per clip
            reward_frames=int(cfg.video.rgd.get("reward_frames") or 0)
            if rgd else 0,
        ), donate_argnums=(0,), out_shardings=(repl, repl))

    # clip datasets return a list of frames per item; the base trainer's
    # batch plumbing (plan -> build -> prefetch) applies unchanged
    def _collate_items(self, items, rng, pre_augmented: bool = False):
        if not pre_augmented:
            items, _ = self._augment_items(items, rng)
        return collate_video(items, self.cfg, self.tokenizer, rng=rng)

    def _augment_items(self, items, rng):
        """Clip-consistent RandomFlip3DwithViews: one flip decision per
        clip, applied to every frame (a per-frame draw would decorrelate
        the temporal stream ST-Attn trains on).  Inert at the config
        default flip_ratio=0."""
        flip = float((self.cfg.dataset.get("augment3d") or {})
                     .get("flip_ratio") or 0.0)
        if flip <= 0:
            return items, [False] * len(items)
        from ..data.augment import random_flip_3d_with_views

        out, flags = [], []
        for clip in items:
            do = bool(rng.random() < flip)
            if do:
                clip = [random_flip_3d_with_views(fr, rng, flip_ratio=1.0)
                        for fr in clip]
            out.append(clip)
            flags.append(do)
        return out, flags

    def _cond_keys(self, idxs, flips):
        # collate_video flattens frame-outer per clip; the conditioning
        # cache keys each row as (clip id, frame index, flip)
        return [(i, f, fl)
                for i, fl in zip(idxs, flips)
                for f in range(self.num_frames)]
