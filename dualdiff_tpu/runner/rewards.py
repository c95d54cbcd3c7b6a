"""RGD reward models (DualDiff+ stage 2, arXiv 2505.01857).

The paper's reward guides the denoised prediction toward (a) faithful
foreground objects — the heavy-tailed failure mode of driving-video
diffusion — and (b) temporally consistent motion.  The reference repo ships
no video/RGD code (SURVEY.md §0); these are designed from the paper:

* ``fgm_foreground_reward`` — negative reconstruction error re-weighted by
  the FGM box heatmap (same rasterizer as the aug loss, ``ops/fgm.py``),
  upsampled to image resolution: errors inside projected 3D-box hulls count
  ~`1 + fg_boost x heat` times more than background.
* ``temporal_consistency_reward`` — negative mismatch between predicted and
  ground-truth frame-to-frame motion (clips fold into the batch dim
  frame-outer, so adjacent batch rows of one clip are adjacent frames).
* ``make_rgd_reward(cfg)`` — the config-selected combination; stays
  compatible with the pluggable ``reward_fn(pred, gt, batch)`` hook.

Rewards are maximized (the trainer subtracts ``reward_weight * reward``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.fgm import fgm_heatmap

__all__ = [
    "mse_proxy_reward",
    "fgm_foreground_reward",
    "temporal_consistency_reward",
    "make_rgd_reward",
]


def mse_proxy_reward(pred: jnp.ndarray, gt: jnp.ndarray,
                     batch) -> jnp.ndarray:
    """Reconstruction-proxy reward: negative pixel MSE (documented
    stand-in; per-image, shape (B*N,))."""
    return -jnp.mean(
        (pred.astype(jnp.float32) - gt.astype(jnp.float32)) ** 2,
        axis=(1, 2, 3))


def _image_heat(batch, hw) -> jnp.ndarray:
    """FGM heatmap rasterized coarse (latent-res) then nearest-upsampled to
    image res — the hull raster is O(h*w*max_len*8) so full-res rasterizing
    would dominate the step; box hulls are blocky anyway. -> (B*N, H, W)."""
    h, w = hw
    heat = fgm_heatmap(batch["fgm_bboxes"], batch["fgm_masks"],
                       batch["fgm_lidar2image"], (w // 8, h // 8))
    b, n = heat.shape[:2]
    heat = heat.reshape(b * n, *heat.shape[2:])
    return jax.image.resize(heat, (b * n, h, w), method="nearest")


def fgm_foreground_reward(pred: jnp.ndarray, gt: jnp.ndarray, batch,
                          fg_boost: float = 4.0) -> jnp.ndarray:
    """Foreground-fidelity reward (paper's FGM-masked term): negative MSE
    with per-pixel weight ``1 + fg_boost * heat`` normalized to mean 1, so
    the scale matches the plain-MSE proxy but box interiors dominate."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    heat = _image_heat(batch, pred.shape[1:3])  # (B*N, H, W)
    wgt = 1.0 + fg_boost * heat
    wgt = wgt / jnp.mean(wgt, axis=(1, 2), keepdims=True)
    return -jnp.mean(((pred - gt) ** 2) * wgt[..., None], axis=(1, 2, 3))


def temporal_consistency_reward(pred: jnp.ndarray, gt: jnp.ndarray,
                                frames: int, n_cam: int) -> jnp.ndarray:
    """Motion-fidelity reward: negative MSE between predicted and GT
    frame-difference fields.  ``pred/gt`` are (clips*frames*n_cam, H, W, 3)
    frame-outer/camera-inner; returns one score per input image (the
    per-clip score broadcast back, so it averages like the other terms)."""
    bn = pred.shape[0]
    clips = bn // (frames * n_cam)
    shp = (clips, frames, n_cam) + pred.shape[1:]
    dp = jnp.diff(pred.astype(jnp.float32).reshape(shp), axis=1)
    dg = jnp.diff(gt.astype(jnp.float32).reshape(shp), axis=1)
    score = -jnp.mean((dp - dg) ** 2, axis=(1, 2, 3, 4, 5))  # (clips,)
    return jnp.repeat(score, frames * n_cam)


def make_rgd_reward(cfg):
    """Config-selected reward: ``video.rgd.reward`` in
    {mse_proxy, fgm_foreground}; ``video.rgd.temporal_weight`` > 0 adds the
    motion-consistency term."""
    rgd = cfg.video.rgd
    name = str(rgd.get("reward", "fgm_foreground"))
    fg_boost = float(rgd.get("fg_boost", 4.0))
    t_weight = float(rgd.get("temporal_weight", 0.5))
    # with video.rgd.reward_frames the trainer passes the reward a per-clip
    # frame PREFIX — the temporal fold must match what the reward sees
    frames = int(rgd.get("reward_frames") or cfg.video.num_frames)

    def reward(pred, gt, batch):
        if name == "fgm_foreground" and "fgm_bboxes" in batch:
            r = fgm_foreground_reward(pred, gt, batch, fg_boost=fg_boost)
        else:
            r = mse_proxy_reward(pred, gt, batch)
        if t_weight > 0 and frames > 1:
            # camera_param is always collated; pixel_values is dropped from
            # cached-conditioning batches when no loss term needs pixels
            n_cam = batch["camera_param"].shape[1]
            r = r + t_weight * temporal_consistency_reward(
                pred, gt, frames, n_cam)
        return r

    return reward
