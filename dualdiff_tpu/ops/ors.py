"""ORS — Occupancy Ray-shape Sampling as a device-side gather op.

The reference ray-marches on the CPU per sample (reference
``magicdrive/networks/occ3d_proj.py:50-113``): build per-pixel rays from
K/Rt, sample 320 points at 0.2 m, one-hot the 200x200x16 occupancy volume and
``F.grid_sample`` (nearest) + argmax.  One-hot + grid_sample of an integer
label volume is just an integer gather — so on TPU the whole op is:

  ray dirs (matmul) -> sample points (outer product) -> voxel indices
  (elementwise) -> flat gather from the int8 label volume.

No one-hot, no interpolation, HBM-resident output, fully batched over
cameras and samples, jit-friendly.  The depth axis (320 samples) doubles as
the 320 conditioning channels consumed raw by the ControlNet
(``unet_addon_rawbox.py:967-970``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["occupancy_ray_sample", "filter_fg_bg"]

FREE_CLASS = 17  # Occ3D 'not occupied'


def occupancy_ray_sample(
    occ_labels: jnp.ndarray,  # (B, 200, 200, 16) int — semantics[x, y, z]
    cam_K: jnp.ndarray,  # (B, N_cam, 3, 3) intrinsics
    cam_T: jnp.ndarray,  # (B, N_cam, 4, 4) camera->ego pose
    out_hw: Tuple[int, int],  # latent resolution, e.g. (28, 50) @ 224x400
    image_hw: Tuple[int, int] = (896, 1600),  # frame the intrinsics refer to
    sample_point: int = 320,
    sample_step: float = 0.2,
) -> jnp.ndarray:
    """-> (B, N_cam, h, w, sample_point) int32 semantic ray tensor (0..17).

    Pixel sampling mirrors the reference: the output grid subsamples the
    full-resolution pixel grid by ``compress_ratio = out/in`` and indexes
    pixels ``floor(i / ratio) ... `` — i.e. pixel (u, v) of the original
    frame with u = floor(x_out / ratio_w) — matching ``occ3d_proj.py:78-84``.
    """
    B, n_cam = cam_K.shape[:2]
    h, w = out_hw
    ih, iw = image_hw
    # reference: grid = arange(out) // compress_ratio with
    # compress_ratio = out/in ... expressed as full-res pixel index:
    ratio_h, ratio_w = h / ih, w / iw
    u = (np.arange(w) / ratio_w).astype(np.float32)  # x pixel
    v = (np.arange(h) / ratio_h).astype(np.float32)  # y pixel
    uu, vv = np.meshgrid(u, v)  # (h, w)
    pix = jnp.asarray(
        np.stack([uu, vv, np.ones_like(uu)], -1).reshape(-1, 3))  # (h*w, 3)

    K_inv = jnp.linalg.inv(cam_K.astype(jnp.float32))  # (B, N, 3, 3)
    R = cam_T[..., :3, :3].astype(jnp.float32)
    t = cam_T[..., :3, 3].astype(jnp.float32)
    # ray directions in ego frame, normalized (reference compute_rays)
    d = jnp.einsum("bnij,pj->bnpi", jnp.einsum("bnij,bnjk->bnik", R, K_inv), pix)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    steps = jnp.arange(sample_point, dtype=jnp.float32) * sample_step
    # points: (B, N, P, S, 3)
    pts = t[:, :, None, None, :] + steps[None, None, None, :, None] * d[:, :, :, None, :]

    # normalize into the Occ3D voxel grid (reference occ3d_proj.py:93-96):
    # x, y in [-40, 40] m; z in [-1, 5.4] m over 16 voxels
    gx = pts[..., 0] / 40.0
    gy = pts[..., 1] / 40.0
    gz = (pts[..., 2] / 40.0) * 40.0 / 3.2 - 2.2 / 3.2
    # nearest voxel, align_corners=False: idx = floor((g+1) * S / 2)
    ix = jnp.floor((gx + 1.0) * 100.0).astype(jnp.int32)  # 200 / 2
    iy = jnp.floor((gy + 1.0) * 100.0).astype(jnp.int32)
    iz = jnp.floor((gz + 1.0) * 8.0).astype(jnp.int32)  # 16 / 2
    oob = (
        (ix < 0) | (ix >= 200) | (iy < 0) | (iy >= 200) | (iz < 0) | (iz >= 16)
    )
    ixc = jnp.clip(ix, 0, 199)
    iyc = jnp.clip(iy, 0, 199)
    izc = jnp.clip(iz, 0, 15)
    # row gather + z-select: gathering whole 16-voxel z-columns then
    # selecting z on the VPU cuts gather descriptors 16x (measured 49.7 vs
    # 58.2 ms at the B=2 generate shape — TPU gathers are descriptor-bound)
    flatxy = ixc * 200 + iyc  # (B, N, P, S)
    planes = occ_labels.reshape(B, 200 * 200, 16).astype(jnp.int8)
    rows = jax.vmap(lambda p, i: jnp.take(p, i, axis=0))(
        planes, flatxy.reshape(B, -1))  # (B, NPS, 16)
    zsel = (jnp.arange(16, dtype=jnp.int32)[None, None, :]
            == izc.reshape(B, -1)[..., None])
    sem = jnp.sum(jnp.where(zsel, rows.astype(jnp.int32), 0), axis=-1)
    sem = sem.reshape(flatxy.shape)
    sem = jnp.where(oob, FREE_CLASS, sem)
    # label 0 ('undefined') inside the volume stays 0 (one-hot channel 0
    # exists in the reference too); out-of-bounds becomes free space (17).
    return sem.reshape(B, n_cam, h, w, sample_point)


def filter_fg_bg(
    sem: jnp.ndarray, keep_fg: bool, keep_bg: bool,
    fg_max_class: int = 10, bg_min_class: int = 11,
) -> jnp.ndarray:
    """Foreground/background class filtering + [0, 1] normalization
    (reference collate, dataset/utils.py:413-420)."""
    out = sem
    if not keep_fg:
        out = jnp.where(out <= fg_max_class, FREE_CLASS, out)
    if not keep_bg:
        out = jnp.where(out >= bg_min_class, FREE_CLASS, out)
    return out.astype(jnp.float32) / float(FREE_CLASS)
