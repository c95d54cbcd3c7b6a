"""FGM — Foreground-aware Masking heatmap, as a device-side vectorized op.

The reference rasterizes each projected box's convex hull on the CPU with
scipy/matplotlib double loops (reference ``magicdrive/networks/utils.py:
100-163`` — a major data-pipeline bottleneck).  Here the whole computation is
jnp: project corners (matmul), build the convex hull implicitly as the
intersection of supporting half-planes over all corner pairs, test the latent
grid in parallel, weight by ``1 - area/total`` and max-reduce over instances.

Semantics parity notes (vs process_one_instance_test):
* corners with camera z <= 0 are excluded (validity mask);
* projected coords are truncated toward zero (the reference ``astype(int)``);
* the grid test uses integer pixel centers (_x, _y);
* per-instance weight ``1 - area/(w*h)``; per-view max over instances.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fgm_heatmap", "fgm_heatmap_host"]


def _project_corners(
    corners: jnp.ndarray,  # (..., 8, 3) lidar-frame box corners
    lidar2image: jnp.ndarray,  # (..., 4, 4)
    resolution: Tuple[int, int],  # (w, h) of the latent grid
    image_size: Tuple[int, int] = (1600, 900),
):
    w, h = resolution
    iw, ih = image_size
    ones = jnp.ones((*corners.shape[:-1], 1), corners.dtype)
    hom = jnp.concatenate([corners, ones], axis=-1)  # (..., L, 8, 4)
    # (..., L, 8, 4) @ (..., 1, 4, 4)^T — broadcast transform over instances
    cam = jnp.matmul(hom, jnp.swapaxes(lidar2image, -1, -2)[..., None, :, :])
    z = cam[..., 2]
    valid = z > 0
    zc = jnp.clip(z, 1e-5, 1e5)
    x = cam[..., 0] / zc * (w / iw)
    y = cam[..., 1] / zc * (h / ih)
    # truncate toward zero like numpy astype(int)
    return jnp.trunc(x), jnp.trunc(y), valid


def _hull_mask(
    x: jnp.ndarray,  # (..., 8) projected corner x (truncated)
    y: jnp.ndarray,
    valid: jnp.ndarray,  # (..., 8) bool
    resolution: Tuple[int, int],
) -> jnp.ndarray:
    """(..., h, w) boolean inside-convex-hull masks, fully vectorized.

    A grid point p is inside hull(P) iff for every *supporting* directed edge
    (i, j) — one with all valid points on its non-negative side — p is also on
    the non-negative side."""
    w, h = resolution
    pts = jnp.stack([x, y], axis=-1)  # (..., 8, 2)
    pi = pts[..., :, None, :]  # (..., 8, 1, 2)
    pj = pts[..., None, :, :]  # (..., 1, 8, 2)
    e = pj - pi  # (..., 8, 8, 2) edge i->j
    # normal (pointing to the "left" of i->j)
    nx, ny = -e[..., 1], e[..., 0]
    # side of every point k w.r.t. edge (i, j)
    dkx = pts[..., None, None, :, 0] - pi[..., 0:1]  # (..., 8, 8, 8)
    dky = pts[..., None, None, :, 1] - pi[..., 1:2]
    side = nx[..., None] * dkx + ny[..., None] * dky  # (..., i, j, k)
    vk = valid[..., None, None, :]
    eps = 1e-6
    support = jnp.all((side >= -eps) | ~vk, axis=-1)  # (..., i, j)
    vij = valid[..., :, None] & valid[..., None, :]
    degen = jnp.sum(e * e, axis=-1) < eps  # coincident points
    support = support & vij & ~degen

    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    # side of each grid point w.r.t. each edge: (..., i, j, h, w)
    gside = (
        nx[..., None, None] * (gx - pi[..., 0:1][..., None])
        + ny[..., None, None] * (gy - pi[..., 1:2][..., None])
    )
    ok = (gside >= -eps) | ~support[..., None, None]
    inside = jnp.all(ok, axis=(-4, -3))  # (..., h, w)
    # hull needs >= 3 valid points to have area; also require any support edge
    has_hull = (jnp.sum(valid, axis=-1) >= 3) & jnp.any(support, axis=(-2, -1))
    return inside & has_hull[..., None, None]


def fgm_heatmap(
    bboxes: jnp.ndarray,  # (B, N_cam, max_len, 8, 3)
    masks: jnp.ndarray,  # (B, N_cam, max_len) bool — padded/fg flags
    lidar2image: jnp.ndarray,  # (B, N_cam, 4, 4)
    resolution: Tuple[int, int],  # (w, h), e.g. (50, 28) for 224x400
    image_size: Tuple[int, int] = (1600, 900),
) -> jnp.ndarray:
    """-> (B, N_cam, h, w) float32 heatmap GT (the aug-loss weight map)."""
    w, h = resolution
    x, y, valid = _project_corners(
        bboxes.astype(jnp.float32), lidar2image.astype(jnp.float32),
        resolution, image_size)
    valid = valid & masks[..., None]
    inside = _hull_mask(x, y, valid, resolution)  # (B, N, L, h, w)
    area = jnp.sum(inside, axis=(-2, -1)).astype(jnp.float32)
    weight = 1.0 - area / float(w * h)
    heat = inside.astype(jnp.float32) * weight[..., None, None]
    heat = heat * masks[..., None, None].astype(jnp.float32)
    return jnp.max(heat, axis=2)  # max over instances


def fgm_heatmap_host(
    bboxes: np.ndarray,
    masks: np.ndarray,
    lidar2image: np.ndarray,
    resolution: Tuple[int, int],
    image_size: Tuple[int, int] = (1600, 900),
) -> np.ndarray:
    """Reference-faithful host implementation (scipy hull + polygon test) for
    numerics tests; mirrors reference networks/utils.py:107-163."""
    from scipy.spatial import ConvexHull
    from matplotlib.patches import Polygon

    w, h = resolution
    iw, ih = image_size
    B, N, L = masks.shape
    out = np.zeros((B, N, h, w), np.float32)
    for b in range(B):
        for v in range(N):
            per_inst = np.zeros((L, h, w), np.float32)
            for i in range(L):
                if not masks[b, v, i]:
                    continue
                corners = bboxes[b, v, i]
                hom = np.concatenate([corners, np.ones((8, 1))], -1)
                cam = hom @ lidar2image[b, v].T
                cam = cam[cam[:, 2] > 0]
                if len(cam) == 0:
                    continue
                z = np.clip(cam[:, 2], 1e-5, 1e5)
                pts = np.stack(
                    [cam[:, 0] / z * (w / iw), cam[:, 1] / z * (h / ih)], -1
                ).astype(int)
                try:
                    hull = ConvexHull(pts)
                    pts = pts[hull.vertices]
                except Exception:
                    pass
                poly = Polygon(pts, closed=True)
                m = np.zeros((h, w))
                cnt = 0
                for _x in range(w):
                    for _y in range(h):
                        if poly.contains_point((_x, _y), radius=0):
                            m[_y, _x] = 1
                            cnt += 1
                per_inst[i] = m * (1 - cnt / (w * h))
            out[b, v] = per_inst.max(0)
    return out
