"""Box and BEV-map visualizers (reference ``magicdrive/runner/
box_visualizer.py`` + ``map_visualizer.py``) — cv2/numpy, no mmdet3d."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..ops.boxes import box_corners, trans_box_corners_to_view

__all__ = ["draw_boxes_on_view", "draw_boxes_on_views", "render_bev_map"]

# 12 box edges as corner-index pairs (corner index = 4x + 2y + z)
_EDGES = [
    (0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3),
    (2, 6), (3, 7), (4, 5), (4, 6), (5, 7), (6, 7),
]

_CLASS_COLORS = [
    (0, 150, 245), (135, 60, 0), (0, 255, 255), (255, 255, 0),
    (160, 32, 240), (255, 120, 50), (255, 127, 0), (255, 192, 203),
    (255, 0, 0), (255, 240, 150),
]


def draw_boxes_on_view(
    image: np.ndarray,  # (H, W, 3) uint8
    boxes: np.ndarray,  # (N, 7)
    labels: np.ndarray,  # (N,)
    lidar2image: np.ndarray,  # 4x4
    img_aug_matrix: Optional[np.ndarray] = None,
    thickness: int = 1,
) -> np.ndarray:
    import cv2

    img = image.copy()
    if len(boxes) == 0:
        return img
    corners = box_corners(boxes, origin=(0.5, 0.5, 0.5))
    proj = trans_box_corners_to_view(corners, lidar2image, img_aug_matrix,
                                     proj=True)
    h, w = img.shape[:2]
    for i in range(len(boxes)):
        if not np.all(proj[i, :, 2] > 0):  # any corner behind: skip box
            continue
        pts = proj[i, :, :2]
        color = _CLASS_COLORS[int(labels[i]) % len(_CLASS_COLORS)]
        for a, b in _EDGES:
            pa, pb = pts[a], pts[b]
            if not (np.isfinite(pa).all() and np.isfinite(pb).all()):
                continue
            cv2.line(img, (int(pa[0]), int(pa[1])), (int(pb[0]), int(pb[1])),
                     color, thickness, cv2.LINE_AA)
    return img


def draw_boxes_on_views(images, boxes, labels, lidar2image, img_aug_matrix=None):
    """(N_cam, H, W, 3) images -> same with boxes drawn per view."""
    out = []
    for v in range(len(images)):
        aug = None if img_aug_matrix is None else img_aug_matrix[v]
        out.append(draw_boxes_on_view(images[v], boxes, labels,
                                      lidar2image[v], aug))
    return np.stack(out)


# reference map_visualizer.py COLORS (:13-45), priority render order (:49-60)
_MAP_COLORS = [
    (164, 184, 196), (158, 158, 158), (35, 105, 38), (250, 100, 0),
    (120, 85, 72), (229, 230, 49), (119, 11, 32), (0, 60, 100),
]


def render_bev_map(masks: np.ndarray) -> np.ndarray:
    """(C>=8, H, W) binary masks -> (H, W, 3) uint8 color render."""
    c, h, w = masks.shape
    out = np.full((h, w, 3), 240, np.uint8)
    for ci in range(min(c, len(_MAP_COLORS))):
        out[masks[ci] > 0] = _MAP_COLORS[ci]
    return out
