import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dualdiff_tpu.ops.boxes import (
    box_corners,
    ensure_canvas,
    ensure_positive_z,
    preprocess_bbox,
    trans_box_corners_to_view,
)
from dualdiff_tpu.ops.fgm import fgm_heatmap, fgm_heatmap_host
from dualdiff_tpu.ops.mscn import mscn_luminance
from dualdiff_tpu.ops.ors import filter_fg_bg, occupancy_ray_sample


# ---------------- boxes ----------------

def test_box_corners_axis_aligned():
    # box at origin, dims (2, 4, 6), yaw 0, bottom-center origin
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 6.0, 0.0]])
    c = box_corners(boxes)
    assert c.shape == (1, 8, 3)
    # index = 4x + 2y + z; corner 0 = (x0, y0, z0) = (-1, -2, 0)
    np.testing.assert_allclose(c[0, 0], [-1, -2, 0], atol=1e-9)
    np.testing.assert_allclose(c[0, 7], [1, 2, 6], atol=1e-9)  # (x1, y1, z1)
    # gravity-center origin shifts z by half height
    cg = box_corners(boxes, origin=(0.5, 0.5, 0.5))
    np.testing.assert_allclose(cg[0, 0], [-1, -2, -3], atol=1e-9)


def test_box_corners_yaw_rotation():
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, np.pi / 2]])
    c = box_corners(boxes, origin=(0.5, 0.5, 0.5))
    # mmdet3d convention: p @ R_T with R_T = [[cos, sin], [-sin, cos]]
    # corner (1, 1) -> (1*0 + 1*(-1), 1*1 + 1*0) = (-1, 1)
    np.testing.assert_allclose(c[0, 7, :2], [-1, 1], atol=1e-9)


def test_projection_and_filters():
    # camera at origin looking +z; lidar2image = diag-ish projection
    K = np.array([[100.0, 0, 50, 0], [0, 100.0, 50, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]])
    corners = box_corners(np.array([[0, 0, 5.0, 1, 1, 1, 0]]),
                          origin=(0.5, 0.5, 0.5))
    # swap axes so z is depth (box at z=5 in front)
    proj = trans_box_corners_to_view(corners, K, proj=True)
    assert proj.shape == (1, 8, 3)
    assert np.all(proj[..., 2] == 1.0)  # positive depth -> sign 1
    assert ensure_positive_z(trans_box_corners_to_view(corners, K, proj=False)).all()
    assert ensure_canvas(proj, (100, 100)).all()
    behind = box_corners(np.array([[0, 0, -5.0, 1, 1, 1, 0]]),
                         origin=(0.5, 0.5, 0.5))
    pb = trans_box_corners_to_view(behind, K, proj=False)
    assert not ensure_positive_z(pb).any()


def _identity_rig(B=1, n_cam=2):
    l2c = np.tile(np.eye(4), (B, n_cam, 1, 1))
    # lidar2image: project with f=100, pp=(50,50); looking down +z
    K = np.array([[100.0, 0, 50, 0], [0, 100.0, 50, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]])
    l2i = np.tile(K, (B, n_cam, 1, 1))
    return l2c, l2i


def test_preprocess_bbox_static_padding():
    rng = np.random.default_rng(0)
    l2c, l2i = _identity_rig()
    boxes = [np.array([[0, 0, 5.0, 1, 1, 1, 0], [0, 0, -5.0, 1, 1, 1, 0]])]
    labels = [np.array([2, 3])]
    out = preprocess_bbox(boxes, labels, l2c, l2i, None, (100, 100),
                          max_len=10, rng=rng)
    assert out["bboxes"].shape == (1, 2, 10, 8, 3)
    assert out["classes"].shape == (1, 2, 10)
    # only the z=+5 box is visible (3d filter keeps z>0 in camera frame)
    assert out["masks"][0, 0].sum() == 1
    assert out["classes"][0, 0, 0] == 2
    assert (out["classes"][0, 0, 1:] == -1).all()
    # view-shared keeps everything
    out_vs = preprocess_bbox(boxes, labels, l2c, l2i, None, (100, 100),
                             view_shared=True, max_len=10, rng=rng)
    assert out_vs["masks"].shape == (1, 1, 10)
    assert out_vs["masks"][0, 0].sum() == 2


def test_preprocess_bbox_empty():
    l2c, l2i = _identity_rig()
    out = preprocess_bbox([np.zeros((0, 7))], [np.zeros((0,))], l2c, l2i,
                          None, (100, 100), max_len=4)
    assert out is None


# ---------------- FGM ----------------

def test_fgm_device_matches_host_reference():
    rng = np.random.default_rng(1)
    B, N, L = 1, 2, 4
    # boxes in front of the projective camera (z in [3, 10])
    boxes = np.zeros((B, N, L, 8, 3), np.float32)
    for b in range(B):
        for v in range(N):
            for i in range(L):
                c = box_corners(
                    np.array([[rng.uniform(-2, 2), rng.uniform(-2, 2),
                               rng.uniform(4, 9), 1.5, 1.5, 1.5,
                               rng.uniform(0, 3)]]),
                    origin=(0.5, 0.5, 0.5))
                boxes[b, v, i] = c[0]
    masks = rng.random((B, N, L)) > 0.3
    K = np.array([[400.0, 0, 800, 0], [0, 400.0, 450, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)
    l2i = np.tile(K, (B, N, 1, 1))
    dev = np.asarray(fgm_heatmap(jnp.asarray(boxes), jnp.asarray(masks),
                                 jnp.asarray(l2i), (50, 28)))
    host = fgm_heatmap_host(boxes, masks, l2i, (50, 28))
    assert dev.shape == (B, N, 28, 50)
    # integer-grid rasterization: allow small pixel-boundary disagreement
    diff = np.abs(dev - host)
    assert (diff > 0.05).mean() < 0.02, f"mismatch frac {(diff > 0.05).mean()}"


def test_fgm_weights_smaller_boxes_higher():
    # a big and a small box straight ahead; smaller => larger weight
    def mk(sz):
        return box_corners(np.array([[0, 0, 6.0, sz, sz, sz, 0]]),
                           origin=(0.5, 0.5, 0.5))[0]

    boxes = np.stack([mk(4.0), mk(0.7)])[None, None]  # (1, 1, 2, 8, 3)
    masks = np.ones((1, 1, 2), bool)
    K = np.array([[400.0, 0, 800, 0], [0, 400.0, 450, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]], np.float32)[None, None]
    heat = np.asarray(fgm_heatmap(jnp.asarray(boxes), jnp.asarray(masks),
                                  jnp.asarray(K), (50, 28)))
    only_big = np.asarray(fgm_heatmap(jnp.asarray(boxes[:, :, :1]),
                                      jnp.asarray(masks[:, :, :1]),
                                      jnp.asarray(K), (50, 28)))
    assert heat.max() > only_big.max()  # small box carries higher weight


# ---------------- ORS ----------------

def _torch_reference_ors(occ, K, T, out_hw, image_hw, sample_point, step):
    """Independent check following the reference algorithm with torch
    grid_sample (occ3d_proj.py:50-113 semantics)."""
    h, w = out_hw
    ih, iw = image_hw
    occ_t = torch.tensor(occ, dtype=torch.int64)[None]
    one_hot = F.one_hot(occ_t, num_classes=18).float().permute(0, 4, 1, 2, 3)
    ratio_h, ratio_w = h / ih, w / iw
    u = torch.arange(w, dtype=torch.float64) / ratio_w
    v = torch.arange(h, dtype=torch.float64) / ratio_h
    uu, vv = torch.meshgrid(u, v, indexing="xy")
    pix = torch.stack([uu.flatten(), vv.flatten(),
                       torch.ones_like(uu.flatten())], 1)
    K_inv = torch.linalg.inv(torch.tensor(K, dtype=torch.float64))
    T = torch.tensor(T, dtype=torch.float64)
    R, t = T[:3, :3], T[:3, 3]
    d = (R @ (K_inv @ pix.T)).T
    d = d / d.norm(dim=1, keepdim=True)
    steps = torch.arange(sample_point, dtype=torch.float64) * step
    pts = t[None, None] + steps[None, :, None] * d[:, None, :]
    grid = pts.clone()
    grid[..., 0] = pts[..., 0] / 40
    grid[..., 1] = pts[..., 1] / 40
    grid[..., 2] = (pts[..., 2] / 40) * 40 / 3.2 - 2.2 / 3.2
    g = torch.empty_like(grid)
    g[..., 0], g[..., 1], g[..., 2] = grid[..., 2], grid[..., 1], grid[..., 0]
    g = g.reshape(1, -1, 1, 1, 3).to(torch.float32)
    out = F.grid_sample(one_hot, g, mode="nearest", padding_mode="zeros",
                        align_corners=False)
    out = out.squeeze(-1).squeeze(-1).reshape(1, 18, h * w, sample_point)
    out = out.permute(0, 2, 3, 1)
    empty = out.sum(-1) == 0
    out[..., 17][empty] = 1
    sem = out.argmax(-1).reshape(h, w, sample_point)
    return sem.numpy()


def test_ors_matches_torch_grid_sample():
    rng = np.random.default_rng(2)
    occ = rng.integers(0, 18, (200, 200, 16), dtype=np.int64)
    K = np.array([[800.0, 0, 800], [0, 800.0, 448], [0, 0, 1]])
    T = np.eye(4)
    # camera looking along +x-ish: rotate camera z onto ego x
    T[:3, :3] = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]]).T
    T[:3, 3] = [0.5, 0.2, 1.5]
    out_hw, image_hw, S = (14, 25), (896, 1600), 64
    sem = np.asarray(occupancy_ray_sample(
        jnp.asarray(occ[None]), jnp.asarray(K[None, None]),
        jnp.asarray(T[None, None]), out_hw, image_hw, S, 0.2))[0, 0]
    ref = _torch_reference_ors(occ, K, T, out_hw, image_hw, S, 0.2)
    agree = (sem == ref).mean()
    # rounding at voxel boundaries differs (round-to-even vs floor+0.5):
    # demand near-complete agreement
    assert agree > 0.97, f"ORS agreement {agree}"


def test_ors_fg_bg_filter():
    sem = jnp.asarray(np.arange(18).reshape(1, 1, 1, 18, 1))
    fg = np.asarray(filter_fg_bg(sem, keep_fg=True, keep_bg=False))
    bg = np.asarray(filter_fg_bg(sem, keep_fg=False, keep_bg=True))
    assert np.all(fg[0, 0, 0, 11:] == 1.0)  # bg classes -> 17/17
    np.testing.assert_allclose(fg[0, 0, 0, :11, 0], np.arange(11) / 17,
                               rtol=1e-5)
    assert np.all(bg[0, 0, 0, :11] == 1.0)  # fg classes -> 17/17


# ---------------- MSCN ----------------

def test_mscn_shapes_and_constant_image():
    rgb = jnp.ones((2, 3, 32, 48, 3)) * 0.5  # constant -> blur is identity
    out = mscn_luminance(rgb)
    assert out.shape == (2, 3, 32, 48)
    np.testing.assert_allclose(np.asarray(out), 0.75, atol=1e-5)


def test_mscn_blur_reduces_variance():
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    out = np.asarray(mscn_luminance(rgb))
    x = np.asarray(rgb) * 0.5 + 0.5
    y = x @ np.array([0.299, 0.587, 0.114])
    assert out.std() < y.std() * 0.5
