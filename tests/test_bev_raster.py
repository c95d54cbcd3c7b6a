"""Unit tests for the devkit-free BEV raster core (synthetic geometry).

Covers the geometry the h5 cache tool and the live-raster path both rely
on: lidar->canvas mapping, world->lidar ego transform, polygon/line fill,
channel layout, and the 7-dof box bottom-face extraction.  Reference
semantics: ``MD/magicdrive/dataset/pipeline.py:26-330``.
"""

import numpy as np
import pytest

from dualdiff_tpu.data.bev_raster import (
    MAP_CLASSES, OBJECT_CLASSES, BEVRasterizer, bottom_corners_from_boxes7d)


@pytest.fixture(scope="module")
def rast():
    return BEVRasterizer()  # 200x200 @ 0.5m, ego-centered


def test_canvas_geometry(rast):
    assert rast.canvas_size == (200, 200)
    assert rast.num_channels == 18
    # ego origin maps to the canvas center; +x (front) grows the row index
    pts = rast.lidar_to_canvas(np.array([[0.0, 0.0], [10.0, 0.0],
                                         [0.0, 10.0]]))
    np.testing.assert_array_equal(pts[0], [100, 100])   # (col, row)
    np.testing.assert_array_equal(pts[1], [100, 120])   # +x -> +row
    np.testing.assert_array_equal(pts[2], [120, 100])   # +y -> +col


def test_world_to_lidar_rotation():
    # ego at (100, 50) facing +y (yaw=90deg): a world point 10m "ahead"
    # (world +y) is at lidar-frame (+10, 0)
    out = BEVRasterizer.world_to_lidar(
        np.array([[100.0, 60.0]]), (100.0, 50.0), np.pi / 2)
    np.testing.assert_allclose(out, [[10.0, 0.0]], atol=1e-9)


def test_polygon_fill_area(rast):
    # 10m x 10m square in front of ego -> 20x20 px in the drivable channel
    sq = np.array([[5.0, -5.0], [5.0, 5.0], [15.0, 5.0], [15.0, -5.0]])
    out = rast.rasterize_map({"drivable_area": {"polygons": [sq]}})
    ch = MAP_CLASSES.index("drivable_area")
    area = int(out[ch].sum())
    assert abs(area - 21 * 21) <= 2 * 21  # cv2 fill includes the boundary
    assert out[ch, 120, 100] == 1  # center of the square (row~x, col~y)
    assert out[ch, 80, 100] == 0   # behind ego: empty
    assert out[[c for c in range(18) if c != ch]].sum() == 0


def test_line_layer_rasterizes_thin(rast):
    line = np.array([[-20.0, 0.0], [20.0, 0.0]])
    out = rast.rasterize_map({"lane_divider": {"lines": [line]}})
    ch = MAP_CLASSES.index("lane_divider")
    assert out[ch].sum() > 0
    # a 40m line at width 2 covers ~80 rows x ~2-3 cols
    assert out[ch].sum() < 80 * 4
    cols = np.where(out[ch].any(axis=0))[0]
    assert abs(int(cols.mean()) - 100) <= 2  # runs along y=0 (col 100)


def test_bottom_corners_from_boxes7d_axis_aligned():
    # box at (10, 0): dims (x_size=4, y_size=2), yaw=0
    # (mmdet3d-1.0 convention of ops/boxes.py::box_corners)
    boxes = np.array([[10.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.0]])
    corners = bottom_corners_from_boxes7d(boxes)
    assert corners.shape == (1, 4, 2)
    xs, ys = sorted(set(corners[0, :, 0])), sorted(set(corners[0, :, 1]))
    np.testing.assert_allclose(xs, [8.0, 12.0], atol=1e-5)
    np.testing.assert_allclose(ys, [-1.0, 1.0], atol=1e-5)
    # corner order is a simple cycle (non-self-intersecting): the polygon
    # area via the shoelace formula equals w*l
    x, y = corners[0, :, 0], corners[0, :, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))
    np.testing.assert_allclose(area, 8.0, atol=1e-5)


def test_object_channels(rast):
    boxes = np.array([
        [10.0, 0.0, -1.0, 2.0, 4.0, 1.5, 0.0],    # car, ahead
        [-10.0, 5.0, -1.0, 1.0, 2.0, 1.0, 0.7],   # pedestrian, behind-left
    ])
    labels = np.array([OBJECT_CLASSES.index("car"),
                       OBJECT_CLASSES.index("pedestrian")])
    out = rast.rasterize(
        {}, boxes, labels)
    car_ch = len(MAP_CLASSES) + OBJECT_CLASSES.index("car")
    ped_ch = len(MAP_CLASSES) + OBJECT_CLASSES.index("pedestrian")
    assert out[car_ch, 120, 100] == 1   # x=10 -> row 120
    assert out[ped_ch, 80, 110] == 1    # x=-10 -> row 80, y=5 -> col 110
    assert out[car_ch].sum() >= 8 * (1 / 0.5) ** 2 * 0.7  # ~wl/cell_area
    # unknown label is skipped, not crashed
    out2 = rast.rasterize({}, boxes[:1], np.array([-1]))
    assert out2.sum() == 0


def test_rotated_box_rotates_mask(rast):
    # 90deg-yaw box swaps the footprint's x/y extents
    b0 = np.array([[0.0, 0.0, -1.0, 6.0, 2.0, 1.5, 0.0]])
    b90 = np.array([[0.0, 0.0, -1.0, 6.0, 2.0, 1.5, np.pi / 2]])
    m0 = rast.rasterize({}, b0, np.array([0]))
    m90 = rast.rasterize({}, b90, np.array([0]))
    ch = len(MAP_CLASSES)
    rows0 = np.ptp(np.where(m0[ch].any(axis=1))[0])
    rows90 = np.ptp(np.where(m90[ch].any(axis=1))[0])
    assert rows0 > rows90  # long axis moved from x (rows) to y (cols)
    assert abs(int(m0[ch].sum()) - int(m90[ch].sum())) <= 12


def test_aux_channels_hand_computed(rast):
    """Channel-for-channel aux raster vs hand-computed expectations for one
    axis-aligned box (reference _get_dynamic_aux_bbox semantics,
    pipeline.py:88-174): visibility level, center_offset in canvas units
    (row ~ lidar x, col ~ lidar y), center_ohw = (|c->front|, |c->left|,
    unit front dir), 3D box height."""
    # box: center (10, 5), size (4, 2, 1.5), yaw 0; canvas 0.5 m/px
    boxes = np.array([[10.0, 5.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32)
    aux = rast.rasterize_aux(boxes, visibility=np.array([3.0]))
    assert aux.shape == (8, 200, 200)  # 1+2+4+1 (ref AUX_DATA_CH; its "7 channels" docstring is stale)
    # center at (row 120, col 110); footprint rows 116..124, cols 108..112
    r, c = 118, 109  # strictly inside
    np.testing.assert_allclose(aux[0, r, c], 3.0)  # visibility
    np.testing.assert_allclose(aux[1, r, c], r - 120.0)  # offset row
    np.testing.assert_allclose(aux[2, r, c], c - 110.0)  # offset col
    # |center->front-mid| = (4/2)m / 0.5 = 4 px; |center->left-mid| = 2 px
    np.testing.assert_allclose(aux[3, r, c], 4.0, atol=1e-5)
    np.testing.assert_allclose(aux[4, r, c], 2.0, atol=1e-5)
    # front direction = +x = +row
    np.testing.assert_allclose(aux[5, r, c], 1.0, atol=1e-3)
    np.testing.assert_allclose(aux[6, r, c], 0.0, atol=1e-3)
    # outside the footprint: all channels zero
    assert aux[:, 130, 130].sum() == 0
    assert aux[:, r, 100].sum() == 0
    # height channel lives at the END of the layout: [vis|off2|ohw4|h]
    h_aux = rast.rasterize_aux(boxes, visibility=np.array([3.0]),
                               aux_data=("height",))
    np.testing.assert_allclose(h_aux[0, r, c], 1.5)
    assert h_aux.shape == (1, 200, 200)
    # yaw=90deg: front dir rotates to +y (+col); h/w swap roles
    boxes_r = np.array([[10.0, 5.0, 0.0, 4.0, 2.0, 1.5, np.pi / 2]],
                       np.float32)
    aux_r = rast.rasterize_aux(boxes_r, visibility=np.array([1.0]))
    np.testing.assert_allclose(aux_r[3, r, c], 4.0, atol=1e-5)
    np.testing.assert_allclose(aux_r[5, r, c], 0.0, atol=1e-3)
    np.testing.assert_allclose(aux_r[6, r, c], 1.0, atol=1e-3)


def test_aux_in_synthetic_and_reader_samples():
    from dualdiff_tpu.data.synthetic import SyntheticNuScenes

    s = SyntheticNuScenes(num_samples=2)[0]
    assert s["gt_aux_bev"].shape == (8, 200, 200)
    assert s["gt_aux_bev"].dtype == np.float32
    assert s["visibility"].shape == (len(s["gt_bboxes_3d"]),)
    # boxes exist => some box stamped aux content
    assert np.abs(s["gt_aux_bev"]).sum() > 0


def test_aux_cache_roundtrip(tmp_path, rast):
    """aux/<token> h5 group is preferred over live rasterization."""
    import h5py
    import pickle

    from dualdiff_tpu.data.nuscenes import NuScenesDataset

    cams = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
            "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]
    info = {
        "token": "tok0", "timestamp": 0,
        "cams": {c: {
            "data_path": "x.jpg",
            "cam_intrinsic": np.eye(3),
            "sensor2lidar_rotation": np.eye(3),
            "sensor2lidar_translation": np.zeros(3),
        } for c in cams},
        "gt_boxes": np.array([[10.0, 5.0, 0.0, 4.0, 2.0, 1.5, 0.0]],
                             np.float32),
        "gt_names": ["car"], "visibility": np.array([2]),
    }
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": [info]}, f)
    cache = tmp_path / "bev.h5"
    masks = np.zeros((18, 200, 200), np.uint8)
    sentinel = np.full((8, 200, 200), 5.0, np.float32)
    with h5py.File(cache, "w") as h5:
        h5.create_dataset("tok0", data=masks)
        h5.create_dataset("aux/tok0", data=sentinel)
    aux_list = ["visibility", "center_offset", "center_ohw", "height"]
    ds = NuScenesDataset(str(pkl), dataset_root=str(tmp_path),
                         object_classes=["car"], load_images=False,
                         cache_file=str(cache), aux_data=aux_list)
    np.testing.assert_array_equal(ds[0]["gt_aux_bev"], sentinel)
    # without the cache: live aux matches the raster core directly
    ds2 = NuScenesDataset(str(pkl), dataset_root=str(tmp_path),
                          object_classes=["car"], load_images=False,
                          missing_bev="zeros", aux_data=aux_list)
    live = ds2[0]["gt_aux_bev"]
    want = rast.rasterize_aux(info["gt_boxes"], np.array([2.0]), aux_list)
    np.testing.assert_array_equal(live, want)


def test_reader_errors_on_missing_bev(tmp_path):
    """Cache-miss without live raster must raise, not silently zero-fill."""
    import pickle

    from dualdiff_tpu.data.nuscenes import NuScenesDataset

    info = {
        "token": "tok0", "timestamp": 0,
        "cams": {c: {
            "data_path": "x.jpg",
            "cam_intrinsic": np.eye(3),
            "sensor2lidar_rotation": np.eye(3),
            "sensor2lidar_translation": np.zeros(3),
        } for c in ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
                    "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]},
        "gt_boxes": np.zeros((0, 7), np.float32), "gt_names": [],
    }
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": [info]}, f)
    ds = NuScenesDataset(str(pkl), dataset_root=str(tmp_path),
                         object_classes=["car"], load_images=False)
    with pytest.raises(RuntimeError, match="BEV masks unavailable"):
        ds[0]
    # explicit zeros mode warns and proceeds
    ds2 = NuScenesDataset(str(pkl), dataset_root=str(tmp_path),
                          object_classes=["car"], load_images=False,
                          missing_bev="zeros")
    assert ds2[0]["gt_masks_bev"].sum() == 0
