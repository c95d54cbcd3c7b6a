"""End-to-end offline data prep against a faithful in-memory devkit stub.

The L0 offline-prep tools (``tools/create_data.py``,
``tools/prepare_map_aux.py``) are schema-correct but cannot run against real
nuScenes in this environment (no data).  This file closes the "never
executed" gap as far as offline allows: a synthetic nuscenes-devkit stub
(same API surface the tools touch: tables, ``get_box``, ``NuScenesMap``
patch queries, ``pyquaternion``) drives BOTH tools for real, and their
outputs feed the real ``NuScenesDataset`` + ``collate_fn`` — proving the
whole offline chain infos-pkl -> h5 BEV cache -> reader -> batch, including
cache/live-raster agreement.

Reference chain: ``MD/tools/create_data.py`` ->
``tools/data_converter/nuscenes_converter.py:43-249`` ->
``tools/prepare_map_aux.py:25-132`` -> ``magicdrive/dataset/pipeline.py``.
"""

import os
import pickle
import sys
import types

import numpy as np
import pytest

from dualdiff_tpu.data.nuscenes import NuScenesDataset, _quat_to_rot

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
CONFIG_DIR = os.path.join(REPO, "configs")

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_RIGHT", "CAM_BACK", "CAM_BACK_LEFT"]


def _yaw_quat(yaw):
    return (np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2))


# --------------------------------------------------------------- devkit stub


class _Box:
    def __init__(self, center, wlh, orientation):
        self.center = np.asarray(center, np.float64)
        self.wlh = np.asarray(wlh, np.float64)
        self.orientation = tuple(orientation)  # wxyz


class _Quaternion:
    """pyquaternion.Quaternion stand-in (rotation_matrix only)."""

    def __init__(self, q):
        self.q = list(q)

    @property
    def rotation_matrix(self):
        return _quat_to_rot(self.q)


class _Polygon:
    def __init__(self, coords):
        self.exterior = types.SimpleNamespace(coords=list(coords))


class _Line:
    def __init__(self, coords):
        self.coords = list(coords)


class _FakeNuScenesMap:
    """Serves one drivable-area polygon and one road-divider line in world
    coordinates near the stub ego pose (100, 50)."""

    def __init__(self, dataroot, location):
        self.location = location

    def get_records_in_patch(self, patch, layers, mode="intersect"):
        table = {"drivable_area": ["da1"], "road_divider": ["rd1"]}
        return {layer: table.get(layer, []) for layer in layers}

    def get(self, layer, token):
        if layer == "drivable_area":
            return {"polygon_tokens": ["p1"]}
        if layer == "road_divider":
            return {"line_token": "l1"}
        raise KeyError(layer)

    def extract_polygon(self, token):
        # 30x20m box around the ego at (100, 50)
        return _Polygon([(85, 40), (115, 40), (115, 60), (85, 60), (85, 40)])

    def extract_line(self, token):
        return _Line([(90, 50), (110, 50)])


def _build_tables():
    """Two scenes x two keyframes, 6 cams, annotations with known geometry."""
    tables = {"sample": {}, "sample_data": {}, "calibrated_sensor": {},
              "ego_pose": {}, "sample_annotation": {}, "log": {}, "scene": {}}
    scenes, samples = [], []

    tables["log"]["log1"] = {"location": "boston-seaport"}
    tables["calibrated_sensor"]["cs_lidar"] = {
        "rotation": (1, 0, 0, 0), "translation": (0.0, 0.0, 1.8)}
    for i, cam in enumerate(CAMS):
        tables["calibrated_sensor"][f"cs_{cam}"] = {
            "rotation": _yaw_quat(np.pi / 3 * i),
            "translation": (1.5, (-1) ** i * 0.5, 1.6),
            "camera_intrinsic": [[1266.0, 0, 800.0],
                                 [0, 1266.0, 450.0], [0, 0, 1.0]],
        }

    for s_idx, (scene_name, split_desc) in enumerate(
            [("scene-0001", "Sunny day drive"),
             ("scene-0002", "Rainy night drive")]):
        stok = f"scene{s_idx}"
        tables["scene"][stok] = {"token": stok, "name": scene_name,
                                 "description": split_desc,
                                 "log_token": "log1"}
        scenes.append(tables["scene"][stok])
        for k in range(2):
            tok = f"s{s_idx}{k}"
            ego_t = np.array([100.0 + 20 * k, 50.0, 0.0])
            ego_q = _yaw_quat(0.0 if k == 0 else np.pi / 2)
            tables["ego_pose"][f"ep_{tok}"] = {
                "rotation": ego_q, "translation": ego_t}
            data = {}
            tables["sample_data"][f"sd_lidar_{tok}"] = {
                "calibrated_sensor_token": "cs_lidar",
                "ego_pose_token": f"ep_{tok}",
                "filename": f"lidar/{tok}.bin"}
            data["LIDAR_TOP"] = f"sd_lidar_{tok}"
            for cam in CAMS:
                tables["sample_data"][f"sd_{cam}_{tok}"] = {
                    "calibrated_sensor_token": f"cs_{cam}",
                    "ego_pose_token": f"ep_{tok}",
                    "filename": f"samples/{cam}/{tok}.jpg"}
                data[cam] = f"sd_{cam}_{tok}"
            # one car 10m ahead (global +x), one pedestrian behind-left
            anns = []
            for a_idx, (center, wlh, name, vis) in enumerate([
                    (ego_t + np.array([10.0, 0.0, 1.0]),
                     (2.0, 4.5, 1.6), "vehicle.car.sedan", "4"),
                    (ego_t + np.array([-5.0, -3.0, 0.9]),
                     (0.6, 0.7, 1.8), "human.pedestrian.adult", "2")]):
                atok = f"ann_{tok}_{a_idx}"
                tables["sample_annotation"][atok] = {
                    "token": atok, "category_name": name,
                    "visibility_token": vis,
                    "_center": center, "_wlh": wlh,
                    "_orientation": _yaw_quat(0.3 * a_idx)}
                anns.append(atok)
            rec = {"token": tok, "scene_token": stok,
                   "timestamp": 1_000_000 + 1000 * (2 * s_idx + k),
                   "data": data, "anns": anns}
            tables["sample"][tok] = rec
            samples.append(rec)
    return tables, scenes, samples


@pytest.fixture()
def devkit_stub(monkeypatch):
    """Install `nuscenes` / `pyquaternion` stub modules for the tools."""
    tables, scenes, samples = _build_tables()

    class _FakeNuScenes:
        def __init__(self, version, dataroot, verbose=False):
            self.version = version
            self.scene = scenes
            self.sample = samples

        def get(self, table, token):
            return tables[table][token]

        def get_box(self, ann_token):
            ann = tables["sample_annotation"][ann_token]
            return _Box(ann["_center"], ann["_wlh"], ann["_orientation"])

    nusc_mod = types.ModuleType("nuscenes")
    nusc_mod.NuScenes = _FakeNuScenes
    utils_mod = types.ModuleType("nuscenes.utils")
    splits_mod = types.ModuleType("nuscenes.utils.splits")
    splits_mod.mini_train = ["scene-0001"]
    splits_mod.mini_val = ["scene-0002"]
    splits_mod.train = ["scene-0001"]
    splits_mod.val = ["scene-0002"]
    utils_mod.splits = splits_mod
    nusc_mod.utils = utils_mod
    mapexp_mod = types.ModuleType("nuscenes.map_expansion")
    mapapi_mod = types.ModuleType("nuscenes.map_expansion.map_api")
    mapapi_mod.NuScenesMap = _FakeNuScenesMap
    mapexp_mod.map_api = mapapi_mod
    nusc_mod.map_expansion = mapexp_mod
    pyquat_mod = types.ModuleType("pyquaternion")
    pyquat_mod.Quaternion = _Quaternion

    for name, mod in [("nuscenes", nusc_mod),
                      ("nuscenes.utils", utils_mod),
                      ("nuscenes.utils.splits", splits_mod),
                      ("nuscenes.map_expansion", mapexp_mod),
                      ("nuscenes.map_expansion.map_api", mapapi_mod),
                      ("pyquaternion", pyquat_mod)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return tables


def _run_create_data(tmp_path):
    from tools.create_data import create_nuscenes_infos

    out = str(tmp_path / "infos")
    create_nuscenes_infos(str(tmp_path / "nusc"), "v1.0-mini", out)
    return out


def _write_images(dataroot, infos):
    from PIL import Image

    rng = np.random.default_rng(0)
    for info in infos:
        for cam in CAMS:
            path = os.path.join(dataroot, info["cams"][cam]["data_path"])
            os.makedirs(os.path.dirname(path), exist_ok=True)
            arr = rng.integers(0, 255, (900, 1600, 3), np.uint8)
            Image.fromarray(arr).save(path, quality=70)


# --------------------------------------------------------------------- tests


def test_create_data_split_and_geometry(devkit_stub, tmp_path):
    out = _run_create_data(tmp_path)
    with open(os.path.join(out, "nuscenes_infos_train.pkl"), "rb") as f:
        train = pickle.load(f)
    with open(os.path.join(out, "nuscenes_infos_val.pkl"), "rb") as f:
        val = pickle.load(f)
    assert train["metadata"]["version"] == "v1.0-mini"
    assert len(train["infos"]) == 2 and len(val["infos"]) == 2
    assert {i["scene"] for i in train["infos"]} == {"scene-0001"}
    assert {i["scene"] for i in val["infos"]} == {"scene-0002"}

    info = next(i for i in train["infos"] if i["token"] == "s00")
    # identity ego/lidar rotation, ego at (100,50,0), lidar z=1.8:
    # car at global (110,50,1.0) -> lidar (10,0,-0.8); bottom-center z -0.8-h/2
    box = info["gt_boxes"][0]
    np.testing.assert_allclose(box[:3], [10.0, 0.0, -0.8 - 0.8], atol=1e-5)
    # (l, w, h) ordering from wlh=(2, 4.5, 1.6)
    np.testing.assert_allclose(box[3:6], [4.5, 2.0, 1.6], atol=1e-6)
    assert info["gt_names"] == ["car", "pedestrian"]
    assert list(info["visibility"]) == [4, 2]
    assert info["location"] == "boston-seaport"
    assert info["timeofday"] == "day"
    assert set(info["cams"]) == set(CAMS)
    # sensor2lidar: cam translation (1.5, +-0.5, 1.6) in ego == lidar frame
    # shifted down by the lidar mount z
    front = info["cams"]["CAM_FRONT"]
    np.testing.assert_allclose(front["sensor2lidar_translation"],
                               [1.5, -0.5, 1.6 - 1.8], atol=1e-6)
    # rotated ego pose (k=1 sample): lidar2ego/ego2global must compose to the
    # global pose used above
    info_rot = next(i for i in train["infos"] if i["token"] == "s01")
    l2g = info_rot["ego2global"] @ info_rot["lidar2ego"]
    np.testing.assert_allclose(l2g[:2, 3], [120.0, 50.0], atol=1e-4)
    yaw = np.arctan2(l2g[1, 0], l2g[0, 0])
    np.testing.assert_allclose(yaw, np.pi / 2, atol=1e-5)
    # night scene classification on the val side
    assert all(i["timeofday"] == "night" for i in val["infos"])


def test_prepare_map_aux_and_full_reader_chain(devkit_stub, tmp_path,
                                               monkeypatch):
    import h5py

    import tools.prepare_map_aux as pma

    out = _run_create_data(tmp_path)
    infos_pkl = os.path.join(out, "nuscenes_infos_train.pkl")
    h5_path = str(tmp_path / "map_aux_train.h5")
    monkeypatch.setattr(sys, "argv", [
        "prepare_map_aux.py", "--dataroot", str(tmp_path / "nusc"),
        "--version", "v1.0-mini", "--infos", infos_pkl, "--out", h5_path])
    pma.main()

    with open(infos_pkl, "rb") as f:
        infos = pickle.load(f)["infos"]
    with h5py.File(h5_path, "r") as h5:
        assert set(h5.keys()) == {i["token"] for i in infos} | {"aux"}
        assert set(h5["aux"].keys()) == {i["token"] for i in infos}
        masks = h5["s00"][()]
        aux = h5["aux/s00"][()]
    assert masks.shape == (18, 200, 200) and masks.dtype == np.uint8
    assert aux.shape == (8, 200, 200) and aux.dtype == np.float32
    assert np.abs(aux).sum() > 0  # the car box stamped aux content
    # drivable area polygon covers the ego cell; divider line rasterized;
    # the car box (10m ahead) fills cells in its object channel
    from dualdiff_tpu.data.bev_raster import MAP_CLASSES, OBJECT_CLASSES

    assert masks[MAP_CLASSES.index("drivable_area"), 100, 100] == 1
    assert masks[MAP_CLASSES.index("road_divider")].sum() > 0
    car_ch = len(MAP_CLASSES) + OBJECT_CLASSES.index("car")
    assert masks[car_ch].sum() >= 4 * 9  # 4.5x2m box at 0.5m cells
    assert masks[car_ch, 120, 100] == 1  # 10m ahead -> +20 rows

    # the produced artifacts drive the real reader + collate
    dataroot = str(tmp_path / "nusc")
    _write_images(dataroot, infos)
    ds = NuScenesDataset(infos_pkl, dataset_root=dataroot,
                         object_classes=OBJECT_CLASSES,
                         cache_file=h5_path)
    assert len(ds) == 2
    s = ds[0]
    assert s["img"].shape == (6, 224, 400, 3)
    assert s["gt_masks_bev"].shape == (18, 200, 200)
    assert (s["gt_masks_bev"] == masks).all()
    assert s["gt_bboxes_3d"].shape == (2, 7)
    assert s["token"] == "s00"

    from dualdiff_tpu.data.collate import collate_fn
    from dualdiff_tpu.data.tokenizer import HashTokenizer
    from dualdiff_tpu.utils.config import load_config

    cfg = load_config(CONFIG_DIR, overrides=["+exp=224x400"])
    batch = collate_fn([ds[0], ds[1]], cfg, HashTokenizer(),
                       rng=np.random.default_rng(0))
    assert batch["pixel_values"].shape[0] == 2
    assert np.isfinite(batch["pixel_values"]).all()


def test_live_raster_matches_prebuilt_cache(devkit_stub, tmp_path,
                                            monkeypatch):
    import h5py

    import tools.prepare_map_aux as pma

    out = _run_create_data(tmp_path)
    infos_pkl = os.path.join(out, "nuscenes_infos_train.pkl")
    h5_path = str(tmp_path / "map_aux.h5")
    monkeypatch.setattr(sys, "argv", [
        "prepare_map_aux.py", "--dataroot", str(tmp_path / "nusc"),
        "--version", "v1.0-mini", "--infos", infos_pkl, "--out", h5_path])
    pma.main()

    from dualdiff_tpu.data.bev_raster import OBJECT_CLASSES

    ds_live = NuScenesDataset(infos_pkl, dataset_root=str(tmp_path / "nusc"),
                              object_classes=OBJECT_CLASSES,
                              load_images=False)  # no cache_file: live path
    live = ds_live[0]["gt_masks_bev"]
    with h5py.File(h5_path, "r") as h5:
        cached = h5[ds_live.infos[0]["token"]][()]
    np.testing.assert_array_equal(live, cached)
