#!/usr/bin/env python
"""Offline h5 cache of BEV map+object masks per sample token
(reference ``tools/prepare_map_aux.py:25-132`` +
``magicdrive/dataset/pipeline.py:26-330`` rasterization).

Requires nuscenes-devkit map expansion on disk.  The cache stores uint8
(C, 200, 200) masks per token (the reference bit-packs with numba; plain
uint8 here — 18 channels x 40k cells = 720KB/sample, zstd-compressed by h5).
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

MAP_CLASSES = [
    "drivable_area", "ped_crossing", "walkway", "stop_line",
    "carpark_area", "road_divider", "lane_divider", "road_block",
]
OBJECT_CLASSES = [
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
]


def rasterize_sample(nusc, nusc_maps, info, xbound, ybound):
    """(8 map + 10 object, H, W) uint8 BEV masks around the ego pose."""
    from nuscenes.utils.data_classes import Box  # noqa: F401  (devkit check)

    import cv2

    h = int((xbound[1] - xbound[0]) / xbound[2])
    w = int((ybound[1] - ybound[0]) / ybound[2])
    out = np.zeros((len(MAP_CLASSES) + len(OBJECT_CLASSES), h, w), np.uint8)

    sample = nusc.get("sample", info["token"])
    lidar_sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
    ego = nusc.get("ego_pose", lidar_sd["ego_pose_token"])
    log = nusc.get("log", nusc.get("scene", sample["scene_token"])["log_token"])
    nmap = nusc_maps[log["location"]]
    cx, cy = ego["translation"][:2]
    radius = max(xbound[1], ybound[1]) * 1.5
    from pyquaternion import Quaternion

    yaw = Quaternion(ego["rotation"]).yaw_pitch_roll[0]
    patch = (cx, cy, radius * 2, radius * 2)

    def world_to_bev(pts):
        # rotate world points into ego frame, then to pixel indices
        c, s = np.cos(-yaw), np.sin(-yaw)
        x = (pts[:, 0] - cx) * c - (pts[:, 1] - cy) * s
        y = (pts[:, 0] - cx) * s + (pts[:, 1] - cy) * c
        px = ((y - ybound[0]) / ybound[2]).astype(np.int32)
        py = ((x - xbound[0]) / xbound[2]).astype(np.int32)
        return np.stack([px, py], 1)

    for ci, layer in enumerate(MAP_CLASSES):
        layer_name = {"drivable_area": "drivable_area",
                      "road_divider": "road_divider",
                      "lane_divider": "lane_divider"}.get(layer, layer)
        try:
            records = getattr(nmap, layer_name)
        except AttributeError:
            continue
        for rec in records:
            if "polygon_token" in rec:
                poly = nmap.extract_polygon(rec["polygon_token"])
                pts = np.array(poly.exterior.coords)
                cv2.fillPoly(out[ci], [world_to_bev(pts)], 1)
            elif "line_token" in rec:
                line = nmap.extract_line(rec["line_token"])
                pts = np.array(line.coords)
                cv2.polylines(out[ci], [world_to_bev(pts)], False, 1, 2)

    for ann_t in sample["anns"]:
        ann = nusc.get("sample_annotation", ann_t)
        name = ann["category_name"]
        idx = None
        for i, cls in enumerate(OBJECT_CLASSES):
            if cls.replace("_", "") in name.replace(".", "").replace("_", ""):
                idx = len(MAP_CLASSES) + i
                break
        if idx is None:
            continue
        box = nusc.get_box(ann_t)
        corners = box.bottom_corners().T[:, :2]  # (4, 2) world
        cv2.fillPoly(out[idx], [world_to_bev(corners)], 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", default="data/nuscenes")
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--infos", required=True, help="nuscenes_infos_*.pkl")
    ap.add_argument("--out", required=True, help="output .h5")
    ap.add_argument("--xbound", nargs=3, type=float, default=[-50, 50, 0.5])
    ap.add_argument("--ybound", nargs=3, type=float, default=[-50, 50, 0.5])
    args = ap.parse_args()

    import h5py
    from nuscenes import NuScenes
    from nuscenes.map_expansion.map_api import NuScenesMap

    nusc = NuScenes(version=args.version, dataroot=args.dataroot)
    locations = ["singapore-onenorth", "singapore-hollandvillage",
                 "singapore-queenstown", "boston-seaport"]
    nusc_maps = {loc: NuScenesMap(args.dataroot, loc) for loc in locations}
    with open(args.infos, "rb") as f:
        data = pickle.load(f)
    infos = data["infos"] if isinstance(data, dict) else data

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with h5py.File(args.out, "w") as h5:
        for i, info in enumerate(infos):
            masks = rasterize_sample(nusc, nusc_maps, info,
                                     args.xbound, args.ybound)
            h5.create_dataset(info["token"], data=masks, compression="gzip")
            # round-trip check (reference prepare_map_aux.py:69-71)
            assert (h5[info["token"]][()] == masks).all()
            if i % 100 == 0:
                print(f"{i}/{len(infos)}", flush=True)
    print(f"wrote {len(infos)} masks -> {args.out}")


if __name__ == "__main__":
    main()
