"""Dataset compiler: raw capture folders -> h5 datasets.

Parity port of ``robotpose/data/building.py:39-301``: walks a capture tree
for per-frame ``.json``/``.npy``/``.png`` triplets (joint states + depth +
RGB), asserts uniform camera settings, scales depth, builds thumbnails and
a reference video, and writes the same h5 schema (attrs: name/length/
resolution/intrinsics/depth_scale; groups: coordinates/, images/, paths/).

The raw JSON format is the reference's recorded format
(``examples/dataset_json_required.json``): ``objects[0].joints[*].angle``
(+ optional ``position``) and ``realsense_info[0]`` with depth_scale and
intrinsics strings.
"""

from __future__ import annotations

import datetime
import json
import os
import time
from typing import List

import h5py
import numpy as np

from ..config import DEFAULT_CAMERA_POSE, THUMBNAIL_DS_FACTOR, VIDEO_FPS, Paths


def save_video(path: str, img_arr: np.ndarray) -> None:
    """Reference AVI video of the capture (building.py:30-36)."""
    try:
        import cv2
    except ImportError:
        return
    fourcc = cv2.VideoWriter_fourcc(*"XVID")
    out = cv2.VideoWriter(path, fourcc, VIDEO_FPS, (img_arr.shape[2], img_arr.shape[1]))
    for img in img_arr:
        out.write(img)
    out.release()


def _imread(path: str) -> np.ndarray:
    import cv2

    return cv2.imread(path)


def _resize(img: np.ndarray, wh) -> np.ndarray:
    import cv2

    return cv2.resize(img, wh)


class Builder:
    def __init__(self, compression_level: int = 2):
        self.compression_level = compression_level
        self.build_start_time = time.time()

    # ------------------------------------------------------------ build
    def build_full(self, data_path: str, name: str = None) -> str:
        self._set_dest_path(data_path, name)
        self._get_filepaths_from_data_dir(data_path)
        self._load_json_data()
        self._load_imgs_and_depthmaps()
        self._make_preview()
        self._save_reference_video()
        self._make_camera_poses()
        return self._save_full()

    def remove_idxs(self, src: str, rm_idxs: List[int]) -> None:
        self._read_full(src)
        self.dest_path = os.path.dirname(src)
        keep = np.array([x for x in range(self.length) if x not in rm_idxs])
        self._filter(keep)
        self._save_full()

    def build_subset(self, src: str, sub_type: str, idxs: List[int]) -> None:
        self._read_full(src)
        dst = src.replace(".h5", f"_{sub_type}.h5")
        self._write_subset(dst, sub_type, np.array(idxs))

    def build_subsets(self, src: str, sub_types: List[str], idxs: List[List[int]]) -> None:
        self._read_full(src)
        for tp, idx in zip(sub_types, idxs):
            dst = src.replace(".h5", f"_{tp}.h5")
            self._write_subset(dst, tp, np.array(idx))

    # ------------------------------------------------------------ internals
    def _set_dest_path(self, data_path: str, name: str = None) -> None:
        if name is None:
            name = os.path.basename(os.path.normpath(data_path))
        self.dest_path = os.path.join(Paths().DATASETS, name)
        self.name = name
        os.makedirs(self.dest_path, exist_ok=True)

    def _get_filepaths_from_data_dir(self, data_path: str) -> None:
        find = lambda end: sorted(
            os.path.join(r, x)
            for r, _, files in os.walk(data_path)
            for x in files
            if x.endswith(end)
        )
        self.jsons_p, self.maps_p, self.imgs_p = (
            find(".json"), find(".npy"), find(".png")
        )
        self.jsons, self.maps, self.imgs = (
            [x.replace(data_path, "") for x in lst]
            for lst in (self.jsons_p, self.maps_p, self.imgs_p)
        )
        self.length = len(self.imgs)
        assert (
            len(self.jsons) == len(self.maps) == self.length
        ), "Unequal number of images, jsons, or maps"

    def _load_json_data(self) -> None:
        self.ang_arr = np.zeros((self.length, 6), float)
        self.pos_arr = np.zeros((self.length, 6, 3), float)
        depth_scale, intrin_depth, intrin_color = set(), set(), set()
        for idx, path in enumerate(self.jsons_p):
            with open(path) as f:
                d = json.load(f)
            info = d["realsense_info"][0]
            depth_scale.add(info["depth_scale"])
            intrin_depth.add(info["intrin_depth"])
            intrin_color.add(info["intrin_color"])
            joints = d["objects"][0]["joints"]
            for sub in range(6):
                self.ang_arr[idx, sub] = joints[sub]["angle"]
                self.pos_arr[idx, sub] = joints[sub].get("position", [0, 0, 0])
        assert (
            len(depth_scale) == len(intrin_depth) == len(intrin_color) == 1
        ), "Camera settings must be uniform over the dataset."
        self.depth_scale = depth_scale.pop()
        self.intrin_depth = intrin_depth.pop()
        self.intrin_color = intrin_color.pop()

    def _load_imgs_and_depthmaps(self) -> None:
        img = _imread(self.imgs_p[0])
        self.img_height, self.img_width = img.shape[:2]
        self.orig_img_arr = np.zeros(
            (self.length, self.img_height, self.img_width, 3), np.uint8
        )
        self.depthmap_arr = np.zeros(
            (self.length, self.img_height, self.img_width), np.float64
        )
        for idx, path in enumerate(self.imgs_p):
            self.orig_img_arr[idx] = _imread(path)
        for idx, path in enumerate(self.maps_p):
            self.depthmap_arr[idx] = np.load(path)
        self.depthmap_arr *= self.depth_scale

    def _make_preview(self) -> None:
        th, tw = (
            self.img_height // THUMBNAIL_DS_FACTOR,
            self.img_width // THUMBNAIL_DS_FACTOR,
        )
        self.thumbnails = np.zeros((self.length, th, tw, 3), np.uint8)
        for idx in range(self.length):
            self.thumbnails[idx] = _resize(self.orig_img_arr[idx], (tw, th))

    def _save_reference_video(self) -> None:
        save_video(os.path.join(self.dest_path, "og_vid.avi"), self.orig_img_arr)

    def _make_camera_poses(self) -> None:
        self.camera_poses = np.vstack([DEFAULT_CAMERA_POSE] * self.length)

    def _save_full(self) -> str:
        dest = os.path.join(self.dest_path, self.name + ".h5")
        if os.path.isfile(dest):
            os.remove(dest)
        gz = dict(compression="gzip", compression_opts=self.compression_level)
        with h5py.File(dest, "a") as f:
            f.attrs["name"] = self.name
            f.attrs["length"] = self.length
            f.attrs["build_date"] = str(datetime.datetime.now())
            f.attrs["compile_date"] = str(datetime.datetime.now())
            f.attrs["compile_time"] = time.time() - self.build_start_time
            f.attrs["resolution"] = self.orig_img_arr[0].shape[:-1]
            f.attrs["depth_intrinsics"] = self.intrin_depth
            f.attrs["color_intrinsics"] = self.intrin_color
            f.attrs["depth_scale"] = self.depth_scale
            f.create_dataset("angles", data=self.ang_arr, **gz)
            f.create_dataset("positions", data=self.pos_arr, **gz)
            coord = f.create_group("coordinates")
            dm = coord.create_dataset("depthmaps", data=self.depthmap_arr, **gz)
            dm.attrs["depth_scale"] = self.depth_scale
            img_grp = f.create_group("images")
            img_grp.create_dataset("original", data=self.orig_img_arr, **gz)
            img_grp.create_dataset("preview", data=self.thumbnails)
            img_grp.create_dataset("camera_poses", data=self.camera_poses)
            paths = f.create_group("paths")
            sd = h5py.string_dtype()
            paths.create_dataset("jsons", data=np.array(self.jsons, dtype=sd), **gz)
            paths.create_dataset("depthmaps", data=np.array(self.maps, dtype=sd), **gz)
            paths.create_dataset("images", data=np.array(self.imgs, dtype=sd), **gz)
        return dest

    def _read_full(self, path: str) -> None:
        with h5py.File(path, "r") as f:
            self.attrs = dict(f.attrs)
            self.name = f.attrs["name"]
            self.length = f.attrs["length"]
            self.intrin_depth = f.attrs["depth_intrinsics"]
            self.intrin_color = f.attrs["color_intrinsics"]
            self.depth_scale = f.attrs["depth_scale"]
            self.ang_arr = np.copy(f["angles"])
            self.pos_arr = np.copy(f["positions"])
            self.depthmap_arr = np.copy(f["coordinates/depthmaps"])
            self.orig_img_arr = np.copy(f["images/original"])
            self.thumbnails = np.copy(f["images/preview"])
            self.camera_poses = np.copy(f["images/camera_poses"])
            self.jsons = np.copy(f["paths/jsons"])
            self.maps = np.copy(f["paths/depthmaps"])
            self.imgs = np.copy(f["paths/images"])
            self.img_height, self.img_width = self.orig_img_arr.shape[1:3]

    def _filter(self, idxs: np.ndarray) -> None:
        self.length = len(idxs)
        for attr in (
            "ang_arr", "pos_arr", "depthmap_arr", "orig_img_arr",
            "thumbnails", "camera_poses", "jsons", "maps", "imgs",
        ):
            setattr(self, attr, getattr(self, attr)[idxs])

    def _write_subset(self, dst: str, sub_type: str, idxs: np.ndarray) -> None:
        full_state = {
            k: getattr(self, k)
            for k in (
                "length", "ang_arr", "pos_arr", "depthmap_arr", "orig_img_arr",
                "thumbnails", "camera_poses", "jsons", "maps", "imgs",
            )
        }
        self._filter(idxs)
        name_bak = self.name
        self.name = os.path.basename(dst).replace(".h5", "")
        self.dest_path = os.path.dirname(dst)
        self._save_full()
        self.name = name_bak
        for k, v in full_state.items():
            setattr(self, k, v)
