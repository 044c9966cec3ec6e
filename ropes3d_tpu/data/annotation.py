"""Automatic annotation: renders -> labelme-format polygon JSON.

Parity port of ``robotpose/data/annotation.py:30-356``:
- ``Annotator`` converts a seg render into labelme polygon shapes via
  per-link contour extraction (the labelme JSON schema is written directly;
  the labelme package itself is only a GUI/format).
- ``AutomaticAnnotator`` renders a whole dataset (batched on device) and
  annotates frames in a host multiprocessing pool, then splits train/test.
- ``Splitter`` conservatively moves files between train/test/ignore with a
  ``split.json`` manifest; ``refresh_split`` applies data/split_config.json.
"""

from __future__ import annotations

import base64
import json
import multiprocessing as mp
import os
import random
import shutil
from typing import Dict, List

import numpy as np

from ..config import Paths
from ..utils import worker_count


def _find_contours(mask: np.ndarray) -> List[np.ndarray]:
    import cv2

    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
    )
    return contours


def _png_b64(image: np.ndarray) -> str:
    import cv2

    ok, buf = cv2.imencode(".png", image)
    return base64.b64encode(buf.tobytes()).decode()


class Annotator:
    """Render + image -> labelme JSON (reference annotation.py:30-127)."""

    def __init__(self, color_dict: Dict[str, list], pad_size: int = 5):
        self.color_dict = color_dict
        self.pad_size = pad_size

    def setDict(self, color_dict: Dict[str, list]) -> None:
        self.color_dict = color_dict

    def annotate(self, image: np.ndarray, render: np.ndarray, path: str) -> None:
        """Write ``path.json`` (labelme schema) + ``path.png``."""
        import cv2

        shapes = []
        for label, color in self.color_dict.items():
            mask = self._mask_color(render, color)
            if self.pad_size:
                mask = cv2.dilate(
                    mask.astype(np.uint8),
                    np.ones((self.pad_size, self.pad_size), np.uint8),
                )
            for contour in _find_contours(mask):
                pts = contour.reshape(-1, 2)
                if pts.shape[0] < 20:  # skip tiny fragments (annotation.py:84)
                    continue
                shapes.append(
                    {
                        "label": label,
                        "points": pts.astype(float).tolist(),
                        "group_id": None,
                        "shape_type": "polygon",
                        "flags": {},
                    }
                )
        data = {
            "version": "4.5.6",
            "flags": {},
            "shapes": shapes,
            "imagePath": os.path.basename(path) + ".png",
            "imageData": _png_b64(image),
            "imageHeight": image.shape[0],
            "imageWidth": image.shape[1],
        }
        cv2.imwrite(path + ".png", image)
        with open(path + ".json", "w") as f:
            json.dump(data, f)

    @staticmethod
    def _mask_color(render: np.ndarray, color) -> np.ndarray:
        # Unique blue channel identifies links (constants.py:79-90).
        return render[..., 0] == color[0]


def _annotate_worker(args):
    color_dict, image, render, path = args
    Annotator(color_dict).annotate(image, render, path)


class AutomaticAnnotator:
    """Dataset-wide annotation (reference annotation.py:130-217)."""

    def __init__(self, dataset: str, renderer=None, preview: bool = False):
        from ..simulation.renderer import DatasetRenderer
        from .dataset import Dataset

        self.ds = Dataset(dataset)
        self.rend = renderer or DatasetRenderer(dataset, mode="seg")
        self.preview = preview

    def run(self, train_split: float = 0.4, test_split: float = 0.1) -> str:
        dest = self.ds.link_anno_path
        os.makedirs(dest, exist_ok=True)
        color_dict = self.rend.color_dict
        jobs = []
        for i in range(self.ds.length):
            self.rend.setPosesFromDS(i)
            render, _ = self.rend.render()
            image = np.copy(self.ds.og_img[i])
            jobs.append((color_dict, image, render, os.path.join(dest, f"{i:05d}")))
        # Spawn context: forking a JAX-threaded process can deadlock.
        ctx = mp.get_context("spawn")
        with ctx.Pool(worker_count()) as pool:
            pool.map(_annotate_worker, jobs)
        Splitter(dest).split(train_split, test_split)
        return dest


class Splitter:
    """Conservative train/test/ignore file mover (annotation.py:220-344)."""

    SUBDIRS = ("train", "test", "ignore")

    def __init__(self, base_dir: str):
        self.base = base_dir
        self.manifest_path = os.path.join(base_dir, "split.json")
        self.load()

    def load(self) -> None:
        self.manifest = {}
        if os.path.isfile(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)

    def _all_stems(self) -> List[str]:
        stems = set()
        for d in ("", *self.SUBDIRS):
            p = os.path.join(self.base, d)
            if os.path.isdir(p):
                for x in os.listdir(p):
                    if x.endswith(".json") and x != "split.json":
                        stems.add(x[:-5])
        return sorted(stems)

    def split(self, train: float, test: float, seed: int = 0) -> None:
        """Assign unassigned stems and move files accordingly."""
        stems = self._all_stems()
        rng = random.Random(seed)
        unassigned = [s for s in stems if s not in self.manifest]
        rng.shuffle(unassigned)
        n = len(stems)
        want_train = int(round(train * n))
        want_test = int(round(test * n))
        counts = {"train": 0, "test": 0, "ignore": 0}
        for s in self.manifest.values():
            counts[s] = counts.get(s, 0) + 1
        for s in unassigned:
            if counts["train"] < want_train:
                dest = "train"
            elif counts["test"] < want_test:
                dest = "test"
            else:
                dest = "ignore"
            self.manifest[s] = dest
            counts[dest] += 1
        self._apply()

    def _apply(self) -> None:
        for d in self.SUBDIRS:
            os.makedirs(os.path.join(self.base, d), exist_ok=True)
        for stem, dest in self.manifest.items():
            for ext in (".json", ".png"):
                cur = self._find(stem + ext)
                if cur is None:
                    continue
                target = os.path.join(self.base, dest, stem + ext)
                if cur != target:
                    shutil.move(cur, target)
        with open(self.manifest_path, "w") as f:
            json.dump(self.manifest, f, indent=2)

    def _find(self, fname: str):
        for d in ("", *self.SUBDIRS):
            p = os.path.join(self.base, d, fname)
            if os.path.isfile(p):
                return p
        return None

    @property
    def ratios(self) -> Dict[str, float]:
        n = max(len(self.manifest), 1)
        out = {d: 0.0 for d in self.SUBDIRS}
        for v in self.manifest.values():
            out[v] += 1 / n
        return out

    def resplit(self, train: float, test: float, ignore: float = None) -> None:
        """Re-assign to match new ratios; no-ops when already matching
        (reference annotation.py:300-344)."""
        cur = self.ratios
        if abs(cur["train"] - train) < 0.01 and abs(cur["test"] - test) < 0.01:
            return
        self.manifest = {}
        self.split(train, test)


def refresh_split(dataset: str) -> None:
    """Apply data/split_config.json ratios to a dataset's annotations
    (reference annotation.py:346-356)."""
    from .dataset import Dataset

    try:
        ds = Dataset(dataset)
    except KeyError:
        return  # config may reference datasets not present on this machine
    cfg_path = Paths().SPLIT_CONFIG
    if not os.path.isfile(cfg_path):
        return
    with open(cfg_path) as f:
        cfg = json.load(f)
    if ds.attrs["name"] not in cfg:
        return
    c = cfg[ds.attrs["name"]]
    if os.path.isdir(ds.link_anno_path):
        Splitter(ds.link_anno_path).resplit(c["train"], c.get("validate", c.get("test", 0.1)))
