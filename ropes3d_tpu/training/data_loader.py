"""Training data: labelme annotation folders -> padded detection batches.

Reads the ``link_annotations/{train,test}`` folders produced by
``AutomaticAnnotator`` (the same on-disk format the reference feeds PixelLib,
train.py:52) and yields fixed-shape batches for the Mask R-CNN trainer.
"""

from __future__ import annotations

import base64
import json
import os
import random
from typing import Dict, Iterator, List, Tuple

import numpy as np

from ..models.inference import IMAGENET_MEAN, IMAGENET_STD


def _decode_image(data: dict, json_dir: str) -> np.ndarray:
    import cv2

    if data.get("imageData"):
        buf = np.frombuffer(base64.b64decode(data["imageData"]), np.uint8)
        return cv2.imdecode(buf, cv2.IMREAD_COLOR)
    return cv2.imread(os.path.join(json_dir, data["imagePath"]))


def load_annotation(path: str, class_names: List[str]):
    """One labelme JSON -> (image u8 [H,W,3], boxes [G,4], classes [G],
    masks [G,H,W] u8) with G = number of shapes."""
    import cv2

    with open(path) as f:
        data = json.load(f)
    img = _decode_image(data, os.path.dirname(path))
    h, w = img.shape[:2]
    boxes, classes, masks = [], [], []
    for shape in data["shapes"]:
        if shape["label"] not in class_names:
            continue
        pts = np.array(shape["points"], np.int32)
        mask = np.zeros((h, w), np.uint8)
        cv2.fillPoly(mask, [pts], 1)
        ys, xs = np.where(mask)
        if len(ys) == 0:
            continue
        boxes.append([ys.min(), xs.min(), ys.max() + 1, xs.max() + 1])
        classes.append(class_names.index(shape["label"]))
        masks.append(mask)
    return img, np.array(boxes, np.float32).reshape(-1, 4), np.array(
        classes, np.int32
    ), np.array(masks, np.uint8).reshape(-1, h, w)


class DetectionDataset:
    """Folder of labelme JSONs with fixed-shape sampling."""

    def __init__(
        self,
        anno_dir: str,
        class_names: List[str],
        image_hw: Tuple[int, int],
        max_gt: int,
        augment=None,
        seed: int = 0,
        in_channels: int = 3,
    ):
        # in_channels == 4 (RGB-D base models): labelme annotations carry
        # no depth, so the 4th channel is filled with the hole sentinel —
        # in-distribution because DeviceSynthPipeline drops the whole depth
        # channel at random during pretraining (synth_data.py drop_all).
        self.in_channels = in_channels
        self.files = sorted(
            os.path.join(anno_dir, f)
            for f in os.listdir(anno_dir)
            if f.endswith(".json") and f != "split.json"
        )
        if not self.files:
            raise FileNotFoundError(f"no annotations in {anno_dir}")
        self.class_names = class_names
        self.image_hw = image_hw
        self.max_gt = max_gt
        self.augment = augment
        self.rng = random.Random(seed)

    def __len__(self):
        return len(self.files)

    def _prepare(self, path: str):
        import cv2

        img, boxes, classes, masks = load_annotation(path, self.class_names)
        if self.augment is not None:
            img, boxes, classes, masks = self.augment(img, boxes, classes, masks)
        h, w = img.shape[:2]
        mh, mw = self.image_hw
        scale = min(mh / h, mw / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        img_r = cv2.resize(img, (nw, nh))
        canvas = np.zeros((mh, mw, 3), np.float32)
        canvas[:nh, :nw] = img_r
        canvas = (canvas - IMAGENET_MEAN) / IMAGENET_STD
        if self.in_channels == 4:
            from ..models.inference import DEPTH_HOLE

            canvas = np.concatenate(
                [canvas, np.full((mh, mw, 1), DEPTH_HOLE, np.float32)], -1
            )

        G = self.max_gt
        out_boxes = np.zeros((G, 4), np.float32)
        out_cls = np.zeros((G,), np.int32)
        out_masks = np.zeros((G, mh, mw), np.float32)
        keep = np.argsort(
            -(boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        )[:G] if len(boxes) else []
        for j, i in enumerate(keep):
            out_boxes[j] = boxes[i] * scale
            out_cls[j] = classes[i]
            m = cv2.resize(masks[i].astype(np.float32), (nw, nh))
            out_masks[j, :nh, :nw] = m
        return canvas, out_boxes, out_cls, out_masks

    def batches(self, batch_size: int, shuffle: bool = True) -> Iterator[Dict]:
        order = list(range(len(self.files)))
        if shuffle:
            self.rng.shuffle(order)
        # Round up to full batches by wrapping (static shapes).
        while len(order) % batch_size:
            order.append(order[len(order) % batch_size])
        for i in range(0, len(order), batch_size):
            items = [self._prepare(self.files[j]) for j in order[i : i + batch_size]]
            yield {
                "images": np.stack([x[0] for x in items]),
                "boxes": np.stack([x[1] for x in items]),
                "classes": np.stack([x[2] for x in items]),
                "masks": np.stack([x[3] for x in items]),
            }
