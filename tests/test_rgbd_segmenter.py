"""RGB-D segmenter path: config round-trip, depth-channel preprocessing,
and inference with/without a depth map.

The 4th (depth) input channel is the TPU-native replacement for the
reference's COCO-pretrained backbone advantage (reference
robotpose/training/__init__.py:10-15) — geometry disambiguates clutter
that defeats color features.  These tests cover the plumbing on a tiny
model; accuracy comes from the real bootv3 training budget on TPU.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ropes3d_tpu.models.inference import DEPTH_HOLE, Segmenter, normalize_depth
from ropes3d_tpu.models.mask_rcnn import MaskRCNN, MaskRCNNConfig

CLASSES = ["BG", "a", "b", "c", "d", "e", "f"]


@pytest.fixture(scope="module")
def rgbd_ckpt(tmp_path_factory):
    """Save a tiny RGB-D model the way training/bootstrap.py does."""
    import orbax.checkpoint as ocp

    cfg = MaskRCNNConfig.tiny(in_channels=4)
    model = MaskRCNN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((*cfg.image_hw, cfg.in_channels))
    )
    out_dir = tmp_path_factory.mktemp("rgbd_model")
    with open(out_dir / "model_config.json", "w") as f:
        json.dump(
            {
                "num_classes": cfg.num_classes,
                "in_channels": cfg.in_channels,
                "depth": cfg.depth,
                "image_hw": list(cfg.image_hw),
                "max_gt": cfg.max_gt,
                "pre_nms_topk": cfg.pre_nms_topk,
                "num_proposals": cfg.num_proposals,
                "roi_size": cfg.roi_size,
                "mask_roi_size": cfg.mask_roi_size,
                "max_detections": cfg.max_detections,
                "anchor_scales": list(cfg.anchor_scales),
            },
            f,
        )
    ckpt = os.path.join(out_dir, "ckpt_0001")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        ckpt,
        {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
    )
    ckptr.wait_until_finished()
    return ckpt


def test_config_roundtrip_in_channels(rgbd_ckpt):
    seg = Segmenter(rgbd_ckpt, CLASSES)
    assert seg.cfg.in_channels == 4
    assert seg.cfg.depth == 18  # tiny() override survives the JSON round-trip


def test_preprocess_depth_channel(rgbd_ckpt):
    seg = Segmenter(rgbd_ckpt, CLASSES)
    mh, mw = seg.cfg.image_hw
    img = np.full((48, 64, 3), 128, np.uint8)
    dep = np.full((48, 64), 1.5, np.float32)
    dep[10:20, 10:20] = 0.0  # sensor hole
    canvas, scale, (h, w) = seg.preprocess(img, dep)
    assert canvas.shape == (mh, mw, 4)
    dch = np.asarray(canvas[..., 3])
    # Holes map to the sentinel, valid depth to its normalised value.
    expect_valid = float(normalize_depth(jnp.asarray(1.5)))
    nh = int(round(h * scale))
    nw = int(round(w * scale))
    assert np.isclose(dch[0, 0], expect_valid, atol=1e-5)
    assert np.isclose(dch[int(15 * scale), int(15 * scale)], DEPTH_HOLE)
    # Letterbox padding outside the resized image is hole-valued too.
    if nh < mh:
        assert np.isclose(dch[-1, 0], DEPTH_HOLE)
    # RGB channels keep the 3-channel normalisation (pad = normalised black).
    assert canvas.shape[-1] == 4


def test_preprocess_missing_depth_is_all_hole(rgbd_ckpt):
    seg = Segmenter(rgbd_ckpt, CLASSES)
    img = np.full((64, 64, 3), 90, np.uint8)
    canvas, _, _ = seg.preprocess(img, None)
    assert np.allclose(np.asarray(canvas[..., 3]), DEPTH_HOLE)


def test_segment_runs_with_and_without_depth(rgbd_ckpt):
    seg = Segmenter(rgbd_ckpt, CLASSES)
    img = (np.random.default_rng(0).uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    dep = np.random.default_rng(1).uniform(0.5, 3.0, (64, 64)).astype(np.float32)
    links_d, vis_d = seg.segment(img, dep)
    links_n, vis_n = seg.segment(img, None)
    # Untrained net: just verify the contract (dict of name -> mask, vis image).
    for links in (links_d, links_n):
        for name, d in links.items():
            assert name in CLASSES[1:]
            assert d["mask"].shape == img.shape[:2]
            assert 0.0 <= d["confidence"] <= 1.0
    assert vis_d.shape == img.shape and vis_n.shape == img.shape


def test_rgb_model_rejects_depth_gracefully(rgbd_ckpt):
    """An RGB (3-channel) Segmenter ignores a supplied depth map."""
    import orbax.checkpoint as ocp

    cfg = MaskRCNNConfig.tiny()
    model = MaskRCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((*cfg.image_hw, 3)))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(rgbd_ckpt)), "rgb_model")
    ckpt = os.path.join(out_dir, "ckpt_0001")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt, {"params": variables["params"], "batch_stats": {}})
    ckptr.wait_until_finished()
    seg = Segmenter(ckpt, CLASSES, cfg=cfg)
    img = np.zeros((64, 64, 3), np.uint8)
    canvas, _, _ = seg.preprocess(img, np.ones((64, 64), np.float32))
    assert canvas.shape[-1] == 3
