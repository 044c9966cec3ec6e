"""Headless drives of the visualisation and wizard tooling."""

import os

import numpy as np
import pytest


def test_projection_viz_composite(monkeypatch, tmp_path):
    monkeypatch.setenv("ROPES3D_HEADLESS", "1")
    from ropes3d_tpu.prediction.viz import ProjectionViz

    video = str(tmp_path / "out.avi")
    viz = ProjectionViz(video_path=video, resolution=(320, 180))
    rng = np.random.default_rng(0)
    viz.loadTargetColor(rng.integers(0, 255, (90, 160, 3), np.uint8))
    viz.loadTargetDepth(rng.uniform(0, 2, (90, 160)))
    viz.loadSegmentedLinks(rng.integers(0, 255, (90, 160, 3), np.uint8))
    viz.loadRenderedColor(rng.integers(0, 255, (90, 160, 3), np.uint8))
    viz.loadRenderedDepth(rng.uniform(0, 2, (90, 160)))
    frame = viz.show()
    assert frame.shape == (180, 320, 3)
    assert frame.any()
    viz.loadRenderedDepth(rng.uniform(0, 2, (90, 160)))
    frame2 = viz.show()
    assert frame2.shape == (180, 320, 3)
    del viz
    assert os.path.isfile(video) and os.path.getsize(video) > 0


def test_wizard_menus_headless(monkeypatch, tmp_path):
    import json

    (tmp_path / "data").mkdir()
    with open(tmp_path / "data" / "paths.json", "w") as f:
        json.dump(
            {
                "URDFS": os.path.join(os.environ["ROPES3D_REPO"], "urdfs/"),
                "URDF": os.path.join(
                    os.environ["ROPES3D_REPO"],
                    "urdfs/motoman_mh5_support_limited/urdf/mh5l_limited.urdf",
                ),
            },
            f,
        )
    monkeypatch.setenv("ROPES3D_ROOT", str(tmp_path))
    from ropes3d_tpu.cli.wizard import Wizard

    w = Wizard()
    assert w.dataset_menu() == []
    models = w.model_menu()
    assert isinstance(models, dict)
    names = w.urdf_menu()
    assert "mh5l_limited" in names
    # Split config write + readback.
    w.split_menu("fake", train=0.7, validate=0.3)
    from ropes3d_tpu.config import Paths

    with open(Paths().SPLIT_CONFIG) as f:
        cfg = json.load(f)
    assert cfg["fake"]["train"] == 0.7


def test_color_array_colormap():
    from ropes3d_tpu.ops.image import color_array

    x = np.zeros((8, 8))
    x[2:6, 2:6] = np.linspace(1, 2, 16).reshape(4, 4)
    out = color_array(x)
    assert out.shape == (8, 8, 3) and out.dtype == np.uint8
    assert (out[0, 0] == 0).all()  # zeros stay black
    assert out[2:6, 2:6].any()


def test_graphical_wizard_headless():
    """Drive the matplotlib tabbed wizard (Agg backend): tab switching,
    split sliders + bar graphs, previews, model tree — no display needed."""
    import matplotlib

    matplotlib.use("Agg")
    from ropes3d_tpu.cli.wizard_gui import GraphicalWizard

    w = GraphicalWizard()
    assert w.active_tab == "Data"
    for tab in ("Training", "Prediction", "URDF", "Data"):
        w.show_tab(tab)
        assert w.active_tab == tab
    w._train_slider.set_val(0.6)
    w._val_slider.set_val(0.3)
    sv = w.split_values()
    assert abs(sv["train"] - 0.6) < 1e-9
    assert abs(sv["ignore"] - 0.1) < 1e-6
    # validate is clamped so train+validate never exceeds 1.
    w._train_slider.set_val(0.9)
    w._val_slider.set_val(0.5)
    assert w.split_values()["validate"] <= 0.1 + 1e-9
    w._next_thumbnail()
    w._show_details()
    w.delete_model("no-such-model")  # no-op, must not raise


def test_meshviewer_modes_headless():
    """MeshViewer render modes, crop-to-fit and highlight (Agg backend)."""
    import matplotlib

    matplotlib.use("Agg")
    from ropes3d_tpu.cli.wizard_gui import MeshViewer

    mv = MeshViewer()
    full = mv.render()
    assert full.ndim == 3 and full.dtype == np.uint8
    mv.crop = False
    uncropped = mv.render()
    assert uncropped.shape[0] >= full.shape[0]  # crop-to-fit shrinks
    mv.set_mode("Realistic")
    assert mv.mode == "real"
    real = mv.render()
    assert real.shape == uncropped.shape
    mv.set_mode("Segmented")
    mv.selected, mv.highlight = 2, True
    hi = mv.render()
    assert hi.shape == uncropped.shape and hi.any()
    mv.orbit = np.pi / 2
    side = mv.render()
    assert side.any()
