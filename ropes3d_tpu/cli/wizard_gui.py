"""Graphical management wizard (matplotlib widgets).

Capability parity with the reference PySimpleGUI Wizard
(``robotpose/wizards.py:28-371``): a tabbed window with

- **Data** tab — dataset selector, cycling preview thumbnails, View
  Details / Align / Verify buttons;
- **Training** tab — train/validate split sliders with live "New" and
  "Current" stacked split-bar graphs and an Update button that writes the
  split config and re-splits the dataset;
- **Prediction** tab — the ModelTree rendered per dataset, with
  delete-selected;
- **URDF** tab — active-URDF selection and a View Robot button that
  opens the interactive :class:`MeshViewer`.

PySimpleGUI is not in the image; matplotlib's widget toolkit is the
portable equivalent (works on any backend, including Agg for headless
tests — every callback is drivable without a display).  The terminal
wizard (``cli/wizard.py``) remains the SSH/headless entry; this module is
the at-a-glance visual workflow.
"""

from __future__ import annotations

import json
import os

import numpy as np

# Split-graph colors (reference wizards.py:308-310: green/blue/red).
_SPLIT_COLORS = {"train": "tab:green", "validate": "tab:blue", "ignore": "tab:red"}
_TABS = ("Data", "Training", "Prediction", "URDF")


class GraphicalWizard:
    """Tabbed dataset/training/model/URDF management window."""

    def __init__(self, fig=None):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button, RadioButtons, Slider, TextBox

        from ..config import Paths
        from ..data.dataset import DatasetInfo
        from ..robot import URDFReader

        self.paths = Paths()
        self.paths.create()
        self.info = DatasetInfo()
        self.urdf = URDFReader()
        self.datasets = list(self.info.compiled_sets) or ["<none>"]
        self.current_dataset = self.datasets[0]
        self._thumbs = None
        self._thumb_idx = 0

        self.fig = fig or plt.figure("Dataset Wizard", figsize=(9, 6.5))
        self._tab_axes: dict = {t: [] for t in _TABS}

        # --- tab bar
        self._tab_buttons = {}
        for i, t in enumerate(_TABS):
            bax = self.fig.add_axes([0.04 + i * 0.16, 0.93, 0.15, 0.05])
            b = Button(bax, t)
            b.on_clicked(lambda _e, t=t: self.show_tab(t))
            self._tab_buttons[t] = b

        # --- Data tab
        rax = self._ax("Data", [0.04, 0.45, 0.24, 0.42], title="Dataset")
        self._ds_radio = RadioButtons(rax, self.datasets)
        self._ds_radio.on_clicked(self._select_dataset)
        self._preview_ax = self._ax("Data", [0.32, 0.30, 0.64, 0.58])
        self._preview_ax.axis("off")
        self._detail_ax = self._ax("Data", [0.04, 0.05, 0.60, 0.20])
        self._detail_ax.axis("off")
        self._data_buttons = []
        for i, (label, cb) in enumerate(
            [
                ("View Details", self._show_details),
                ("Next Preview", self._next_thumbnail),
                ("Align", self._run_aligner),
                ("Verify", self._run_verifier),
            ]
        ):
            bax = self._ax("Data", [0.68 + (i % 2) * 0.15, 0.12 - (i // 2) * 0.07, 0.14, 0.05])
            b = Button(bax, label)
            b.on_clicked(lambda _e, cb=cb: cb())
            self._data_buttons.append(b)

        # --- Training tab
        applied = self._read_split(self.current_dataset)
        sax1 = self._ax("Training", [0.25, 0.78, 0.5, 0.05])
        sax2 = self._ax("Training", [0.25, 0.68, 0.5, 0.05])
        self._train_slider = Slider(sax1, "Train", 0.0, 1.0, valinit=applied["train"], valstep=0.05)
        self._val_slider = Slider(sax2, "Validate", 0.0, 1.0, valinit=applied["validate"], valstep=0.05)
        self._new_graph = self._ax("Training", [0.25, 0.45, 0.5, 0.07], title="New split")
        self._cur_graph = self._ax("Training", [0.25, 0.28, 0.5, 0.07], title="Current split")
        bax = self._ax("Training", [0.80, 0.74, 0.15, 0.06])
        self._update_btn = Button(bax, "Update")
        self._update_btn.on_clicked(lambda _e: self.apply_split())
        self._train_slider.on_changed(lambda _v: self._draw_split_graphs())
        self._val_slider.on_changed(lambda _v: self._draw_split_graphs())

        # --- Prediction tab
        self._tree_ax = self._ax("Prediction", [0.04, 0.18, 0.92, 0.70])
        self._tree_ax.axis("off")
        tax = self._ax("Prediction", [0.20, 0.06, 0.35, 0.06])
        self._model_box = TextBox(tax, "Model id ")
        bax = self._ax("Prediction", [0.60, 0.06, 0.22, 0.06])
        self._del_btn = Button(bax, "Delete Selected")
        self._del_btn.on_clicked(lambda _e: self.delete_model(self._model_box.text.strip()))

        # --- URDF tab
        uax = self._ax("URDF", [0.06, 0.35, 0.35, 0.5], title="Available URDFs")
        names = self.urdf.available_names or [self.urdf.name]
        self._urdf_radio = RadioButtons(
            uax, names, active=names.index(self.urdf.name) if self.urdf.name in names else 0
        )
        self._urdf_radio.on_clicked(self._select_urdf)
        self._urdf_label = self._ax("URDF", [0.5, 0.6, 0.45, 0.2])
        self._urdf_label.axis("off")
        bax = self._ax("URDF", [0.55, 0.35, 0.2, 0.07])
        self._view_btn = Button(bax, "View Robot")
        self._view_btn.on_clicked(lambda _e: self._run_meshviewer())

        self._refresh_all()
        self.show_tab("Data")

    # ---------------------------------------------------------------- utils
    def _ax(self, tab: str, rect, title: str = None):
        ax = self.fig.add_axes(rect)
        if title:
            ax.set_title(title, fontsize=9)
        self._tab_axes[tab].append(ax)
        return ax

    def show_tab(self, tab: str) -> None:
        """Switch the visible widget group (reference: sg.TabGroup)."""
        self.active_tab = tab
        for t, axes in self._tab_axes.items():
            for ax in axes:
                ax.set_visible(t == tab)
        self.fig.canvas.draw_idle()

    # ----------------------------------------------------------------- data
    def _select_dataset(self, name: str) -> None:
        self.current_dataset = name
        self._thumbs, self._thumb_idx = None, 0
        self._refresh_all()

    def _load_thumbnails(self):
        """Load the dataset's stored preview images (wizards.py:328-332)."""
        from ..data.dataset import Dataset

        if self.current_dataset == "<none>":
            return np.zeros((1, 90, 160, 3), np.uint8)
        ds = Dataset(self.current_dataset)
        try:
            t = np.array(ds.preview_img[:8])
        finally:
            ds.close()
        return t[..., ::-1] if t.ndim == 4 else t  # stored BGR -> RGB

    def _next_thumbnail(self) -> None:
        if self._thumbs is None:
            self._thumbs = self._load_thumbnails()
        self._thumb_idx = (self._thumb_idx + 1) % len(self._thumbs)
        self._draw_preview()

    def _draw_preview(self) -> None:
        if self._thumbs is None:
            self._thumbs = self._load_thumbnails()
        self._preview_ax.clear()
        self._preview_ax.imshow(self._thumbs[self._thumb_idx])
        self._preview_ax.set_title(
            f"{self.current_dataset}  [{self._thumb_idx + 1}/{len(self._thumbs)}]",
            fontsize=9,
        )
        self._preview_ax.axis("off")
        self.fig.canvas.draw_idle()

    def _show_details(self) -> None:
        from ..data.dataset import Dataset

        if self.current_dataset == "<none>":
            return
        ds = Dataset(self.current_dataset)
        try:
            text = "\n".join(f"{k}: {v}" for k, v in sorted(ds.attrs.items()))[:800]
        finally:
            ds.close()
        self._detail_ax.clear()
        self._detail_ax.axis("off")
        self._detail_ax.text(0, 1, text, va="top", fontsize=7, family="monospace")
        self.fig.canvas.draw_idle()

    def _run_aligner(self) -> None:
        from ..simulation.aligner import Aligner

        Aligner(self.current_dataset).run()

    def _run_verifier(self) -> None:
        from ..data.verification import Verifier

        v = Verifier(self.current_dataset)
        flagged = v.run()
        if flagged:
            v.remove(flagged)

    # ------------------------------------------------------------- training
    def _read_split(self, name: str) -> dict:
        cfg_path = self.paths.SPLIT_CONFIG
        cfg = {}
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
        return cfg.get(name, {"train": 0.7, "validate": 0.2, "ignore": 0.1})

    def split_values(self) -> dict:
        t = float(self._train_slider.val)
        v = min(float(self._val_slider.val), 1.0 - t)
        return {"train": t, "validate": v, "ignore": max(0.0, 1.0 - t - v)}

    def _draw_split_bar(self, ax, split: dict) -> None:
        ax.clear()
        ax.set_xlim(0, 1)
        ax.set_yticks([])
        ax.set_xticks([])
        left = 0.0
        for k in ("train", "validate", "ignore"):
            ax.barh(0, split[k], left=left, color=_SPLIT_COLORS[k], height=1.0)
            left += split[k]

    def _draw_split_graphs(self) -> None:
        self._draw_split_bar(self._new_graph, self.split_values())
        self._new_graph.set_title("New split", fontsize=9)
        self._draw_split_bar(self._cur_graph, self._read_split(self.current_dataset))
        self._cur_graph.set_title("Current split", fontsize=9)
        vis = getattr(self, "active_tab", "Training") == "Training"
        self._new_graph.set_visible(vis)
        self._cur_graph.set_visible(vis)
        self.fig.canvas.draw_idle()

    def apply_split(self) -> None:
        """Write the slider split to the config and re-split the dataset
        (reference _writeDatasetSplit + updateDatasetSplit)."""
        from ..data.annotation import refresh_split

        cfg_path = self.paths.SPLIT_CONFIG
        cfg = {}
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
        cfg[self.current_dataset] = self.split_values()
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=4)
        try:
            refresh_split(self.current_dataset)
        except Exception:
            pass  # raw/unbuilt datasets have no split to refresh
        self._draw_split_graphs()

    # ----------------------------------------------------------- prediction
    def _draw_model_tree(self) -> None:
        from ..training.model_registry import ModelTree

        self._tree_ax.clear()
        self._tree_ax.axis("off")
        self._tree_ax.text(
            0, 1, ModelTree().render()[:2000], va="top", fontsize=8,
            family="monospace",
        )
        self.fig.canvas.draw_idle()

    def delete_model(self, model_id: str) -> None:
        from ..training.model_registry import ModelTree

        if model_id and ModelTree().delete(model_id):
            self._draw_model_tree()

    # ----------------------------------------------------------------- urdf
    def _select_urdf(self, name: str) -> None:
        names, paths = self.urdf.available_names, self.urdf.available_paths
        if name in names:
            self.urdf.path = paths[names.index(name)]
        self._draw_urdf_label()

    def _draw_urdf_label(self) -> None:
        self._urdf_label.clear()
        self._urdf_label.axis("off")
        self._urdf_label.text(0, 0.5, f"Active: {self.urdf.name}", fontsize=11)
        self.fig.canvas.draw_idle()

    def _run_meshviewer(self) -> None:
        MeshViewer().run()

    # ------------------------------------------------------------------ run
    def _refresh_all(self) -> None:
        self._draw_preview()
        self._draw_split_graphs()
        self._draw_model_tree()
        self._draw_urdf_label()

    def run(self) -> None:
        import matplotlib.pyplot as plt

        plt.show()


class MeshViewer:
    """Interactive robot viewer (reference wizards.py:378-607): joint
    sliders, seg/real view modes, crop-to-fit, selected-link highlight,
    and a live orbit — slider or mouse-drag on the image."""

    _names = ("S", "L", "U", "R", "B", "T")

    def __init__(self, mode: str = "seg", intrin: str = "640_480_color_2"):
        from ..robot import URDFReader
        from ..simulation.renderer import Renderer

        self.rend = Renderer(mode, [0, -2.0, 1.0, 0, 0, 0], intrin)
        self.mode = mode
        self.crop = True
        self.highlight = True
        self.selected: int | None = None
        self.angles = np.zeros(6)
        self.orbit = 0.0
        self.limits = URDFReader().joint_limits

    # ------------------------------------------------------------ rendering
    def render(self) -> np.ndarray:
        """One frame at the current orbit/joints/mode -> RGB uint8."""
        r, z = 2.0, 1.0
        pose = [r * np.sin(self.orbit), -r * np.cos(self.orbit), z, 0, 0, self.orbit]
        self.rend.setCameraPose(pose)
        self.rend.setJointAngles(self.angles)
        color, depth = self.rend.render()
        img = np.asarray(color)[..., ::-1].copy()  # BGR -> RGB
        if self.highlight and self.selected is not None and self.mode == "seg":
            lid = np.asarray(self.rend.render_ids()[1])
            img[lid == self.selected] = (
                0.5 * img[lid == self.selected] + np.array([127, 127, 0])
            ).astype(np.uint8)
        if self.crop:
            img = self._crop_to_fit(img, np.asarray(depth) > 0)
        return img

    @staticmethod
    def _crop_to_fit(img: np.ndarray, hit: np.ndarray, pad: int = 10) -> np.ndarray:
        """Crop to the robot's extent + padding (wizards.py:542-562)."""
        ys, xs = np.where(hit)
        if len(ys) == 0:
            return img
        y1, y2 = max(0, ys.min() - pad), min(img.shape[0], ys.max() + pad)
        x1, x2 = max(0, xs.min() - pad), min(img.shape[1], xs.max() + pad)
        return img[y1:y2, x1:x2]

    def set_mode(self, mode: str) -> None:
        label = {"Segmented": "seg", "Realistic": "real"}.get(mode, mode)
        if label != self.mode:
            self.mode = label
            self.rend.setMode(label)

    # ------------------------------------------------------------------ gui
    def run(self):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button, CheckButtons, RadioButtons, Slider

        fig = plt.figure("Mesh Wizard", figsize=(11, 8))
        self.fig = fig
        ax = fig.add_axes([0.33, 0.30, 0.64, 0.66])
        im = [ax.imshow(self.render())]
        ax.axis("off")

        def redraw():
            ax.clear()
            ax.axis("off")
            im[0] = ax.imshow(self.render())
            fig.canvas.draw_idle()

        # View settings (radio + checkboxes)
        rax = fig.add_axes([0.04, 0.80, 0.2, 0.12])
        rax.set_title("Render mode", fontsize=9)
        radio = RadioButtons(rax, ("Segmented", "Realistic"), active=0 if self.mode == "seg" else 1)
        radio.on_clicked(lambda label: (self.set_mode(label), redraw()))

        cax = fig.add_axes([0.04, 0.66, 0.2, 0.10])
        checks = CheckButtons(cax, ("Crop To Fit", "Highlight Selected"), (self.crop, self.highlight))

        def on_check(label):
            if label == "Crop To Fit":
                self.crop = not self.crop
            else:
                self.highlight = not self.highlight
            redraw()

        checks.on_clicked(on_check)

        # Joint sliders + selection
        sliders = []
        for i in range(6):
            sax = fig.add_axes([0.08, 0.56 - i * 0.05, 0.16, 0.03])
            s = Slider(
                sax, self._names[i],
                np.degrees(self.limits[i, 0]), np.degrees(self.limits[i, 1]),
                valinit=0,
            )

            def on_joint(val, i=i):
                self.angles[i] = np.radians(val)
                self.selected = i
                redraw()

            s.on_changed(on_joint)
            sliders.append(s)

        # Orbit slider + reset buttons
        oax = fig.add_axes([0.33, 0.20, 0.5, 0.03])
        orbit = Slider(oax, "orbit", -180, 180, valinit=0)
        orbit.on_changed(lambda v: (setattr(self, "orbit", np.radians(v)), redraw()))
        b1 = Button(fig.add_axes([0.33, 0.08, 0.15, 0.06]), "Reset View")
        b1.on_clicked(lambda _e: orbit.set_val(0))
        b2 = Button(fig.add_axes([0.52, 0.08, 0.15, 0.06]), "Reset Joints")

        def reset_joints(_e):
            self.selected = None
            for s in sliders:
                s.set_val(0)

        b2.on_clicked(reset_joints)

        # Mouse-drag orbit on the preview (the reference's live-orbit feel).
        drag = {"x": None}

        def on_press(ev):
            if ev.inaxes is ax:
                drag["x"] = ev.x

        def on_move(ev):
            if drag["x"] is not None and ev.inaxes is ax:
                dx = ev.x - drag["x"]
                drag["x"] = ev.x
                orbit.set_val(np.clip(np.degrees(self.orbit) + dx * 0.5, -180, 180))

        def on_release(_ev):
            drag["x"] = None

        fig.canvas.mpl_connect("button_press_event", on_press)
        fig.canvas.mpl_connect("motion_notify_event", on_move)
        fig.canvas.mpl_connect("button_release_event", on_release)

        self._widgets = (radio, checks, sliders, orbit, b1, b2)
        plt.show()
        return fig


def main():
    GraphicalWizard().run()


if __name__ == "__main__":
    main()
