"""Interactive management wizard.

Capability port of the reference PySimpleGUI Wizard + MeshViewer
(``robotpose/wizards.py:28-607``): dataset management (list/details/
align/verify), train/test split editing, model browsing/deletion, and
active-URDF selection — as a terminal menu so it works over SSH and
headless (the reference GUI's job, not its widget toolkit, is the
capability).  ``MeshViewer`` provides the interactive robot viewer with
joint sliders via matplotlib.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np


class Wizard:
    def __init__(self):
        from ..config import Paths

        self.paths = Paths()
        self.paths.create()

    # ------------------------------------------------------------ sections
    def dataset_menu(self):
        from ..data.dataset import DatasetInfo

        info = DatasetInfo()
        print("\nDatasets:")
        for n in info.unique_sets:
            tag = "compiled" if n in info.compiled_sets else "raw zip"
            print(f"  {n} ({tag})")
        return info.unique_sets

    def dataset_details(self, name: str):
        from ..data.dataset import Dataset

        ds = Dataset(name)
        for k, v in ds.attrs.items():
            print(f"  {k}: {v}")
        ds.close()

    def split_menu(self, name: str, train: float = None, validate: float = None):
        from ..config import Paths
        from ..data.annotation import refresh_split

        cfg_path = Paths().SPLIT_CONFIG
        cfg = {}
        if os.path.isfile(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
        if train is not None:
            cfg[name] = {
                "train": train,
                "validate": validate if validate is not None else 1 - train,
                "ignore": max(0.0, 1 - train - (validate or (1 - train))),
            }
            with open(cfg_path, "w") as f:
                json.dump(cfg, f, indent=4)
            refresh_split(name)
        print(json.dumps(cfg.get(name, {}), indent=2))

    def model_menu(self):
        from ..training.model_registry import ModelTree

        tree = ModelTree()
        print("\nModels (by dataset):")
        print(tree.render())
        return tree.info.data

    def delete_model(self, model_id: str):
        from ..training.model_registry import ModelTree

        if ModelTree().delete(model_id):
            print(f"deleted {model_id}")
        else:
            print(f"no such model {model_id}")

    def urdf_menu(self, select: str = None):
        from ..robot import URDFReader

        u = URDFReader()
        print(f"\nActive URDF: {u.name}")
        for i, n in enumerate(u.available_names):
            print(f"  [{i}] {n}")
        if select is not None:
            paths = u.available_paths
            names = u.available_names
            if select in names:
                u.path = paths[names.index(select)]
                print(f"switched to {select}")
        return u.available_names

    # ------------------------------------------------------------ loop
    def run(self):
        actions = {
            "1": ("List datasets", self.dataset_menu),
            "2": ("Dataset details", lambda: self.dataset_details(input("name: "))),
            "3": ("Align camera pose", self._align),
            "4": ("Verify dataset", self._verify),
            "5": ("Edit split", lambda: self.split_menu(
                input("dataset: "), float(input("train: ")), float(input("validate: "))
            )),
            "6": ("List models", self.model_menu),
            "7": ("Delete model", lambda: self.delete_model(input("model id: "))),
            "8": ("URDF selection", lambda: self.urdf_menu(
                input("select (blank to list): ") or None
            )),
            "9": ("Mesh viewer", lambda: MeshViewer().run()),
            "q": ("Quit", None),
        }
        while True:
            print("\n=== ropes3d_tpu wizard ===")
            for k, (label, _) in actions.items():
                print(f"  {k}) {label}")
            choice = input("> ").strip()
            if choice == "q":
                return
            if choice in actions and actions[choice][1]:
                try:
                    actions[choice][1]()
                except Exception as e:  # keep the wizard alive
                    print(f"error: {e}")

    def _align(self):
        from ..simulation.aligner import Aligner

        Aligner(input("dataset: ")).run()

    def _verify(self):
        from ..data.verification import Verifier

        v = Verifier(input("dataset: "))
        flagged = v.run()
        if flagged:
            if input(f"delete {flagged}? [y/N] ").lower() == "y":
                v.remove(flagged)


def main():
    """``wizard.py [NAME [-rebuild]] [-gui|-terminal]`` — build a dataset or
    run the wizard (reference wizard.py:24-35).  With a display attached the
    graphical tabbed wizard opens (reference parity, wizards.py:28-371);
    headless/SSH sessions fall back to the terminal menu.  Flags override."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("dataset", nargs="?", default=None)
    p.add_argument("-rebuild", action="store_true")
    p.add_argument("-gui", action="store_true", help="force the graphical wizard")
    p.add_argument("-terminal", action="store_true", help="force the terminal menu")
    a = p.parse_args()
    if a.dataset:
        from ..data.dataset import Dataset

        Dataset(a.dataset, rebuild=a.rebuild)
        return
    use_gui = a.gui or (not a.terminal and bool(os.environ.get("DISPLAY")))
    if use_gui:
        from .wizard_gui import GraphicalWizard

        GraphicalWizard().run()
    else:
        Wizard().run()


class MeshViewer:
    """Interactive robot viewer with joint sliders (reference
    wizards.py:378-607) on matplotlib widgets."""

    def __init__(self, mode: str = "real", intrin: str = "640_480_color_2"):
        from ..simulation.renderer import Renderer

        self.rend = Renderer(mode, [0, -2.0, 1.0, 0, 0, 0], intrin)
        self.angles = np.zeros(6)
        self.orbit = 0.0

    def render(self) -> np.ndarray:
        # Orbit the camera about the robot base at fixed radius.
        r, z = 2.0, 1.0
        pose = [r * np.sin(self.orbit), -r * np.cos(self.orbit), z, 0, 0, self.orbit]
        self.rend.setCameraPose(pose)
        self.rend.setJointAngles(self.angles)
        color, _ = self.rend.render()
        return color

    def run(self):
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Slider

        from ..robot import URDFReader

        limits = URDFReader().joint_limits
        fig = plt.figure(figsize=(10, 8))
        ax = fig.add_axes([0.05, 0.35, 0.9, 0.6])
        im = ax.imshow(self.render()[..., ::-1])
        ax.axis("off")
        sliders = []
        names = ["S", "L", "U", "R", "B", "T"]
        for i in range(6):
            sax = fig.add_axes([0.15, 0.28 - i * 0.04, 0.6, 0.025])
            s = Slider(
                sax, names[i], np.degrees(limits[i, 0]), np.degrees(limits[i, 1]), valinit=0
            )
            sliders.append(s)
        oax = fig.add_axes([0.15, 0.02, 0.6, 0.025])
        orbit = Slider(oax, "orbit", -180, 180, valinit=0)

        def update(_):
            self.angles = np.radians([s.val for s in sliders])
            self.orbit = np.radians(orbit.val)
            im.set_data(self.render()[..., ::-1])
            fig.canvas.draw_idle()

        for s in (*sliders, orbit):
            s.on_changed(update)
        plt.show()
