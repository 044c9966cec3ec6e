"""Segmentation model registry and selection.

Parity port of ``robotpose/training/models.py:28-324``: per-model
``ModelData.json`` metadata, a ``models/models.json`` index, checkpoint
pruning to the newest ``NUM_MODELS_TO_KEEP``, and ``dynamicLoad`` best-match
selection with static and dynamic (closest/above/below) criteria.
Checkpoints are orbax directories named ``ckpt_NNNN`` instead of Keras
``.h5`` files.
"""

from __future__ import annotations

import datetime
import json
import os
import random
import shutil
import string
from typing import List, Optional

import numpy as np

from ..config import (
    MODEL_NAME_LENGTH,
    MODELDATA_FILE_NAME,
    NUM_MODELS_TO_KEEP,
    Paths,
)
from ..compact_json import CompactJSONEncoder


def _ckpt_epoch(name: str) -> Optional[int]:
    if name.startswith("ckpt_"):
        try:
            return int(name.split("_")[1])
        except (IndexError, ValueError):
            return None
    return None


class ModelData:
    """Per-model metadata wrapper around ModelData.json."""

    def __init__(self, model_dir: str):
        self.path = os.path.join(model_dir, MODELDATA_FILE_NAME)
        self.data = {}
        if os.path.isfile(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    def write(self) -> None:
        with open(self.path, "w") as f:
            f.write(CompactJSONEncoder(indent=4).encode(self.data))

    def __getitem__(self, k):
        return self.data[k]

    def __setitem__(self, k, v):
        self.data[k] = v

    def get(self, k, default=None):
        return self.data.get(k, default)


class ModelInfo:
    """Walks models/, refreshes epoch counts, prunes old checkpoints, and
    writes models/models.json (reference models.py:60-127)."""

    def __init__(self):
        self.update()

    def update(self) -> None:
        p = Paths()
        os.makedirs(p.MODELS, exist_ok=True)
        self.data = {}
        for name in sorted(os.listdir(p.MODELS)):
            d = os.path.join(p.MODELS, name)
            if not os.path.isdir(d):
                continue
            md_path = os.path.join(d, MODELDATA_FILE_NAME)
            if not os.path.isfile(md_path):
                continue
            md = ModelData(d)
            epochs = self._getEpochs(d)
            md["epochs_trained"] = max(epochs) if epochs else 0
            md.write()
            self._cleanup(d, epochs)
            self.data[name] = dict(md.data, path=d)
        self._write()

    @staticmethod
    def _getEpochs(model_dir: str) -> List[int]:
        out = []
        for f in os.listdir(model_dir):
            e = _ckpt_epoch(f)
            if e is not None:
                out.append(e)
        return sorted(out)

    @staticmethod
    def _cleanup(model_dir: str, epochs: List[int]) -> None:
        """Keep only the newest NUM_MODELS_TO_KEEP checkpoints."""
        for e in epochs[:-NUM_MODELS_TO_KEEP]:
            shutil.rmtree(os.path.join(model_dir, f"ckpt_{e:04d}"), ignore_errors=True)

    def _write(self) -> None:
        with open(Paths().MODEL_INFO_JSON, "w") as f:
            f.write(CompactJSONEncoder(indent=4).encode(self.data))


class ModelManager(ModelInfo):
    """Model allocation + best-match selection (models.py:130-324)."""

    def allocateNew(self, dataset: str, classes: List[str], **extra) -> str:
        """Create a new random-4-letter model dir with metadata; returns path."""
        p = Paths()
        os.makedirs(p.MODELS, exist_ok=True)
        while True:
            name = "".join(
                random.choice(string.ascii_lowercase)
                for _ in range(MODEL_NAME_LENGTH)
            )
            d = os.path.join(p.MODELS, name)
            if not os.path.exists(d):
                break
        os.makedirs(d)
        md = ModelData(d)
        md.data = {
            "id": name,
            "dataset": dataset,
            "classes": list(classes),
            "num_classes": len(classes),
            "epochs_trained": 0,
            "date": str(datetime.datetime.now()),
            **extra,
        }
        md.write()
        self.update()
        return d

    def loadByID(self, model_id: str) -> Optional[str]:
        """Newest checkpoint path of a model id."""
        self.update()
        if model_id not in self.data:
            return None
        d = self.data[model_id]["path"]
        epochs = self._getEpochs(d)
        if not epochs:
            return None
        return os.path.join(d, f"ckpt_{epochs[-1]:04d}")

    def dynamicLoad(self, **criteria) -> Optional[str]:
        """Best-match model selection (models.py:191-324).

        Static criteria (exact match): dataset, classes, num_classes, id.
        Dynamic criteria via prefixed keys: ``closest_<k>``, ``above_<k>``,
        ``below_<k>`` for numeric metadata (train_size, epochs_trained, ...).
        Ties break to the most recent model.  Returns newest ckpt path.
        """
        self.update()
        cands = dict(self.data)

        for k, v in criteria.items():
            if k.startswith(("closest_", "above_", "below_")):
                continue
            cands = {n: m for n, m in cands.items() if m.get(k) == v}

        for k, v in criteria.items():
            if k.startswith("above_"):
                key = k[len("above_"):]
                cands = {n: m for n, m in cands.items() if m.get(key, -np.inf) >= v}
            elif k.startswith("below_"):
                key = k[len("below_"):]
                cands = {n: m for n, m in cands.items() if m.get(key, np.inf) <= v}

        for k, v in criteria.items():
            if k.startswith("closest_") and cands:
                key = k[len("closest_"):]
                dists = {n: abs(m.get(key, np.inf) - v) for n, m in cands.items()}
                best = min(dists.values())
                cands = {n: cands[n] for n, d in dists.items() if d == best}

        if not cands:
            return None
        # A model an A/B benchmark has measured as WORSE than a specific
        # alternative carries ``superseded_by: <winner-id>`` in its
        # ModelData — newest-first recency must not silently override a
        # published measurement (round-4 verdict: bootv3 became default
        # purely by timestamp).  Explicit criteria (id=...) still load it.
        if "id" not in criteria:
            live = {n: m for n, m in cands.items()
                    if not m.get("superseded_by")}
            cands = live or cands
        # Most recent wins ties.
        name = max(cands, key=lambda n: cands[n].get("date", ""))
        return self.loadByID(name)


class ModelTree:
    """Model browser tree grouped by dataset (reference models.py:332-382).

    The reference renders a PySimpleGUI ``Tree`` for the Wizard's Prediction
    tab; here the same structure is a plain nested dict plus a text
    rendering, so it works headless and under any front-end.  Supports
    select-by-key and delete, matching the reference tree's delete flow
    (wizards.py:241-260).
    """

    def __init__(self):
        self.info = ModelInfo()

    @property
    def tree(self) -> dict:
        """{dataset: {model_id: metadata}} sorted by dataset then date."""
        out: dict = {}
        for name, m in self.info.data.items():
            out.setdefault(m.get("dataset", "?"), {})[name] = m
        return {
            ds: dict(
                sorted(models.items(), key=lambda kv: kv[1].get("date", ""))
            )
            for ds, models in sorted(out.items())
        }

    def render(self) -> str:
        lines = []
        for ds, models in self.tree.items():
            lines.append(ds)
            for name, m in models.items():
                lines.append(
                    f"  └ {name}  epochs={m.get('epochs_trained', 0)}"
                    f"  classes={m.get('num_classes', '?')}"
                    f"  {m.get('date', '')[:19]}"
                )
        return "\n".join(lines) if lines else "(no models)"

    def get(self, model_id: str) -> Optional[dict]:
        return self.info.data.get(model_id)

    def delete(self, model_id: str) -> bool:
        if model_id not in self.info.data:
            return False
        shutil.rmtree(self.info.data[model_id]["path"], ignore_errors=True)
        self.info.update()
        return True
