"""Configuration: path registry and framework constants.

TPU-native re-implementation of the reference's config layer
(``robotpose/paths.py:18-41`` and ``robotpose/constants.py:11-92``).
Keeps the same knob names and ``data/paths.json`` schema for parity, but
replaces the ``exec``-based attribute loading with an explicit registry and
replaces the GPU-VRAM heuristics with HBM-aware budgets (see
``simulation/lookup.py``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

MAX_LINKS = 7

# Shared-file IPC for live robot coupling (reference: constants.py:16).
# Overridable because the reference hardcodes a Windows UNC path.
JSON_LINK_FILE = os.environ.get("ROPES3D_JOINT_STATES", "joint_states.json")

# ---------------------------------------------------------------- Crops
CROP_RENDER_WEIGHTING = [6, 3, 3, 0, 1, 0]  # per-joint render weighting
CROP_VARYING = "SLUB"  # joints varied when accumulating reachable silhouette
CROP_MAX_PER_JOINT = 50
CROP_SEC_ALLOTTED_APPROX = 20
CROP_PADDING = 10

# ---------------------------------------------------------------- Meshes
# Per-link triangle budget for the rasterizer scene (QEM-decimated).
# Render cost scales ~linearly in this; 256 wins the accuracy/speed tradeoff
# on 24-pose closed-loop evals (median 0.46deg vs 0.55deg at 144).
DEFAULT_MAX_TRIS_PER_LINK = 256

# ---------------------------------------------------------------- Lookups
# Fraction of device memory the resident depth-lookup stack may occupy.
# Reference budgets 10% of nvidia-smi VRAM (constants.py:28); here the
# budget is against TPU HBM (or host RAM on CPU backends).
HBM_MEMORY_ALLOWED_FOR_LOOKUP = 0.1
# Storage dtype of the device-resident lookup depth stack.  "bfloat16"
# halves the HBM traffic of the (bandwidth-bound) lookup argmin; the ~0.4%
# value quantization can flip near-tied seeds vs the reference's f32
# comparison (downstream stages re-optimize either seed).  Set to
# "float32" for bit-parity seed selection.
LOOKUP_STACK_DTYPE = "bfloat16"
LOOKUP_NAME_LENGTH = 5
LOOKUP_MAX_DIV_PER_LINK = 200
LOOKUP_JOINTS = "SLU"
LOOKUP_NUM_RENDERED = 6

# Staged top-k: with lookup_topk=k, all k seeds run the cheap early stages
# (flips + sweeps + coarse descent); only the best TOPK_FINAL survivors run
# the expensive final descent + polish.  Measured on 150 synthetic frames
# (160x90, SLU): k=4 with TOPK_FINAL=1 gives p90 err 1.39 deg, TOPK_FINAL=k
# (full per-seed) 0.96 deg at ~1.8x the device time; 2 recovers most of the
# gap for one extra final-descent lane.
TOPK_FINAL = 2

# Diversity-enforced lookup seeding (robust/neural lanes only): greedy NMS
# in angle space when picking the top-k lookup seeds — each successive seed
# must differ from every earlier pick by at least this many radians (L-inf
# over joints).  Plain top-k returns k near-copies of ONE basin (the stack
# is a dense grid; round-4 diag_misrank2 found the true basin ranked
# 137-10792 behind thousands of wrong-basin neighbours on every cluttered
# failure), so extra seeds bought no recall.  0 disables.  Parity lanes
# (robust_tau=None) always use plain top-k.
LOOKUP_SEED_NMS_SEP = 0.2  # rad (~11.5 deg)

# Depth gating (neural target prep only): real/cluttered depth frames carry
# valid range values *everywhere*, so segmentation-mask spill (the dilate-8
# body closure) and occluders inside a detection pull the depth-error terms
# toward clutter.  Gate masked depth against the mask's median: pixels more
# than the half-window from the median zero out (zero depth is already
# ignored by every error formula, ops/error.py).  BODY gates the union/body
# closure (kills background-plane spill); LINK gates each link's bundle
# slice (kills most foreground occluder pixels).  Synthetic prep is exact
# link-id masks over robot-only depth — never gated (bit-parity).
DEPTH_GATE_BODY = 1.2  # m, half-window around the body median
DEPTH_GATE_LINK = 0.45  # m, half-window around each link's median

# Robust depth-residual truncation (neural target prep only): every depth
# residual in the candidate error is clipped at min(|diff|, tau) meters.
# With imperfect segmenter masks the parity depth term is dominated by
# mask-xor pixels each contributing full depth magnitude (~1.5-2 m x10) —
# a pose-independent error floor ~50x the pose signal (measured
# err(true) ~= err(80-deg-wrong) on cluttered frames, assets/diag_terms.py).
# Truncation makes the term scale with xor *count* (pose geometry) while
# keeping small true residuals exact.  Synthetic/parity paths never
# truncate (tau=None -> +inf in the kernels, bit-exact reference formula).
ERROR_ROBUST_TAU = 0.1  # m

# Early-stop scaling in robust mode: the descent's relative-improvement
# stop (reference predict.py:223-230 — stop when the error history's drift
# is < early_stop_thresh of the TOTAL error) assumes the error goes to ~0
# at convergence.  Cluttered/neural targets carry an irreducible robust
# floor (err(true pose) ~ 1-3, assets/diag_misrank2.py), which inflates
# the denominator and halts descent while real angular progress is still
# being made (measured: seeded 2-6-deg-away starts ending 2-33 deg off,
# with err(returned) > err(true)).  In robust mode every Descent stage's
# early_stop_thresh is multiplied by this scale; 0.0 disables the relative
# test entirely, leaving the step-collapse + history-stall stops (c2/c3)
# and the iteration cap to terminate.  Parity (tau=None) lanes unaffected.
ROBUST_EARLY_STOP_SCALE = 0.0

# Fine-polish pass: after the staged recipe, a pattern search evaluated at
# FINE_POLISH_SCALE x the working resolution (target prepared at the same
# scale inside the fused program).  The working-res error landscape
# plateaus at ~1 px of joint subtense; 2x evaluation halves that floor for
# ~FINE_POLISH_RADII batched evals.  Disabled automatically when the
# scaled frame no longer fits the fused kernel's VMEM bound.
FINE_POLISH_SCALE = 2
FINE_POLISH_RADII = (0.004, 0.0016)

# ---------------------------------------------------------------- Seg models
MODELDATA_FILE_NAME = "ModelData.json"
NUM_MODELS_TO_KEEP = 3
MODEL_NAME_LENGTH = 4

# Inference-time detector settings (Segmenter).  The Mask R-CNN is fully
# convolutional with config-derived anchors, so trained weights run at any
# input resolution divisible by 64; smaller inputs cut detector latency
# roughly quadratically.  SEG_INFER_HW=None keeps each model's trained
# size.  SEG_INFER_BF16 runs the forward pass in bfloat16 (MXU-native;
# outputs cast back to float32).  Defaults follow the measured
# IoU-vs-latency curve in BENCHMARKS.md (assets/eval_seg_latency.py).
SEG_INFER_HW = None
# Round-5 measured curve (bootv3, 20 shared cluttered frames, frame-space
# IoU@GT>=100px): bf16 is accuracy-free (0.558 vs 0.558 fp32) while
# cutting detector latency ~1.5x; resolution cuts are NOT free (448:
# -0.045 IoU, 384: -0.165) — so bf16 is the default and the input size
# stays at each model's trained resolution.
SEG_INFER_BF16 = True

# ---------------------------------------------------------------- Wizard
WIZARD_DATASET_PREVIEW = True

# ---------------------------------------------------------------- Verifier
VERIFIER_ALPHA = 0.7
VERIFIER_SELECTED_GAMMA = -50
VERIFIER_SCALER = 1.5
VERIFIER_ROWS = 4
VERIFIER_COLUMNS = 4

# ---------------------------------------------------------------- Datasets
VIDEO_FPS = 15
THUMBNAIL_DS_FACTOR = 6
DEFAULT_CAMERA_POSE = [0, -1.5, 0.75, 0, 0, 0]


# ---------------------------------------------------------------- Rendering
def default_render_color_maker(num: int) -> List[List[int]]:
    """Generate ``num`` RGB triplets with unique blue values.

    Parity with reference ``constants.py:65-90``: blue channel is a unique
    linspace over [0, 255] so link identity can be recovered from the blue
    value alone.  The TPU renderer natively produces an integer link-id map,
    and colors are only used when materialising RGB previews.
    """
    b = np.linspace(0, 255, num).astype(int)
    r = np.abs(255 - 2 * b)
    return [[int(b[i]), 0, int(r[i])] for i in range(num)]


DEFAULT_RENDER_COLORS = default_render_color_maker(7)


# ---------------------------------------------------------------- Paths
_DEFAULT_PATHS = {
    "DATASETS": "data/",
    "DATASET_INFO_JSON": "data/datasets.json",
    "RAW_DATA": "data/raw/",
    "ROBOT_LOOKUPS": "lookup/",
    "ROBOT_LOOKUP_INFO": "lookup/lookups.json",
    "MODELS": "models/",
    "MODEL_INFO_JSON": "models/models.json",
    "OUTPUT": "output/",
    "BASE_MODEL": "models/base_model",
    "VIDEO": "output/video.avi",
    "URDFS": "urdfs/",
    "URDF": "urdfs/motoman_mh5_support_limited/urdf/mh5l_limited.urdf",
    "SPLIT_CONFIG": "data/split_config.json",
    "CROP_DATA": "lookup/crop_data.h5",
}

_DIR_KEYS = ("DATASETS", "RAW_DATA", "ROBOT_LOOKUPS", "MODELS", "OUTPUT", "URDFS")


class Paths:
    """Path registry backed by ``data/paths.json``.

    Same key set as the reference registry (``robotpose/paths.py``), rooted at
    ``ROPES3D_ROOT`` (default: current working directory).  Entries resolve to
    absolute paths via attribute access; ``set`` persists changes back to the
    JSON file.
    """

    def __init__(self, root: str | None = None):
        self.root = os.path.abspath(root or os.environ.get("ROPES3D_ROOT", os.getcwd()))
        self._json_path = os.path.join(self.root, "data", "paths.json")
        self._entries: Dict[str, str] = dict(_DEFAULT_PATHS)
        self._load()

    def _load(self) -> None:
        if os.path.isfile(self._json_path):
            with open(self._json_path) as f:
                self._entries.update(json.load(f))

    def _write(self) -> None:
        os.makedirs(os.path.dirname(self._json_path), exist_ok=True)
        with open(self._json_path, "w") as f:
            json.dump(self._entries, f, indent=4)

    def __getattr__(self, key: str) -> str:
        entries = object.__getattribute__(self, "_entries")
        if key in entries:
            return os.path.join(object.__getattribute__(self, "root"), entries[key])
        raise AttributeError(key)

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def keys(self):
        return self._entries.keys()

    def set(self, key: str, value: str) -> None:
        """Persist a (relative) path entry; mirrors reference Paths.set."""
        if os.path.isabs(value):
            value = os.path.relpath(value, self.root)
        self._entries[key] = value
        self._write()

    def create(self) -> None:
        """Create all registered directories (reference Paths.create)."""
        for key in _DIR_KEYS:
            os.makedirs(getattr(self, key), exist_ok=True)
