"""ropes3d_tpu — TPU-native robotic pose estimation from segmented 3D images.

A ground-up JAX/XLA/Pallas re-implementation of the capabilities of
OSU-AIMS/RoPE-S3D: markerless joint-angle estimation for industrial robot
arms from RGBD frames, via segment -> render -> match candidate search run
entirely on device.

Public API mirrors the reference package root (``robotpose/__init__.py``).
"""

from .config import Paths
from .camera import Intrinsics
from .robot import ForwardKinematics, MeshLoader, URDFReader

__version__ = "0.1.0"

_LAZY = {
    "Renderer": "ropes3d_tpu.simulation.renderer",
    "DatasetRenderer": "ropes3d_tpu.simulation.renderer",
    "RobotLookupCreator": "ropes3d_tpu.simulation.lookup",
    "RobotLookupManager": "ropes3d_tpu.simulation.lookup",
    "Crop": "ropes3d_tpu.simulation.crop_cache",
    "Predictor": "ropes3d_tpu.prediction.predictor",
    "SyntheticPredictor": "ropes3d_tpu.prediction.synthetic",
    "Grapher": "ropes3d_tpu.prediction.analysis",
    "JointDistance": "ropes3d_tpu.prediction.analysis",
    "LiveCamera": "ropes3d_tpu.prediction.feed",
    "JSONCoupling": "ropes3d_tpu.prediction.coupling",
    "CameraPredictor": "ropes3d_tpu.prediction.camera_pose",
    "ModellessCameraPredictor": "ropes3d_tpu.prediction.camera_pose",
    "SpiralRenderer": "ropes3d_tpu.prediction.camera_pose",
    "Aligner": "ropes3d_tpu.simulation.aligner",
    "Verifier": "ropes3d_tpu.data.verification",
    "Builder": "ropes3d_tpu.data.building",
    "Splitter": "ropes3d_tpu.data.annotation",
    "Planner": "ropes3d_tpu.training.planning",
    "ModelManager": "ropes3d_tpu.training.model_registry",
    "ProjectionViz": "ropes3d_tpu.prediction.viz",
    "MeshViewer": "ropes3d_tpu.cli.wizard",
    "Dataset": "ropes3d_tpu.data.dataset",
    "DatasetInfo": "ropes3d_tpu.data.dataset",
    "AutomaticAnnotator": "ropes3d_tpu.data.annotation",
    "Wizard": "ropes3d_tpu.cli.wizard",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "Paths",
    "Intrinsics",
    "URDFReader",
    "MeshLoader",
    "ForwardKinematics",
    *_LAZY.keys(),
]
