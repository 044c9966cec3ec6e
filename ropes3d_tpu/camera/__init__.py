"""Camera model: intrinsics and pose conventions."""

from .intrinsics import Intrinsics
from .pose import camera_matrices, make_pose, pose_to_camera_matrix

__all__ = ["Intrinsics", "make_pose", "pose_to_camera_matrix", "camera_matrices"]
