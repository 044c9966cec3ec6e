"""Robot model: URDF parsing, mesh loading, JAX forward kinematics."""

from .kinematics import ForwardKinematics, fk_from_chain, make_fk
from .mesh import MeshLoader, PackedScene, decimate, load_stl
from .urdf import URDFReader

__all__ = [
    "URDFReader",
    "MeshLoader",
    "PackedScene",
    "load_stl",
    "decimate",
    "make_fk",
    "fk_from_chain",
    "ForwardKinematics",
]
