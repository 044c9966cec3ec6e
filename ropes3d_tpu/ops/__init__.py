"""TPU compute ops: rasterization, error functions, image ops, crops."""

from .rasterizer import RasterScene, render_batch, triangle_setup
from .error import (
    link_error_batch,
    lookup_error,
    tensor_sweep_error,
    TargetBundle,
)

__all__ = [
    "RasterScene",
    "render_batch",
    "triangle_setup",
    "link_error_batch",
    "lookup_error",
    "tensor_sweep_error",
    "TargetBundle",
]
