"""Simulation layer: device-side renderer, crops, lookup tables, noise."""

from .renderer import DatasetRenderer, Renderer
from .noise import NoiseMaker

__all__ = ["Renderer", "DatasetRenderer", "NoiseMaker"]
