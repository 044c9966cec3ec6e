"""Prediction engine: staged joint-angle candidate search on device."""

from .stages import (
    Descent,
    InterpolativeSweep,
    ISweep,
    IntSweep,
    Lookup,
    SFlip,
    TensorSweep,
    TSweep,
    getStages,
)

__all__ = [
    "Lookup",
    "SFlip",
    "InterpolativeSweep",
    "TensorSweep",
    "Descent",
    "IntSweep",
    "ISweep",
    "TSweep",
    "getStages",
]
