"""Prediction engine: staged joint-angle candidate search on device."""

from .stages import (
    Descent,
    InterpolativeSweep,
    ISweep,
    IntSweep,
    Lookup,
    Polish,
    SFlip,
    TensorSweep,
    TSweep,
    getStages,
)

__all__ = [
    "Lookup",
    "Polish",
    "SFlip",
    "InterpolativeSweep",
    "TensorSweep",
    "Descent",
    "IntSweep",
    "ISweep",
    "TSweep",
    "getStages",
]
