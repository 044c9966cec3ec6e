"""Segmentation training: pjit data-parallel fine-tune loop, model registry,
augmentation, and collection planning."""

from .planning import Planner

__all__ = ["Planner"]
