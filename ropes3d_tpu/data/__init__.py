"""Dataset pipeline: zip ingestion, h5 datasets, annotation, verification."""

from .dataset import Dataset, DatasetInfo
from .building import Builder
from .annotation import Annotator, AutomaticAnnotator, Splitter, refresh_split

__all__ = [
    "Dataset",
    "DatasetInfo",
    "Builder",
    "Annotator",
    "AutomaticAnnotator",
    "Splitter",
    "refresh_split",
]
