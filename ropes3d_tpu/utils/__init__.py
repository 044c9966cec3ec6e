"""General utilities (reference: ``robotpose/utils.py``)."""

from .common import (
    get_extremes,
    get_key,
    outlier_min_max,
    reject_outliers_iqr,
    reject_outliers_std,
    str_to_arr,
    worker_count,
)
from .timing import FancyTimer, StageTimer, Timer

__all__ = [
    "str_to_arr",
    "get_key",
    "get_extremes",
    "worker_count",
    "reject_outliers_std",
    "reject_outliers_iqr",
    "outlier_min_max",
    "Timer",
    "FancyTimer",
    "StageTimer",
]
