"""Shared-library loader for the C++ runtime."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _candidate_paths():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    yield os.path.join(here, "csrc", "build", "libropes3d.so")
    yield os.path.join(here, "libropes3d.so")
    env = os.environ.get("ROPES3D_NATIVE_LIB")
    if env:
        yield env


def get() -> Optional[ctypes.CDLL]:
    """Return the loaded C++ library, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for path in _candidate_paths():
        if path and os.path.isfile(path):
            try:
                _LIB = ctypes.CDLL(path)
                break
            except OSError:
                continue
    return _LIB
