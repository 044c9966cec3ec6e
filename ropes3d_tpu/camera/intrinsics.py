"""RealSense-style camera intrinsics.

Parity port of the reference's ``robotpose/projection.py:20-193`` without the
pyrealsense2/pyrender dependencies: the four hardware presets, the
string-representation round-trip (datasets store intrinsics as the realsense
repr string), and integer downscaling.  The ``__str__`` format matches the
``rs.intrinsics`` repr so content-addressed cache keys (crop/lookup h5
registries) stay compatible with reference-era artifacts.
"""

from __future__ import annotations

import re
from typing import Union

import numpy as np

DISTORTION_MODELS = [
    "Brown Conrady",
    "Inverse Brown Conrady",
    "Ftheta",
    "Kannala Brandt4",
    "Modified Brown Conrady",
    "None",
]

_PRESETS = {
    "1280_720_color": ((1280, 720), (638.391, 361.493), (905.23, 904.858)),
    "1280_720_depth": ((1280, 720), (639.459, 359.856), (635.956, 635.956)),
    "640_480_color": ((640, 480), (320.503, 237.288), (611.528, 611.528)),
    "640_480_depth": ((640, 480), (321.635, 241.618), (385.134, 385.134)),
}


class Intrinsics:
    """Pinhole intrinsics with realsense-style serialization."""

    bases = list(_PRESETS.keys())

    def __init__(self, input: Union[str, "Intrinsics"] = None):
        if input is not None:
            input = str(input)
            if any(input == b or (b + "_") in input for b in self.bases):
                self.fromPreset(input)
            else:
                self.fromString(input)

    # ------------------------------------------------------------ parsing
    def fromString(self, input: str) -> None:
        """Parse the realsense repr format (reference projection.py:47-78)."""
        integer = r"[1-9][0-9]*"
        decimal = r"-?[0-9]*(\.[0-9]*)?"
        res = re.search(rf"({integer}) *x *({integer})", input)
        pp = re.search(rf"p\[( *{decimal}) +({decimal})\]", input)
        f = re.search(rf"f\[( *{decimal}) +({decimal})\]", input)
        model = re.search(r"\] +([A-Za-z ]*[A-Za-z][0-9]?) +\[", input)
        coeffs = re.search(
            rf"\[( *{decimal}) +({decimal}) +({decimal}) +({decimal}) +({decimal}) *\] *\]",
            input,
        )
        self.resolution = (int(res.group(1)), int(res.group(2)))
        self.pp = (float(pp.group(1)), float(pp.group(3)))
        self.f = (float(f.group(1)), float(f.group(3)))
        name = model.group(1).strip()
        self.model = next(
            (m for m in DISTORTION_MODELS if m.lower() == name.lower()), "None"
        )
        self.coeffs = [float(coeffs.group(i)) for i in (1, 3, 5, 7, 9)]

    def fromPreset(self, preset: str = "1280_720_color") -> None:
        """Load a hardware preset; '_x' suffix downscales by factor x."""
        self.model = "Brown Conrady"
        self.coeffs = [0, 0, 0, 0, 0]
        for base in self.bases:
            if preset == base:
                self.resolution, self.pp, self.f = _PRESETS[base]
                return
            if (base + "_") in preset:
                ds = int(preset.replace(base + "_", ""))
                self.resolution, self.pp, self.f = _PRESETS[base]
                self.downscale(ds)
                return
        raise ValueError(
            f"Input {preset} not valid. Preset must be one of: {self.bases}; "
            "append '_x' to downscale by x."
        )

    def downscale(self, ds_factor: int) -> None:
        assert ds_factor >= 1, "Upscaling is not supported."
        scaled = [x / ds_factor for x in self.resolution]
        if not all(int(x) == round(x) for x in scaled):
            raise ValueError(
                f"Downscaling by {ds_factor} yields non-integer resolution {scaled}."
            )
        self.resolution = tuple(x // ds_factor for x in self.resolution)
        self.pp = tuple(x / ds_factor for x in self.pp)
        self.f = tuple(x / ds_factor for x in self.f)

    # ------------------------------------------------------------ views
    @property
    def width(self) -> int:
        return max(self.resolution)

    @property
    def height(self) -> int:
        return min(self.resolution)

    @property
    def size(self) -> int:
        return int(np.prod(np.array(self.resolution)))

    @property
    def matrix(self) -> np.ndarray:
        """3x3 K matrix (fx, fy, cx, cy)."""
        return np.array(
            [
                [self.f[0], 0.0, self.pp[0]],
                [0.0, self.f[1], self.pp[1]],
                [0.0, 0.0, 1.0],
            ]
        )

    def __str__(self) -> str:
        def g(x):
            return format(float(x), "g")

        c = " ".join(g(x) for x in self.coeffs)
        return (
            f"[ {self.width}x{self.height}  p[{g(self.pp[0])} {g(self.pp[1])}]"
            f"  f[{g(self.f[0])} {g(self.f[1])}]"
            f"  {self.model} [{c}] ]"
        )

    def __eq__(self, other) -> bool:
        if isinstance(other, self.__class__):
            return self.__dict__ == other.__dict__
        return False

    def __ne__(self, other) -> bool:
        return not self.__eq__(other)
