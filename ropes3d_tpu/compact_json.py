"""Compact JSON encoder: small containers on one line, numpy-type aware.

Behavioral parity with the reference's ``robotpose/CompactJSONEncoder.py:9-75``
(used for lookups.json / models.json / datasets.json registries).
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np


class CompactJSONEncoder(json.JSONEncoder):
    """A JSON encoder that puts small containers on single lines."""

    CONTAINER_TYPES = (list, tuple, dict)
    MAX_WIDTH = 70
    MAX_ITEMS = 10

    def __init__(self, *args, max_width: int = None, max_items: int = None, **kwargs):
        if kwargs.get("indent") is None:
            kwargs["indent"] = 4
        super().__init__(*args, **kwargs)
        if max_width is not None:
            self.MAX_WIDTH = max_width
        if max_items is not None:
            self.MAX_ITEMS = max_items
        self.indentation_level = 0

    def encode(self, o: Any) -> str:
        if isinstance(o, (list, tuple)):
            if self._put_on_single_line(o):
                return "[" + ", ".join(self.encode(el) for el in o) + "]"
            self.indentation_level += 1
            output = [self.indent_str + self.encode(el) for el in o]
            self.indentation_level -= 1
            return "[\n" + ",\n".join(output) + "\n" + self.indent_str + "]"
        if isinstance(o, dict):
            if not o:
                return "{}"
            if self._put_on_single_line(o):
                return (
                    "{ "
                    + ", ".join(
                        f"{self.encode(k)}: {self.encode(el)}" for k, el in o.items()
                    )
                    + " }"
                )
            self.indentation_level += 1
            output = [
                f"{self.indent_str}{json.dumps(k)}: {self.encode(v)}"
                for k, v in o.items()
            ]
            self.indentation_level -= 1
            return "{\n" + ",\n".join(output) + "\n" + self.indent_str + "}"
        if isinstance(o, float):
            return format(o, "g")
        if isinstance(o, (np.generic,)):
            return self.encode(o.item())
        if isinstance(o, np.ndarray):
            return self.encode(o.tolist())
        return json.dumps(o)

    def iterencode(self, o, **kwargs):
        return self.encode(o)

    def _put_on_single_line(self, o: Any) -> bool:
        return (
            self._primitives_only(o)
            and len(o) <= self.MAX_ITEMS
            and len(str(o)) - 2 <= self.MAX_WIDTH
        )

    def _primitives_only(self, o) -> bool:
        if isinstance(o, (list, tuple)):
            return not any(isinstance(el, self.CONTAINER_TYPES) for el in o)
        return not any(isinstance(el, self.CONTAINER_TYPES) for el in o.values())

    @property
    def indent_str(self) -> str:
        if isinstance(self.indent, int):
            return " " * (self.indentation_level * self.indent)
        return self.indentation_level * self.indent

    def default(self, o):
        if isinstance(o, np.generic):
            return o.item()
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)
