"""Wall-clock tracing utilities.

Formalises the reference's ad-hoc timers (``robotpose/utils.py:122-180``)
and adds a structured per-stage timer that integrates with ``jax.profiler``
trace annotations for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


class Timer:
    """Named-split wall clock timer (reference Timer, utils.py:122-144)."""

    def __init__(self):
        self.data: Dict[str, float] = {}
        self.start()

    def start(self):
        self.start_time = time.time()

    def split(self, split_name: str):
        self.data[split_name] = self.data.get(split_name, 0.0) + time.time() - self.start_time
        self.start()

    def __repr__(self):
        tot = sum(self.data.values()) or 1e-12
        out = "Times:"
        for item, v in self.data.items():
            out += f"\n\t{item}: {v:.3f}s {v * 100 / tot:.2f}%"
        return out


class FancyTimer:
    """Start/stop event timer (reference FancyTimer, utils.py:149-180)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.data: Dict[str, dict] = {}
        self.triggers = []
        self.tot = 0.0

    def new_it(self):
        if len(self.triggers) > 1:
            self.tot += max(self.triggers) - min(self.triggers)
            self.triggers = []

    def start(self, event: str):
        self.data.setdefault(event, {"total": 0.0, "start_time": None})
        now = time.time()
        self.triggers.append(now)
        self.data[event]["start_time"] = now

    def stop(self, event: str):
        now = time.time()
        self.triggers.append(now)
        self.data[event]["total"] += now - self.data[event]["start_time"]
        self.data[event]["start_time"] = None

    def __repr__(self):
        self.new_it()
        tot = self.tot or 1e-12
        out = f" Total Time: {self.tot:.3f}\nBreakdown:"
        for item, value in self.data.items():
            out += f"\n\t{item}:\t{value['total']:.3f}s {value['total'] * 100 / tot:.2f}%"
        return out


class StageTimer:
    """Per-stage timing struct with jax.profiler trace annotation.

    Used by the prediction engine to report a per-stage breakdown of each
    frame (the TPU-build answer to SURVEY.md §5 tracing).
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        import os

        sync = bool(os.environ.get("ROPES3D_SYNC_TIMING"))
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                if sync:
                    # Drain the device queue so the split is attributable.
                    import jax as _jax

                    (_jax.device_put(0.0) + 0).block_until_ready()
                dt = time.perf_counter() - t0
                self.totals[name] = self.totals.get(name, 0.0) + dt
                self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, dict]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }

    def __repr__(self):
        tot = sum(self.totals.values()) or 1e-12
        lines = ["Stage times:"]
        for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"  {k}: {v:.4f}s ({100 * v / tot:.1f}%) over {self.counts[k]} calls"
            )
        return "\n".join(lines)
