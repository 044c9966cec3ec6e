"""Timer/tracing utility tests (SURVEY §5 tracing subsystem)."""

import time

import numpy as np

from ropes3d_tpu.utils import FancyTimer, StageTimer, Timer
from ropes3d_tpu.utils.common import folder_size, size_to_str


def test_timer_splits():
    t = Timer()
    time.sleep(0.02)
    t.split("a")
    time.sleep(0.01)
    t.split("b")
    assert t.data["a"] >= 0.015
    assert t.data["b"] >= 0.005
    assert "a:" in repr(t) and "%" in repr(t)


def test_fancy_timer_events():
    ft = FancyTimer()
    ft.start("x")
    time.sleep(0.02)
    ft.stop("x")
    ft.start("y")
    time.sleep(0.01)
    ft.stop("y")
    assert ft.data["x"]["total"] >= 0.015
    assert "Breakdown" in repr(ft)


def test_stage_timer_report():
    st = StageTimer()
    with st.stage("render"):
        time.sleep(0.01)
    with st.stage("render"):
        time.sleep(0.01)
    with st.stage("error"):
        pass
    rep = st.report()
    assert rep["render"]["count"] == 2
    assert rep["render"]["total_s"] >= 0.015
    assert "render" in repr(st)


def test_folder_size(tmp_path):
    (tmp_path / "a.bin").write_bytes(b"x" * 1500)
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.bin").write_bytes(b"y" * 500)
    assert folder_size(str(tmp_path)) == 2000
    assert size_to_str(2000) == "2.00 KB"
