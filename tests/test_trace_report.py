"""trace_report parses a Chrome-trace json into per-module device tables."""

import gzip
import json
import os

import pytest

from accunet_tpu.utils.trace_report import module_times, top_ops


@pytest.fixture()
def trace_dir(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    d.mkdir(parents=True)
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "jit_step", "dur": 100.0, "args": {}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 3000.0,
         "args": {"tf_op": "jit(step)/while/body/Model/blockA/conv:"}},
        {"ph": "X", "pid": 3, "name": "fusion.2", "dur": 1000.0,
         "args": {"tf_op": "jit(step)/while/body/Model/blockB/add:"}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 3000.0,
         "args": {"tf_op": "jit(step)/while/body/Model/blockA/conv:"}},
        # host event must be ignored
        {"ph": "X", "pid": 9, "name": "hostop", "dur": 9e6, "args": {}},
    ]
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


@pytest.mark.quick
def test_module_times_groups_and_scales(trace_dir):
    rows = dict(module_times(trace_dir, steps=2))
    assert rows["blockA"] == pytest.approx(3.0)   # 6000 us / 2 steps -> ms
    assert rows["blockB"] == pytest.approx(0.5)
    assert rows["total"] == pytest.approx(3.5)


@pytest.mark.quick
def test_top_ops_sorted_with_source(trace_dir):
    rows = top_ops(trace_dir, n=5, steps=2)
    assert rows[0][0] == "fusion.1" and rows[0][1] == pytest.approx(3.0)
    assert "blockA" in rows[0][2]


@pytest.mark.quick
def test_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        top_ops(str(tmp_path))
