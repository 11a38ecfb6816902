"""Tests for tools.trace_summary — Chrome-trace parsing on a synthetic trace."""
import gzip
import json

import pytest

from hulc2_tpu.tools import trace_summary


@pytest.fixture()
def trace_dir(tmp_path):
    """Minimal jax.profiler-shaped trace: a device pid with Steps / XLA
    Modules / XLA Ops threads (only the last holds leaf ops) plus a host pid
    whose python events must be ignored."""
    events = [
        {"ph": "M", "pid": 3, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 701, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name", "args": {"name": "Steps"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name", "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name", "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 701, "tid": 9, "name": "thread_name", "args": {"name": "python"}},
        # enclosing spans that MUST NOT be counted (they cover the leaf ops)
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0, "dur": 30_000, "name": "0"},
        {"ph": "X", "pid": 3, "tid": 2, "ts": 0, "dur": 30_000, "name": "jit_step_fn(123)"},
        # leaf ops: 20 ms conv fusion + 2x5 ms copies (us units)
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0, "dur": 20_000, "name": "fusion.1",
         "args": {"hlo_category": "convolution fusion", "long_name": "%fusion.1 = ..."}},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 20_000, "dur": 5_000, "name": "copy.9",
         "args": {"hlo_category": "data formatting", "long_name": "%copy.9 = ..."}},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 25_000, "dur": 5_000, "name": "copy.9",
         "args": {"hlo_category": "data formatting", "long_name": "%copy.9 = ..."}},
        # host python event: ignored
        {"ph": "X", "pid": 701, "tid": 9, "ts": 0, "dur": 99_000, "name": "$train.py:1 fit"},
    ]
    run = tmp_path / "plugins" / "profile" / "run1"
    run.mkdir(parents=True)
    with gzip.open(run / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return tmp_path


def test_counts_only_leaf_xla_ops(trace_dir):
    s = trace_summary.summarize(str(trace_dir), top=5, steps=2)
    assert s["device_total_ms"] == 30.0  # parents + host excluded
    assert s["per_step_ms"] == 15.0
    names = {o["name"]: o for o in s["top_ops"]}
    assert names["fusion.1"]["total_ms"] == 20.0
    assert names["copy.9"]["total_ms"] == 10.0  # two occurrences aggregated
    cats = {c["category"]: c["pct"] for c in s["categories"]}
    assert cats == {"convolution fusion": 66.7, "data formatting": 33.3}


def test_cli_json_roundtrip(trace_dir, capsys):
    assert trace_summary.main([str(trace_dir), "--json", "--steps", "2"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["top_ops"][0]["name"] == "fusion.1"


def test_missing_trace_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        trace_summary.summarize(str(tmp_path))
