"""Tests for tools.cache_probe — report logic without real compile subprocesses."""
import json

import pytest

from hulc2_tpu.tools import cache_probe


def _fake_children(times, cache_dir_files):
    """Return a _run_child stub: pops timing from `times`, drops a file per call."""
    calls = {"n": 0}

    def run_child(code, cache_dir, timeout, *a):
        t = times[calls["n"]]
        calls["n"] += 1
        for name in cache_dir_files.pop(0):
            (cache_probe.pathlib.Path(cache_dir) / name).write_bytes(b"x")
        return {"compile_plus_run_s": t, "rc": 0, "wall_s": t}

    return run_child


def test_cache_effective(tmp_path, monkeypatch, capsys):
    cache = tmp_path / "cache"
    monkeypatch.setattr(
        cache_probe, "_run_child",
        _fake_children([100.0, 2.0], [["entry_a"], []]),
    )
    rc = cache_probe.main(["--cache-dir", str(cache)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["entries_before"] == 0
    assert report["entries_after_cold"] == 1
    assert report["cache_effective"] is True


def test_cache_ineffective_when_no_entries(tmp_path, monkeypatch, capsys):
    cache = tmp_path / "cache"
    monkeypatch.setattr(
        cache_probe, "_run_child",
        _fake_children([100.0, 95.0], [[], []]),
    )
    cache_probe.main(["--cache-dir", str(cache)])
    report = json.loads(capsys.readouterr().out)
    assert report["cache_effective"] is False


def test_child_failure_reported(tmp_path, monkeypatch, capsys):
    cache = tmp_path / "cache"

    def run_child(code, cache_dir, timeout, *a):
        return {"error": "backend down", "rc": 1, "wall_s": 0.1}

    monkeypatch.setattr(cache_probe, "_run_child", run_child)
    cache_probe.main(["--cache-dir", str(cache)])
    report = json.loads(capsys.readouterr().out)
    assert report["cache_effective"] is False
    assert report["cold"]["rc"] == 1


@pytest.mark.slow
def test_real_probe_on_cpu(tmp_path):
    """End-to-end: two fresh CPU subprocesses through the real runner.

    Validates the subprocess plumbing + JSON parsing; CPU compiles are fast so
    the cache-speedup assertion is NOT made (only that both children succeed).
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", "hulc2_tpu.tools.cache_probe",
         "--cache-dir", str(tmp_path / "c"), "--timeout", "240",
         # tiny probe: bf16 matmuls are emulated (slow) on the 1-core CPU host
         "--reps", "4", "--dim", "128"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout)
    assert report["cold"]["rc"] == 0
    assert report["warm"]["rc"] == 0
