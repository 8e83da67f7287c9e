"""run_sweep retry/red bookkeeping + sweep_report flag surfacing: the
round-4 VERDICT weak #5 contract — a 'transient' that recurs must fail
loud, never be silently absorbed as attempts=2."""

import json
import subprocess
import sys
import types

import pytest


def _load_run_sweep():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parent.parent / "tools" / "run_sweep.py"
    spec = importlib.util.spec_from_file_location("run_sweep_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeCompleted:
    def __init__(self, rc, stdout="", stderr=""):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = stderr


def test_run_leg_transient_retry_records_signature(monkeypatch):
    rs = _load_run_sweep()
    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return _FakeCompleted(
                1, stderr="UNAVAILABLE: TPU worker process crashed or "
                          "restarted mid-flight")
        return _FakeCompleted(0, stdout=json.dumps({"value": 1.0}) + "\n")

    monkeypatch.setattr(rs.subprocess, "run", fake_run)
    monkeypatch.setattr(rs.time, "sleep", lambda s: None)
    rec = rs.run_leg("t1", ["--config", "x"], 10)
    assert rec["attempts"] == 2
    assert rec["retry_signatures"] == ["TPU worker process crashed or restarted"]
    assert "red" not in rec


def test_run_leg_both_retries_consumed_marks_red(monkeypatch):
    rs = _load_run_sweep()
    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        if calls["n"] <= 2:
            return _FakeCompleted(
                1, stderr="FAILED_PRECONDITION: TPU backend error")
        return _FakeCompleted(0, stdout=json.dumps({"value": 2.0}) + "\n")

    monkeypatch.setattr(rs.subprocess, "run", fake_run)
    monkeypatch.setattr(rs.time, "sleep", lambda s: None)
    rec = rs.run_leg("t2", [], 10)
    assert rec["attempts"] == 3
    assert rec["red"] == "both retries consumed in one sweep"
    assert len(rec["retry_signatures"]) == 2


def test_run_leg_non_transient_fails_immediately(monkeypatch):
    rs = _load_run_sweep()

    def fake_run(cmd, **kw):
        return _FakeCompleted(1, stderr="ValueError: genuine bug")

    monkeypatch.setattr(rs.subprocess, "run", fake_run)
    rec = rs.run_leg("t3", [], 10)
    assert rec["attempts"] == 1
    assert "genuine bug" in rec["error"]


def test_markdown_table_flags_column():
    rs = _load_run_sweep()
    out = rs.markdown_table([
        {"tag": "a", "value": 1.2, "edges_per_s": 1e6, "variance_pct": 24.3,
         "dispatch_bound": True, "epoch_ms_min": 1.1},
        {"tag": "b", "value": 5.0, "attempts": 3,
         "red": "both retries consumed in one sweep", "variance_pct": 1.0},
    ])
    assert "dispatch_bound (min 1.1 ms)" in out
    assert "RED: both retries consumed" in out
    assert "attempts=3" in out
