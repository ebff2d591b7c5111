"""Bench record plumbing: section error handling must yield strict JSON.

Round-3 failure modes being locked down (VERDICT r3 #2, ADVICE r3 medium):
- an errored section recorded contention ``float('inf')`` which json.dumps
  emits as the non-standard token ``Infinity`` — invalid strict JSON;
- errored sections recorded value 0.0, indistinguishable from a measurement;
- transient tunnel errors (HTTP 500) permanently lost the section — they are
  now re-queued once at end-of-run.
These tests exercise the pure-Python plumbing only (no TPU, no timing).
"""

import json

import pytest

import bench


def test_try_section_failure_sentinel_is_json_null():
    result, factor = bench._try_section(
        "boom", lambda: (_ for _ in ()).throw(RuntimeError("x")), None
    )
    assert result is None
    assert factor is None  # not inf: json must stay strict
    assert "boom" in bench._SECTION_ERRORS
    bench._SECTION_ERRORS.clear()


def test_json_safe_strips_nonfinite():
    rec = {"a": float("inf"), "b": [float("nan"), 1.5], "c": {"d": -float("inf")}}
    out = bench._json_safe(rec)
    s = json.dumps(out, allow_nan=False)  # must not raise
    assert json.loads(s) == {"a": None, "b": [None, 1.5], "c": {"d": None}}


def test_run_sections_requeues_transient_failure(monkeypatch):
    bench._SECTION_ERRORS.clear()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient tunnel error")
        return (42.0,)

    # bypass the real calibration/timing machinery: _section(fn) -> (fn(), 1.0)
    monkeypatch.setattr(bench, "_section", lambda fn, **kw: (fn(), 1.0))
    results, contention = bench._run_sections([("flaky", flaky, None, {})])
    assert results["flaky"] == (42.0,)
    assert contention["flaky"] == 1.0
    assert "flaky" not in bench._SECTION_ERRORS  # retry succeeded → error cleared
    assert calls["n"] == 2


def test_run_sections_persistent_failure_records_null(monkeypatch):
    bench._SECTION_ERRORS.clear()

    def dead():
        raise RuntimeError("hard failure")

    monkeypatch.setattr(bench, "_section", lambda fn, **kw: (fn(), 1.0))
    results, contention = bench._run_sections([("dead", dead, None, {})])
    assert results["dead"] is None
    assert contention["dead"] is None
    assert "retry:" in bench._SECTION_ERRORS["dead"]
    # the whole record must serialize strictly
    json.dumps(bench._json_safe({"contention": contention}), allow_nan=False)
    bench._SECTION_ERRORS.clear()
