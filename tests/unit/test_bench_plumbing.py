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


def test_run_sections_requeues_failure_in_subprocess(monkeypatch):
    """Round-4 lesson: the in-process re-queue hit the same remote-compile
    HTTP 500 that killed the first attempt; the second chance must run in a
    FRESH interpreter. _run_sections hands failed sections (with their CLI
    args) to _retry_in_subprocess and adopts its result."""
    bench._SECTION_ERRORS.clear()
    seen = {}

    def dead():
        raise RuntimeError("transient tunnel error")

    def fake_retry(name, cli_args=()):
        seen[name] = cli_args
        return (42.0, 7.0), 1.2, None

    monkeypatch.setattr(bench, "_section", lambda fn, **kw: (fn(), 1.0))
    monkeypatch.setattr(bench, "_retry_in_subprocess", fake_retry)
    results, contention = bench._run_sections(
        [("flaky", dead, None, {"cli_args": ("--policy", "float32")})]
    )
    assert results["flaky"] == (42.0, 7.0)
    assert contention["flaky"] == 1.2
    assert "flaky" not in bench._SECTION_ERRORS  # retry succeeded → error cleared
    assert seen["flaky"] == ("--policy", "float32")


def test_run_sections_persistent_failure_records_null(monkeypatch):
    bench._SECTION_ERRORS.clear()

    def dead():
        raise RuntimeError("hard failure")

    monkeypatch.setattr(bench, "_section", lambda fn, **kw: (fn(), 1.0))
    monkeypatch.setattr(
        bench,
        "_retry_in_subprocess",
        lambda name, cli_args=(): (None, None, "subprocess retry: boom"),
    )
    results, contention = bench._run_sections([("dead", dead, None, {})])
    assert results["dead"] is None
    assert contention["dead"] is None
    assert "retry:" in bench._SECTION_ERRORS["dead"]
    assert "first:" in bench._SECTION_ERRORS["dead"]  # original error kept
    # the whole record must serialize strictly
    json.dumps(bench._json_safe({"contention": contention}), allow_nan=False)
    bench._SECTION_ERRORS.clear()


def _fake_proc(stdout="", stderr="", returncode=0):
    class P:
        pass

    p = P()
    p.stdout, p.stderr, p.returncode = stdout, stderr, returncode
    return p


def test_retry_in_subprocess_parses_section_record(monkeypatch):
    import subprocess

    record = json.dumps(
        {"section": "sparse_opt", "result": [1.4, 20.8, 2.5, 3.2],
         "contention": 1.28, "error": None}
    )
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: _fake_proc(stdout=f"# noise line\n{record}\n"),
    )
    r, c, err = bench._retry_in_subprocess("sparse_opt")
    assert r == (1.4, 20.8, 2.5, 3.2)  # JSON list → tuple for unpacking
    assert c == 1.28
    assert err is None


def test_retry_in_subprocess_no_record_reports_error(monkeypatch):
    import subprocess

    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: _fake_proc(stdout="garbage\n", stderr="boom", returncode=1),
    )
    r, c, err = bench._retry_in_subprocess("sparse_opt")
    assert r is None and c is None
    assert "no record" in err and "boom" in err
