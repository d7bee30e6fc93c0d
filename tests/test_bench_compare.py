"""tools/bench_compare.py — the round-over-round regression gate."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "bench_compare.py")


def _write(tmp_path, name, queries, wrap_driver=False):
    payload = {"metric": "m", "value": sum(queries.values()), "unit": "sec",
               "queries": queries, "sf": 0.1}
    if wrap_driver:
        payload = {"n": 1, "rc": 0, "parsed": payload, "tail": ""}
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


def _run(*args):
    return subprocess.run([sys.executable, TOOL, *args],
                          capture_output=True, text=True)


def test_flags_regressions_and_exits_nonzero(tmp_path):
    old = _write(tmp_path, "old.json", {"a": 1.0, "b": 2.0, "c": 0.05})
    new = _write(tmp_path, "new.json",
                 {"a": 1.5, "b": 1.0, "c": 0.08, "d": 3.0})
    r = _run(old, new)
    assert r.returncode == 1, r.stdout
    assert "a" in r.stdout and "1.50x" in r.stdout
    assert "faster" in r.stdout and "0.50x" in r.stdout
    assert "added (1): d" in r.stdout
    # c is under the 0.2s noise floor on both sides: never flagged
    assert "\n  c " not in r.stdout


def test_clean_run_exits_zero_and_reads_driver_wrapper(tmp_path):
    old = _write(tmp_path, "old.json", {"a": 1.0, "b": 2.0},
                 wrap_driver=True)  # BENCH_r*.json format
    new = _write(tmp_path, "new.json", {"a": 1.05, "b": 1.9})
    r = _run(old, new)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "no drifts beyond threshold" in r.stdout


def test_null_parsed_driver_artifact_is_a_clear_error(tmp_path):
    p = tmp_path / "broken.json"
    p.write_text(json.dumps({"n": 1, "rc": 0, "parsed": None}))
    new = _write(tmp_path, "new.json", {"a": 1.0})
    r = _run(str(p), new)
    assert r.returncode != 0
    assert "no per-query map" in (r.stdout + r.stderr)
