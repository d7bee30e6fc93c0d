"""Concurrent-streams throughput harness (tools/bench_throughput.py):
the TPC-H throughput-test shape — N permuted streams on isolated
sessions with per-query admission — must produce every stream's full
result set and a well-formed artifact.
"""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "bench_throughput", os.path.join(REPO, "tools",
                                         "bench_throughput.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_throughput_streams_complete_and_match(spark, sf_dir):
    mod = _load()
    names = [f"tpch_q{i}" for i in (1, 3, 6, 14)]
    out = mod.run(streams=3, sf_dir=sf_dir, query_names=names)
    assert out["metric"] == "tpch_throughput"
    assert out["streams"] == 3 and out["n_queries"] == 4
    assert out["total_sec"] > 0 and out["queries_per_hour"] > 0
    assert len(out["per_stream_sec"]) == 3
    assert all(s > 0 for s in out["per_stream_sec"])
    # every stream saw the same total row count (same 4 queries)
    assert len(set(out["rows_per_stream"])) == 1
    assert out["admission"]["admitted"] >= 12


def test_throughput_admission_cap_serializes(spark, sf_dir):
    """With max_requests=1 the streams serialize through the pool: total
    admitted equals the full query count and peak concurrency never
    exceeded the cap (running_now drained to 0)."""
    mod = _load()
    out = mod.run(streams=2, sf_dir=sf_dir, max_requests=1,
                  query_names=["tpch_q6", "tpch_q14"])
    assert out["admission"]["admitted"] >= 4
    assert out["admission"]["running_now"] == 0
    assert out["admission"]["queued_total"] >= 0
