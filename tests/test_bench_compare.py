"""bench_compare's driver-wrapper recovery: complete inner JSON
objects must be extractable from a front-truncated stdout tail."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import bench_compare as bc


def test_brace_object_from_truncated_tail():
    full = json.dumps(
        {
            "metric": "x",
            "queries": {"q1": 1.5, "q2": 0.25},
            "queries_min": {"q1": 1.2, "q2": 0.2},
            "canary_duckdb_sec": 2.5,
        }
    )
    tail = full[5:]  # front-truncated: not valid JSON on its own
    assert bc._brace_object(tail, "queries") == {"q1": 1.5, "q2": 0.25}
    assert bc._brace_object(tail, "queries_min") == {"q1": 1.2, "q2": 0.2}
    assert bc._brace_object(tail, "absent") is None


def test_brace_object_nested():
    blob = 'garbage "queries": {"a": {"b": 1}, "c": 2} trailing'
    assert bc._brace_object(blob, "queries") == {"a": {"b": 1}, "c": 2}


def test_load_two_line_record(tmp_path):
    """r15 bench stdout: sidecar line first, slim contract line LAST
    (truncation hardening) — _load must merge both."""
    sidecar = {"metric": "headline_queries_sidecar", "queries_min": {"q1": 1.0},
               "queries_n_runs": {"q1": 5}, "queries_t_offset": {"q1": 0.0}}
    main = {"metric": "headline_queries_total_wall", "value": 1.5, "unit": "sec",
            "queries": {"q1": 1.5}, "errors": {}, "canary_duckdb_sec": 2.4,
            "runs_per_query": 5, "sf": 0.1}
    p = tmp_path / "bench_two_line.json"
    p.write_text(json.dumps(sidecar) + "\n" + json.dumps(main) + "\n")
    d = bc._load(str(p))
    assert d["queries"] == {"q1": 1.5}
    assert d["queries_min"] == {"q1": 1.0}
    assert d["metric"] == "headline_queries_total_wall"
    assert d["canary_duckdb_sec"] == 2.4
