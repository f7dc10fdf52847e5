"""Dual-format events ingest: the engine must read the events table
identically whether the driver's parquet writer emitted ns-INT64
TIMESTAMP(NANOS) (rounds 1–2) or µs TIMESTAMP_NTZ (round 3+) — the
format flip between rounds broke four queries and the streaming reader
silently; this fixture makes the next regeneration a no-op.

Stages the SAME rows in three physical encodings and asserts batch
(_events) and streaming (read_events_stream) agree across all of them.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from molgraphdb_spark.queries.events import _events, events_sessionize
from molgraphdb_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    tumbling_counts,
)

FORMATS = ["ns_int64", "us_ntz", "us_utc"]


@pytest.fixture(scope="module")
def format_dirs(sf_dir, tmp_path_factory):
    """One directory per encoding, all holding identical instants."""
    src = pq.read_table(f"{sf_dir}/events.parquet")
    ts = src.column("ts").cast(pa.timestamp("us"))
    dirs = {}
    casts = {
        "ns_int64": pa.timestamp("ns"),          # legacy driver format
        "us_ntz": pa.timestamp("us"),            # current driver format
        "us_utc": pa.timestamp("us", tz="UTC"),  # UTC-adjusted TIMESTAMP
    }
    for fmt, typ in casts.items():
        d = tmp_path_factory.mktemp(f"events_{fmt}")
        tbl = src.set_column(src.schema.get_field_index("ts"), "ts", ts.cast(typ))
        pq.write_table(tbl, str(d / "events.parquet"))
        dirs[fmt] = str(d)
    return dirs


@pytest.mark.parametrize("fmt", FORMATS)
def test_batch_reader_normalizes(fmt, spark, format_dirs):
    ev = _events(spark, format_dirs[fmt])
    assert dict(ev.dtypes)["ts"] == "timestamp"
    ref = _events(spark, format_dirs["us_ntz"])
    got = sorted((r.event_id, r.ts) for r in ev.select("event_id", "ts").collect())
    want = sorted((r.event_id, r.ts) for r in ref.select("event_id", "ts").collect())
    assert got == want and len(got) > 0


@pytest.mark.parametrize("fmt", FORMATS)
def test_sessionize_format_invariant(fmt, spark, format_dirs):
    got = events_sessionize(spark, format_dirs[fmt]).collect()
    want = events_sessionize(spark, format_dirs["us_ntz"]).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and len(got) > 0


@pytest.mark.parametrize("fmt", FORMATS)
def test_stream_reader_format_invariant(fmt, spark, format_dirs):
    ev = read_events_stream(spark, format_dirs[fmt])
    q = run_to_memory(tumbling_counts(ev), f"t_fmt_{fmt}")
    try:
        got = {
            (r.window_start, r.event_type): r.n_events
            for r in spark.table(f"t_fmt_{fmt}").collect()
        }
    finally:
        q.stop()
    from molgraphdb_spark.queries.events import events_tumbling_window

    want = {
        (r.window_start, r.event_type): r.n_events
        for r in events_tumbling_window(spark, format_dirs[fmt]).collect()
    }
    assert got == want and len(want) > 0
