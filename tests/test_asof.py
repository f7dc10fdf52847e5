"""Unit semantics for the as-of and interval join operators
(molgraphdb_spark.operators.asof): backward match, exact-ts ties,
tiebreak among colliding right timestamps, no-match NULLs, half-open
interval bounds, and cross-bucket intervals."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from molgraphdb_spark.operators.asof import asof_join, interval_point_join


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 0, minute, second)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(20), 101), (2, _ts(5), 102), (3, _ts(1), 103)],
        ["k", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts(9), 900),   # before lid=100
            (1, _ts(10), 901),  # exactly at lid=100
            (1, _ts(10), 902),  # same ts collision — larger rid wins
            (1, _ts(15), 903),  # between the two left rows
            (2, _ts(6), 904),   # after lid=102 — never matches
        ],
        ["k", "ts", "rid"],
    )
    return left, right


def test_asof_backward_exact_and_ties(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, on=["k"], right_cols=["rid"], tiebreak="rid")
    got = {r.lid: r.rid_r for r in out.collect()}
    # exact-ts match allowed; among the two ts=10 rights the larger rid wins
    assert got == {100: 902, 101: 903, 102: None, 103: None}


def test_asof_strict_inequality(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on=["k"], right_cols=["rid"], tiebreak="rid", allow_exact=False
    )
    got = {r.lid: r.rid_r for r in out.collect()}
    # ts=10 rights are no longer visible to the ts=10 left row
    assert got == {100: 900, 101: 903, 102: None, 103: None}


def test_asof_carries_matched_timestamp(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, on=["k"], right_cols=["rid"], tiebreak="rid")
    row = {r.lid: r for r in out.collect()}[101]
    assert row.asof_ts_r == _ts(15)


def test_interval_join_half_open_bounds(spark):
    iv = spark.createDataFrame(
        [(1, 10, _ts(10), _ts(15))], ["k", "iid", "start", "end"]
    )
    pts = spark.createDataFrame(
        [
            (1, _ts(10), 1),      # == start: included
            (1, _ts(14, 59), 2),  # inside
            (1, _ts(15), 3),      # == end: excluded (half-open)
            (1, _ts(9, 59), 4),   # before
            (2, _ts(12), 5),      # wrong key
        ],
        ["k", "ts", "pid"],
    )
    out = interval_point_join(iv, pts, on=["k"], bucket_micros=60 * 1_000_000)
    assert sorted(r.pid for r in out.collect()) == [1, 2]


def test_interval_join_spans_buckets(spark):
    # 25-minute interval vs 5-minute buckets: points land in distinct
    # buckets yet every in-range one matches exactly once.
    iv = spark.createDataFrame([(1, 10, _ts(3), _ts(28))], ["k", "iid", "start", "end"])
    pts = spark.createDataFrame(
        [(1, _ts(m), m) for m in (0, 3, 7, 14, 21, 27, 28, 30)], ["k", "ts", "pid"]
    )
    out = interval_point_join(iv, pts, on=["k"], bucket_micros=300 * 1_000_000)
    assert sorted(r.pid for r in out.collect()) == [3, 7, 14, 21, 27]


def test_asof_right_side_payload_free(spark):
    # right side with ONLY key + ts columns: the null-payload struct
    # cast must not emit a trailing comma (ADVICE round 1).
    left, right = _asof_fixture(spark)
    out = asof_join(left, right.select("k", "ts"), on=["k"])
    got = {r.lid: r.asof_ts_r for r in out.collect()}
    assert got == {100: _ts(10), 101: _ts(15), 102: None, 103: None}


def test_interval_join_left_keeps_duplicate_intervals(spark):
    # two IDENTICAL empty interval rows must both survive the left
    # recovery (grouped on a surrogate id, not on the value columns).
    iv = spark.createDataFrame(
        [(1, 10, _ts(40), _ts(45)), (1, 10, _ts(40), _ts(45))],
        ["k", "iid", "start", "end"],
    )
    pts = spark.createDataFrame([(1, _ts(12), 1)], ["k", "ts", "pid"])
    out = interval_point_join(iv, pts, on=["k"], bucket_micros=60 * 1_000_000, how="left")
    assert out.count() == 2
    assert [r.pid for r in out.collect()] == [None, None]


def test_interval_join_left_keeps_empty(spark):
    iv = spark.createDataFrame(
        [(1, 10, _ts(10), _ts(15)), (1, 11, _ts(40), _ts(45))],
        ["k", "iid", "start", "end"],
    )
    pts = spark.createDataFrame([(1, _ts(12), 1)], ["k", "ts", "pid"])
    out = interval_point_join(iv, pts, on=["k"], bucket_micros=60 * 1_000_000, how="left")
    rows = {r.iid: r.pid for r in out.collect()}
    assert rows == {10: 1, 11: None}
    assert out.count() == 2


def test_asof_tolerance_bounds_staleness(spark):
    left, right = _asof_fixture(spark)
    # lid=101 at t=20 matches rid=903 at t=15 (5 min stale); a 4-minute
    # tolerance must null it while keeping the exact/fresh matches
    out = asof_join(
        left, right, on=["k"], right_cols=["rid"], tiebreak="rid",
        tolerance_micros=4 * 60 * 1_000_000,
    )
    got = {r.lid: r.rid_r for r in out.collect()}
    assert got[100] == 902  # exact-ts match, zero staleness
    assert got[101] is None  # 5 min stale > 4 min tolerance
    assert got[102] is None and got[103] is None  # unchanged no-matches
    # matched timestamp nulls in lockstep with the payload
    ts = {r.lid: r.asof_ts_r for r in out.collect()}
    assert ts[101] is None and ts[100] is not None
