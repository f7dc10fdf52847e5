"""Property tests for the distributed graph/temporal operators against
independent pure-Python reference implementations (union-find for
connected components, a linear scan for sessionization) — three-way
agreement (min-label, star, reference) on randomized inputs."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st
from molgraphdb_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@given(edge_list=st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)), min_size=1, max_size=40))
@settings(max_examples=10, deadline=None)
def test_cc_three_way_agreement(spark, edge_list):
    sym = edge_list + [(b, a) for a, b in edge_list]
    g = spark.createDataFrame(sym, "src long, dst long")
    want = _uf_components(edge_list)
    got_min = {r.id: r.component for r in connected_components(g).collect()}
    got_star = {r.id: r.component for r in connected_components_star(g).collect()}
    assert got_min == want
    assert got_star == want


def _py_sessionize(events: list[tuple[int, int]], gap_s: int = 1800):
    """(user, ts_second) → {(user, seq): (n, start, end)} — linear scan."""
    out: dict[tuple[int, int], list] = {}
    by_user: dict[int, list[int]] = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, ts_list in by_user.items():
        seq = 0
        prev = None
        for t in sorted(ts_list):
            if prev is None or t - prev > gap_s:
                seq += 1
                out[(u, seq)] = [0, t, t]
            cell = out[(u, seq)]
            cell[0] += 1
            cell[2] = t
            prev = t
    return {k: tuple(v) for k, v in out.items()}


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 12000)),
        min_size=1, max_size=30, unique=True,
    )
)
@settings(max_examples=10, deadline=None)
def test_sessionize_matches_linear_scan(spark, events):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    base = datetime(2024, 1, 1)
    rows = [
        (u, i, base + timedelta(seconds=t)) for i, (u, t) in enumerate(events)
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    # the same gaps-and-islands expression events_sessionize uses
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(by_user)
    new_session = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    got_df = (
        ev.withColumn("new_s", new_session)
        .withColumn(
            "seq", F.sum("new_s").over(by_user.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "seq")
        .agg(F.count(F.lit(1)).alias("n"), F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    )
    got = {
        (r.user_id, r.seq): (
            r.n,
            int((r.lo - base).total_seconds()),
            int((r.hi - base).total_seconds()),
        )
        for r in got_df.collect()
    }
    assert got == _py_sessionize(events)
