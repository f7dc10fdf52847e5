"""Skyline (Pareto frontier) — the window formulation vs brute force.

The registry oracle already cross-checks against DuckDB's quadratic
NOT EXISTS form at sf0.01; these tests pin the tricky tie semantics on
planted points (equal price, equal size, both-equal) where off-by-one
frame bounds would silently differ."""

from pyspark.sql import functions as F


def _frontier_brute(pts):
    out = []
    for i, (pk, p, s) in enumerate(pts):
        dominated = any(
            (p2 <= p and s2 >= s and (p2 < p or s2 > s))
            for j, (pk2, p2, s2) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((pk, p, s))
    return sorted(out, key=lambda t: (t[1], -t[2], t[0]))


def _run_spark(spark, pts):
    from molgraphdb_spark.queries.relational import parts_skyline

    df = spark.createDataFrame(
        [(pk, p / 100.0, s) for pk, p, s in pts],
        "p_partkey long, p_retailprice double, p_size int",
    )

    # drive the query body against a planted table via a temp view swap
    import molgraphdb_spark.queries.relational as rel

    orig = rel._t
    rel._t = lambda spark, sf_dir, name: df
    try:
        rows = parts_skyline(spark, "unused").collect()
    finally:
        rel._t = orig
    return [(r.p_partkey, r.price_c, r.p_size) for r in rows]


def test_ties_on_price_and_size(spark):
    pts = [
        (1, 1000, 50),
        (2, 1000, 50),  # exact duplicate of 1: both on the frontier
        (3, 1000, 40),  # equal price, smaller: dominated
        (4, 900, 50),   # cheaper, same size: dominates 1 and 2!
        (5, 900, 60),
        (6, 1100, 70),
        (7, 1100, 70),  # duplicate of 6
        (8, 1200, 70),  # same size as 6 but dearer: dominated
        (9, 800, 10),
    ]
    assert _run_spark(spark, pts) == _frontier_brute(pts)


def test_monotone_chain_all_survive(spark):
    pts = [(i, 900 + i * 10, 10 + i) for i in range(10)]
    assert _run_spark(spark, pts) == _frontier_brute(pts)


def test_single_and_dominated_chain(spark):
    pts = [(1, 1000, 50)]
    assert _run_spark(spark, pts) == [(1, 1000, 50)]
    pts = [(i, 900 + i * 10, 60 - i) for i in range(10)]
    # price rises while size falls → only the first survives
    assert _run_spark(spark, pts) == [(0, 900, 60)]
