"""Count-Min sketch: the standard guarantees checked against exact
counts (overestimate-only, error band, merge/partition invariance)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from molgraphdb_spark.operators.cms import cms_estimate, cms_sketch


def _tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).alias("tok")
    )


def test_cms_guarantees_on_corpus(spark, sf_dir):
    tok = _tokens(spark, sf_dir).repartition(7)
    depth, width = 4, 2048
    exact = {
        r.tok: r.n
        for r in tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n = sum(exact.values())
    sketch = cms_sketch(tok, "tok", depth, width).cache()
    # probe the 10 most frequent tokens plus 3 absent ones
    top = sorted(exact, key=exact.get, reverse=True)[:10]
    absent = ["\x00never", "\x00seen", "\x00item"]
    est = {
        r.item: r
        for r in cms_estimate(sketch, top + absent, depth, width).collect()
    }
    for t in top:
        r = est[t]
        assert r.est_count >= exact[t]  # CMS never underestimates
        assert r.n_total == n
        # e/w * N with a generous constant (probabilistic bound; the
        # corpus vocabulary ~ thousands << width, so slack is ample)
        assert r.est_count - exact[t] <= max(1, int(5 * math.e * n / width))
    for t in absent:
        # absent items may collide but stay inside the same band
        assert est[t].est_count <= max(1, int(5 * math.e * n / width))


def test_cms_partition_invariance(spark, sf_dir):
    tok = _tokens(spark, sf_dir)
    a = {
        (r.r, r.c): r.weight
        for r in cms_sketch(tok.repartition(2), "tok").collect()
    }
    b = {
        (r.r, r.c): r.weight
        for r in cms_sketch(tok.repartition(17), "tok").collect()
    }
    assert a == b  # merged matrix independent of partitioning


def test_cms_exact_when_no_collisions(spark):
    # tiny vocabulary << width: every estimate must be exact
    df = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 7)).alias("tok")
    ).repartition(5)
    sketch = cms_sketch(df, "tok", 4, 4096)
    items = [f"k{i}" for i in range(7)]
    est = {r.item: r.est_count for r in cms_estimate(sketch, items, 4, 4096).collect()}
    exact = {
        r.tok: r.n
        for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert est == exact


def test_cms_null_and_total_row(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "tok string"
    ).repartition(2)
    sketch = cms_sketch(df, "tok", 4, 64).cache()
    total = sketch.filter(F.col("r") == -1).collect()
    assert len(total) == 1 and total[0].weight == 3  # nulls not counted
    est = {r.item: r.est_count for r in cms_estimate(sketch, ["a", "b"], 4, 64).collect()}
    assert est["a"] >= 2 and est["b"] >= 1
