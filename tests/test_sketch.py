"""Misra–Gries heavy hitters: the standard guarantees checked against
exact counts on real and adversarial data."""

from __future__ import annotations

from pyspark.sql import functions as F

from molgraphdb_spark.operators.sketch import heavy_hitters


def _tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).alias("tok")
    )


def test_mg_guarantees_on_corpus(spark, sf_dir):
    tok = _tokens(spark, sf_dir).repartition(7)
    k = 20
    hh = {r.item: r for r in heavy_hitters(tok, "tok", k).collect()}
    exact = {r.tok: r.n for r in tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(exact.values())
    bound = n // (k + 1)
    # completeness: every item above the support threshold is present
    for t, c in exact.items():
        if c > bound:
            assert t in hh, (t, c, bound)
    # soundness: estimates are lower bounds within the error band
    for t, r in hh.items():
        assert r.est_count <= exact[t]
        assert exact[t] - r.est_count <= bound
        assert r.n_total == n and r.max_undercount == bound


def test_mg_skewed_stream(spark):
    # one hot key at 50%, long uniform tail across many partitions
    hot = spark.range(5000).select(F.lit("HOT").alias("tok"))
    tail = spark.range(5000).select(F.concat(F.lit("t"), (F.col("id") % 997)).alias("tok"))
    tok = hot.unionByName(tail).repartition(13)
    out = heavy_hitters(tok, "tok", k=10).collect()
    assert out[0].item == "HOT"
    assert out[0].est_count >= 5000 - 10000 // 11
