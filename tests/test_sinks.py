"""Sink semantics (S5/S6) + bucketed-layout plan tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from molgraphdb_spark.plans.explain import plan_summary
from molgraphdb_spark.sources.tables import load_table
from molgraphdb_spark.sources.writers import append_new_keys, write_bucketed


def test_append_new_keys_idempotent(spark, tmp_path):
    path = str(tmp_path / "edges")
    first = spark.createDataFrame(
        [("A", "B", 1), ("B", "A", -1), ("A", "B", 7)], ["src", "dst", "d"]
    )
    # in-batch dup collapses; both rows land
    assert append_new_keys(spark, path, first, ["src", "dst"]) == 2
    # exact re-append is a no-op (INSERT OR IGNORE)
    assert append_new_keys(spark, path, first, ["src", "dst"]) == 0
    # mixed batch: only the novel key lands
    second = spark.createDataFrame([("A", "B", 9), ("B", "C", 1)], ["src", "dst", "d"])
    assert append_new_keys(spark, path, second, ["src", "dst"]) == 1
    assert spark.read.parquet(path).count() == 3


def test_bucketed_join_no_shuffle(spark, sf_dir):
    # disable broadcast so the plan must choose sort-merge — at real
    # scale both sides are fact tables and broadcast isn't an option
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import shutil

    for t in ("t_orders_b", "t_lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/molgraphdb-spark-warehouse/{t}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "t_orders_b", "o_orderkey")
    write_bucketed(li, "t_lineitem_b", "l_orderkey")
    joined = (
        spark.table("t_lineitem_b")
        .join(spark.table("t_orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    s = plan_summary(joined)
    # the join itself is shuffle-free: the only exchange is the final
    # groupBy on o_custkey (not a bucket key)
    assert s["n_sortmerge_joins"] == 1
    assert s["n_exchanges"] <= 1, s["plan"]
    # and it returns the same answer as the unbucketed join
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    try:
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
