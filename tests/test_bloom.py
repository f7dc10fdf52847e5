"""Bloom-filter runtime join pruning (operators/bloom.py).

The operator's contract: no false negatives ever (every build key
passes the probe test), a usefully-low false-positive rate at the
default geometry, and a probe predicate that stays JVM-side and
evaluates BEFORE the exact join."""

import pytest
from pyspark.sql import functions as F

from molgraphdb_spark.operators.bloom import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_build,
    bloom_might_contain,
)


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(0, 2000).select((F.col("id") * 7 + 3).alias("k"))


def test_no_false_negatives(spark, keys_df):
    words = bloom_build(keys_df, "k")
    missed = keys_df.filter(~bloom_might_contain(F.col("k"), words)).count()
    assert missed == 0


def test_false_positive_rate_bounded(spark, keys_df):
    words = bloom_build(keys_df, "k")
    # 20k keys disjoint from the build set (build keys are ≡3 mod 7)
    probe = spark.range(0, 20000).select((F.col("id") * 7 + 5).alias("k"))
    fp = probe.filter(bloom_might_contain(F.col("k"), words)).count()
    # n=2000, m=65536, k=5 → theoretical FP ≈ 0.0006; allow 50x slack
    assert fp / 20000 < 0.03, fp


def test_bitmap_bounded_by_m(spark):
    words = bloom_build(spark.range(0, 100).select(F.col("id").alias("k")), "k")
    assert len(words) == BLOOM_M_BITS // 64
    assert all(-(1 << 63) <= w < (1 << 63) for w in words)
    nbits = sum(bin(w & ((1 << 64) - 1)).count("1") for w in words)
    assert 0 < nbits <= 100 * BLOOM_K


def test_deterministic_across_partitionings(spark):
    df1 = spark.range(0, 500).select(F.col("id").alias("k")).repartition(1)
    df17 = spark.range(0, 500).select(F.col("id").alias("k")).repartition(17)
    assert bloom_build(df1, "k") == bloom_build(df17, "k")


def test_probe_predicate_is_codegen_side(spark, keys_df):
    words = bloom_build(keys_df, "k")
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    plan = (
        probe.filter(bloom_might_contain(F.col("k"), words))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure map-side predicate


def test_prefilter_preserves_join_result(spark, sf_dir):
    # the registry query's invariant, pinned as a unit test too: bloom
    # on vs off gives the identical aggregate
    from molgraphdb_spark.queries.relational import orders_bloom_prefilter
    from molgraphdb_spark.sources.tables import load_table

    got = {
        (r.o_orderstatus, r.n_orders, r.revenue_c)
        for r in orders_bloom_prefilter(spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    plain = {
        (r.o_orderstatus, r.n_orders, r.revenue_c)
        for r in orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_semi"
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("revenue_c"),
        )
        .collect()
    }
    assert got == plain
