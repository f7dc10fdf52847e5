"""Exact distributed ranking operator (operators/ranking.py): the
two-pass range-bucketed rank/cumsum must be BIT-IDENTICAL to the
partitionless global window it replaces (the r6-verdict scale fix),
for any total order, under ties, at any bucket count — and the
rewritten queries' plans must contain zero partitionless Window
nodes."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.window import Window

from molgraphdb_spark.operators.ranking import (
    exact_div,
    ntile_from_rank,
    with_order_stats,
)
from molgraphdb_spark.plans.explain import n_partitionless_windows


def _tied(spark, n=5003, mod=97):
    # heavy ties: only `mod` distinct primary values over n rows
    return spark.range(n).select(
        F.col("id").alias("k"), ((F.col("id") * 2654435761) % mod).alias("v")
    )


def test_rank_and_cumsum_match_global_window(spark):
    df = _tied(spark)
    order = [F.desc("v"), F.asc("k")]
    w = Window.orderBy(*order)
    exp = {
        r["k"]: (r["rn"], r["cum"])
        for r in df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rn"),
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
        ).collect()
    }
    got_df, totals = with_order_stats(
        df, order, rank_col="rn", cumsum={"v": "cum"}, n_buckets=7
    )
    got = {r["k"]: (r["rn"], r["cum"]) for r in got_df.collect()}
    assert got == exp
    assert totals["n"] == 5003
    # pass-1 grand total == the windowed formulation's final cumsum
    assert totals["v"] == max(c for _, c in exp.values())


def test_ntile_from_rank_matches_spark_ntile(spark):
    df = _tied(spark, n=1009)
    order = [F.asc("v"), F.asc("k")]
    w = Window.orderBy(*order)
    exp = {
        r["k"]: (r["t4"], r["t5"], r["t10"])
        for r in df.select(
            "k",
            F.ntile(4).over(w).alias("t4"),
            F.ntile(5).over(w).alias("t5"),
            F.ntile(10).over(w).alias("t10"),
        ).collect()
    }
    got_df, totals = with_order_stats(df, order, rank_col="rn", n_buckets=5)
    n = totals["n"]
    got = {
        r["k"]: (r["t4"], r["t5"], r["t10"])
        for r in got_df.select(
            "k",
            ntile_from_rank(F.col("rn"), n, 4).alias("t4"),
            ntile_from_rank(F.col("rn"), n, 5).alias("t5"),
            ntile_from_rank(F.col("rn"), n, 10).alias("t10"),
        ).collect()
    }
    assert got == exp


def test_fewer_rows_than_tiles_and_buckets(spark):
    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    got_df, totals = with_order_stats(
        df, [F.asc("v"), F.asc("k")], rank_col="rn", n_buckets=64
    )
    ranks = {r["k"]: r["rn"] for r in got_df.collect()}
    assert ranks == {0: 1, 1: 2, 2: 3}
    assert totals["n"] == 3
    # n < k: every row its own tile
    tiles = {
        r["k"]: r["t"]
        for r in got_df.select(
            "k", ntile_from_rank(F.col("rn"), 3, 10).alias("t")
        ).collect()
    }
    assert tiles == {0: 1, 1: 2, 2: 3}


def test_empty_input(spark):
    df = spark.range(10).select(F.col("id").alias("v")).filter("v > 100")
    got_df, totals = with_order_stats(
        df, [F.asc("v")], rank_col="rn", cumsum={"v": "cum"}
    )
    assert got_df.count() == 0
    assert totals == {"n": 0, "v": 0}


def test_exact_div_is_integer_exact(spark):
    df = spark.range(1, 1000).select(F.col("id").alias("x"))
    got = df.select("x", exact_div(F.col("x"), 7).alias("d")).collect()
    for r in got:
        assert r["d"] == r["x"] // 7


def test_rejects_degenerate_args(spark):
    df = spark.range(3)
    with pytest.raises(ValueError):
        with_order_stats(df, [F.asc("id")])
    with pytest.raises(ValueError):
        ntile_from_rank(F.col("id"), 10, 0)
    with pytest.raises(ValueError):
        exact_div(F.col("id"), 0)


# ---------------------------------------------------------------------------
# Plan shape: the six rewritten corpus-growing ranking queries (plus the
# vocabulary edge case) must contain ZERO partitionless Window nodes —
# the single-partition funnel is the one scale-killer class the r6
# verdict left open.
# ---------------------------------------------------------------------------
RANKING_FAMILY = [
    ("relational", "parts_abc_analysis"),
    ("relational", "customer_rfm_segments"),
    ("relational", "customer_spend_gini"),
    ("relational", "customer_lorenz_deciles"),
    ("relational", "customer_spend_exact_percentiles"),
    ("reshape", "ntile_customer_value"),
    ("mixing", "doc_weighted_sample"),
    ("text", "vocab_zipf_slope"),
]


@pytest.mark.parametrize("mod,qname", RANKING_FAMILY)
def test_no_partitionless_window_in_ranking_family(spark, sf_dir, mod, qname):
    import importlib

    m = importlib.import_module(f"molgraphdb_spark.queries.{mod}")
    df = m.QUERIES[qname](spark, sf_dir)
    assert n_partitionless_windows(df) == 0


def test_detector_flags_a_global_window(spark):
    # sanity: the detector actually detects the anti-pattern
    df = spark.range(100).select(
        F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    assert n_partitionless_windows(df) == 1


# ---------------------------------------------------------------------------
# Per-group variant: with_grouped_order_stats must match the
# PARTITIONED window exactly (the few-large-groups funnel class).
# ---------------------------------------------------------------------------
def test_grouped_rank_cumsum_match_partitioned_window(spark):
    from molgraphdb_spark.operators.ranking import with_grouped_order_stats

    df = spark.range(4007).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),   # 3 large groups
        ((F.col("id") * 2654435761) % 89).alias("v"),  # heavy ties
    )
    order = [F.desc("v"), F.asc("k")]
    w = Window.partitionBy("g").orderBy(*order)
    exp = {
        r["k"]: (r["rn"], r["cum"], r["n"])
        for r in df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rn"),
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
            F.count(F.lit(1)).over(
                Window.partitionBy("g").orderBy(F.lit(1)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("n"),
        ).collect()
    }
    got_df = with_grouped_order_stats(
        df, ["g"], order, rank_col="rn", cumsum={"v": "cum"}, count_col="n",
        n_buckets=7,
    )
    got = {r["k"]: (r["rn"], r["cum"], r["n"]) for r in got_df.collect()}
    assert got == exp


def test_grouped_ntile_cols_matches_partitioned_ntile(spark):
    from molgraphdb_spark.operators.ranking import (
        ntile_from_rank_cols,
        with_grouped_order_stats,
    )

    df = spark.range(1013).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("g"),
        ((F.col("id") * 48271) % 59).alias("v"),
    )
    order = [F.asc("v"), F.asc("k")]
    w = Window.partitionBy("g").orderBy(*order)
    exp = {
        r["k"]: r["t"]
        for r in df.select("k", F.ntile(10).over(w).alias("t")).collect()
    }
    ranked = with_grouped_order_stats(
        df, ["g"], order, rank_col="_rn", count_col="_n", n_buckets=5
    )
    got = {
        r["k"]: r["t"]
        for r in ranked.select(
            "k", ntile_from_rank_cols("_rn", "_n", 10).alias("t")
        ).collect()
    }
    assert got == exp
    # tiny-group edge: n < k → tile == rank
    tiny = spark.createDataFrame([("a", 1), ("a", 2)], "g string, v long")
    r2 = with_grouped_order_stats(
        tiny, ["g"], [F.asc("v")], rank_col="_rn", count_col="_n"
    )
    t2 = sorted(
        r["t"] for r in r2.select(ntile_from_rank_cols("_rn", "_n", 10).alias("t")).collect()
    )
    assert t2 == [1, 2]


def test_source_length_deciles_no_partitioned_funnel(spark, sf_dir):
    from molgraphdb_spark.queries.reshape import source_length_deciles

    df = source_length_deciles(spark, sf_dir)
    assert n_partitionless_windows(df) == 0
    # and the only Window nodes are bucket-partitioned (no per-source
    # partition spec): the plan must not contain a source-partitioned sort
    from molgraphdb_spark.plans.explain import formatted_plan

    assert "windowspecdefinition(source#" not in formatted_plan(df)


def test_running_max_before_matches_range_window(spark):
    from molgraphdb_spark.operators.ranking import with_running_max_before

    # heavy key ties (peers must be EXCLUDED from their own max)
    df = spark.range(3001).select(
        F.col("id").alias("k"),
        ((F.col("id") * 48271) % 37).alias("key"),
        ((F.col("id") * 2654435761) % 1000).alias("v"),
    )
    w = Window.orderBy("key").rangeBetween(Window.unboundedPreceding, -1)
    exp = {
        r["k"]: r["m"]
        for r in df.select("k", F.max("v").over(w).alias("m")).collect()
    }
    got = {
        r["k"]: r["m"]
        for r in with_running_max_before(df, "key", "v", "m", n_buckets=7).collect()
    }
    assert got == exp
    # the smallest-key rows carry NULL in both formulations
    assert any(v is None for v in got.values())


def test_skyline_no_partitionless_window(spark, sf_dir):
    from molgraphdb_spark.queries.relational import parts_skyline

    assert n_partitionless_windows(parts_skyline(spark, sf_dir)) == 0


def test_detector_ignores_partitioned_unordered_windows(spark):
    # Window.partitionBy(k) with NO orderBy prints only two bracket
    # groups — it must NOT count as a funnel (it distributes by k)
    df = spark.range(100).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    w = Window.partitionBy("k")
    d = df.select("k", F.max("v").over(w).alias("m"))
    assert n_partitionless_windows(d) == 0
    # but a global unordered window (empty partitionBy) IS a funnel
    d2 = df.select(F.max("v").over(Window.partitionBy()).alias("m"))
    assert n_partitionless_windows(d2) == 1


def test_group_rows_frame_matches_window_collect_list(spark):
    from molgraphdb_spark.operators.ranking import with_group_rows_frame

    # groups of wildly different sizes incl. groups smaller than the
    # frame; heavy value ties
    df = spark.range(2003).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 3, F.lit("tiny"))
        .when(F.col("id") % 7 == 0, F.lit("small"))
        .otherwise(F.lit("big"))
        .alias("g"),
        ((F.col("id") * 2654435761) % 41).alias("v"),
    )
    order = [F.asc("v"), F.asc("k")]
    w = (
        Window.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(-15, Window.currentRow)
    )
    exp = {
        r["k"]: tuple(r["arr"])
        for r in df.select("k", F.collect_list("v").over(w).alias("arr")).collect()
    }
    got = {
        r["k"]: tuple(r["arr"])
        for r in with_group_rows_frame(
            df, ["g"], order, 15, "v", "arr", n_buckets=7
        ).collect()
    }
    assert got == exp


def test_group_rows_frame_zero_preceding(spark):
    from molgraphdb_spark.operators.ranking import with_group_rows_frame

    df = spark.range(20).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    got = with_group_rows_frame(df, ["g"], [F.asc("v")], 0, "v", "arr").collect()
    assert all(tuple(r["arr"]) == (r["v"],) for r in got)


def test_order_stats_null_keys_and_values_match_window(spark):
    # NULL order keys (NULLS FIRST under asc, like the window) and NULL
    # values (skipped by sum on both paths) must agree with the global
    # window exactly
    from pyspark.sql import Row

    rows = [
        Row(k=i, v=(None if i % 5 == 0 else i * 7 % 13), s=(None if i % 4 == 0 else i % 3))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k long, v long, s long")
    order = [F.asc("v"), F.asc("k")]
    w = Window.orderBy(*order)
    exp = {
        r["k"]: (r["rn"], r["cum"])
        for r in df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rn"),
            F.sum("s").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
        ).collect()
    }
    got_df, totals = with_order_stats(
        df, order, rank_col="rn", cumsum={"s": "cum"}, n_buckets=9
    )
    got = {r["k"]: (r["rn"], r["cum"]) for r in got_df.collect()}
    assert got == exp
    assert totals["n"] == 500


def test_grouped_null_group_keys_kept(spark):
    # r7 advice: the offset join must be NULL-safe — rows whose group
    # key is NULL form their own group, exactly like a partitioned
    # window, instead of silently vanishing through an inner equi-join.
    from molgraphdb_spark.operators.ranking import with_grouped_order_stats

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), (None, 3, 5), (None, 4, 7), ("b", 5, 1)],
        "g string, k long, v long",
    )
    order = [F.asc("v"), F.asc("k")]
    w = Window.partitionBy("g").orderBy(*order)
    exp = {
        r["k"]: (r["rn"], r["cum"])
        for r in df.select(
            "k",
            F.row_number().over(w).cast("long").alias("rn"),
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
        ).collect()
    }
    got_df = with_grouped_order_stats(
        df, ["g"], order, rank_col="rn", cumsum={"v": "cum"}, n_buckets=3
    )
    got = {r["k"]: (r["rn"], r["cum"]) for r in got_df.collect()}
    assert got == exp
    assert len(got) == 5  # the two NULL-group rows survive


def test_grouped_cumsum_signed_values_exact(spark):
    # r7 advice: the per-group sum offset must be the first row's
    # cum - value (min_by over rank), not min(cum - value) — the
    # latter is wrong for SIGNED values where cum is non-monotone.
    from molgraphdb_spark.operators.ranking import with_grouped_order_stats

    rows = [("g1", 1, 5), ("g1", 2, -9), ("g1", 3, 2),
            ("g2", 4, -4), ("g2", 5, 6), ("g2", 6, -1)]
    df = spark.createDataFrame(rows, "g string, k long, v long")
    order = [F.asc("k")]
    w = Window.partitionBy("g").orderBy(*order)
    exp = {
        r["k"]: r["cum"]
        for r in df.select(
            "k",
            F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("cum"),
        ).collect()
    }
    got_df = with_grouped_order_stats(
        df, ["g"], order, cumsum={"v": "cum"}, n_buckets=4
    )
    got = {r["k"]: r["cum"] for r in got_df.collect()}
    assert got == exp
    assert [got[k] for k in (1, 2, 3)] == [5, -4, -2]


def test_global_cumsum_signed_values_exact(spark):
    # the global operator, signed too: driver prefix offsets are exact
    # Python-int arithmetic, so negatives need no special case — pin it
    df = spark.createDataFrame(
        [(1, 5), (2, -9), (3, 2), (4, -100), (5, 50)], "k long, v long"
    )
    got_df, totals = with_order_stats(
        df, [F.asc("k")], cumsum={"v": "cum"}, n_buckets=3
    )
    got = {r["k"]: r["cum"] for r in got_df.collect()}
    assert got == {1: 5, 2: -4, 3: -2, 4: -102, 5: -52}
    assert totals["v"] == -52


def test_float_cumsum_rejected(spark):
    # r7 advice: floating-point running sums are association-order-
    # dependent — the operator must refuse rather than return
    # near-but-not-bit-identical results.
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 0.5).alias("v")
    )
    with pytest.raises(TypeError, match="association-order"):
        with_order_stats(df, [F.asc("k")], cumsum={"v": "cum"})


def test_group_rows_frame_segment_boundaries(spark):
    # Force many segments (seg_len barely above the frame) so frames
    # cross segment boundaries constantly — the replicated-context path
    # must still rebuild every frame exactly.
    from molgraphdb_spark.operators.ranking import with_group_rows_frame

    df = spark.range(1001).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 48271) % 37).alias("v"),
    )
    order = [F.asc("v"), F.asc("k")]
    w = Window.partitionBy("g").orderBy(*order).rowsBetween(-15, Window.currentRow)
    exp = {
        r["k"]: tuple(r["arr"])
        for r in df.select("k", F.collect_list("v").over(w).alias("arr")).collect()
    }
    for seg in (16, 17, 31, 100):
        got = {
            r["k"]: tuple(r["arr"])
            for r in with_group_rows_frame(
                df, ["g"], order, 15, "v", "arr", n_buckets=5, seg_len=seg
            ).collect()
        }
        assert got == exp, f"seg_len={seg}"
    with pytest.raises(ValueError, match="seg_len"):
        with_group_rows_frame(df, ["g"], order, 15, "v", "arr", seg_len=15)


def test_group_rows_frame_exact_segment_multiple(spark):
    # total an exact multiple of seg_len: the last-segment context cap
    # (r8 ADVICE — tail rows must not replicate into a nonexistent
    # segment s_max+1) has its off-by-one risk exactly here, where the
    # final segment ends flush at total.
    from molgraphdb_spark.operators.ranking import with_group_rows_frame

    df = spark.range(992).select(  # 992 = 31 * 32
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("g"),
        ((F.col("id") * 16807) % 41).alias("v"),
    )
    order = [F.asc("v"), F.asc("k")]
    w = Window.partitionBy("g").orderBy(*order).rowsBetween(-7, Window.currentRow)
    exp = {
        r["k"]: tuple(r["arr"])
        for r in df.select("k", F.collect_list("v").over(w).alias("arr")).collect()
    }
    got = {
        r["k"]: tuple(r["arr"])
        for r in with_group_rows_frame(
            df, ["g"], order, 7, "v", "arr", n_buckets=4, seg_len=31
        ).collect()
    }
    assert got == exp


def test_grouped_running_min_matches_window(spark):
    # random signed values, NULL group keys included, 2 vs 17 buckets —
    # must equal the plain per-group window min exactly.
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from molgraphdb_spark.operators.ranking import with_grouped_running_min

    rng = random.Random(23)
    rows = [
        (
            rng.choice(["a", "b", "c", None]),
            i,
            rng.randrange(-1000, 1000),
        )
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    w = (
        Window.partitionBy("g")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        (tuple(r) for r in df.withColumn("m", F.min("v").over(w)).collect()),
        key=lambda t: (t[0] or "", t[1:]),
    )
    for nb in (2, 17):
        got = sorted(
            (
                tuple(r)
                for r in with_grouped_running_min(
                    df, ["g"], [F.asc("i")], "v", "m", n_buckets=nb
                ).collect()
            ),
            key=lambda t: (t[0] or "", t[1:]),
        )
        assert got == want


def test_grouped_running_min_rejects_float(spark):
    # NaN ranks LARGEST under Spark's window min but wins Python's
    # first-argument min in the driver fold — float columns are a
    # typed error (the cumsum precedent), not a silent divergence.
    import pytest
    from pyspark.sql import functions as F

    from molgraphdb_spark.operators.ranking import with_grouped_running_min

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, i long, v double")
    with pytest.raises(TypeError, match="NaN ordering"):
        with_grouped_running_min(df, ["g"], [F.asc("i")], "v", "m")
