"""Reshaping + distributional operators: pivot, unpivot, explicit
grouping sets, exact quantiles. None exist in the reference (its only
aggregation surface is counts/set-unions, SURVEY.md §2.4); these round
out the relational inventory Spark users expect.

Scale notes:
- ``pivot`` with an EXPLICIT value list compiles to one pass of
  conditional aggregation (map-side partial aggs, single shuffle on
  the group key). Omitting the value list adds a whole extra job just
  to discover distinct values — never do that at 100 TB.
- ``unpivot`` is a zero-shuffle row expansion (Expand node).
- ``groupingSets`` expands each input row once per matching set —
  cheaper than unioning N separate group-bys, one shuffle total.
- exact ``percentile`` needs the full value multiset per group: fine
  for bounded group counts; for high-cardinality groups switch to
  ``approx_percentile`` (t-digest) — the documented trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from molgraphdb_spark.session import tune
from molgraphdb_spark.sources.tables import load_table

ORDER_STATUSES = ["F", "O", "P"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts pivoted: one row per priority, one column per
    order status (explicit value list → single-pass conditional agg)."""
    orders = _t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s.lower()}") for s in ORDER_STATUSES],
    ).orderBy("o_orderpriority")


PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long: lineitem measure totals unpivoted to
    (measure, total) rows — the Expand-based inverse of pivot."""
    li = _t(spark, sf_dir, "lineitem")
    totals = li.agg(
        F.round(F.sum("l_quantity"), 2).alias("quantity"),
        F.round(F.sum("l_extendedprice"), 2).alias("extendedprice"),
        F.round(F.sum("l_discount"), 2).alias("discount"),
        F.round(F.sum("l_tax"), 2).alias("tax"),
    )
    return totals.unpivot(
        [], ["quantity", "extendedprice", "discount", "tax"], "measure", "total"
    ).orderBy("measure")


UNPIVOT_SQL = """
WITH t AS (
  SELECT ROUND(SUM(l_quantity), 2) AS quantity,
         ROUND(SUM(l_extendedprice), 2) AS extendedprice,
         ROUND(SUM(l_discount), 2) AS discount,
         ROUND(SUM(l_tax), 2) AS tax
  FROM lineitem
)
SELECT 'quantity' AS measure, quantity AS total FROM t
UNION ALL SELECT 'extendedprice', extendedprice FROM t
UNION ALL SELECT 'discount', discount FROM t
UNION ALL SELECT 'tax', tax FROM t
ORDER BY measure
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by explicit grouping sets ((status), (priority), ()) —
    neither a rollup nor a cube; one Expand + one shuffle."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       ROUND(SUM(o_totalprice), 2) AS revenue,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus, o_orderpriority
"""


def quantiles_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated price quantiles per return flag,
    emitted in integer cents (floor(x*100+0.5)) for engine-portable
    hashing. Scale note: exact percentile materializes each group's
    values — swap to approx_percentile when groups stop fitting."""
    li = _t(spark, sf_dir, "lineitem")
    # ONE percentile aggregate with the probability array: four scalar
    # F.percentile calls each buffer+sort the group's values separately
    # (4x the work; measured ~4 s vs ~1.5 s at sf0.1)
    ps = F.percentile("l_extendedprice", F.array(*[F.lit(p) for p in (0.25, 0.5, 0.75, 0.95)]))
    return (
        li.groupBy("l_returnflag")
        .agg(ps.alias("qs"))
        .select(
            "l_returnflag",
            *[
                F.floor(F.element_at("qs", i + 1) * 100 + 0.5).alias(name)
                for i, name in enumerate(
                    ("p25_cents", "p50_cents", "p75_cents", "p95_cents")
                )
            ],
        )
        .orderBy("l_returnflag")
    )


QUANTILES_SQL = """
SELECT l_returnflag,
       CAST(floor(quantile_cont(l_extendedprice, 0.25) * 100 + 0.5) AS BIGINT) AS p25_cents,
       CAST(floor(quantile_cont(l_extendedprice, 0.50) * 100 + 0.5) AS BIGINT) AS p50_cents,
       CAST(floor(quantile_cont(l_extendedprice, 0.75) * 100 + 0.5) AS BIGINT) AS p75_cents,
       CAST(floor(quantile_cont(l_extendedprice, 0.95) * 100 + 0.5) AS BIGINT) AS p95_cents
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def approx_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented scale path for ``quantiles_price_by_flag``:
    ``approx_percentile`` (Greenwald–Khanna sketch — constant memory per
    group, mergeable map-side partials) instead of materializing each
    group's full value multiset. Same emitted-row pattern as
    ``approx_distinct_parts`` (the HLL twin): the sketch value itself is
    engine-specific, so the row carries the exact quantiles both engines
    compute identically plus booleans asserting the sketch landed within
    a 1% relative band of each — the sketch still runs (the booleans
    derive from it), the driver gets a hashable oracle row, and pytest
    additionally pins the error band."""
    li = _t(spark, sf_dir, "lineitem")
    # array-probability calls: scalar percentile/percentile_approx
    # aggs each keep their own buffer/sketch per group — the array
    # form buffers once (same lesson as quantiles_price_by_flag)
    exact = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95))
    )
    approx = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
    )
    agg = li.groupBy("l_returnflag").agg(
        exact.alias("ex"), approx.alias("ap")
    ).select(
        "l_returnflag",
        F.element_at("ex", 1).alias("exact_p50"),
        F.element_at("ex", 2).alias("exact_p95"),
        F.element_at("ap", 1).alias("a50"),
        F.element_at("ap", 2).alias("a95"),
    )
    band = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) <= F.col(e) * F.lit(0.01)
    )
    return agg.select(
        "l_returnflag",
        F.floor(F.col("exact_p50") * 100 + 0.5).cast("long").alias("p50_cents"),
        F.floor(F.col("exact_p95") * 100 + 0.5).cast("long").alias("p95_cents"),
        band("a50", "exact_p50").alias("p50_within_band"),
        band("a95", "exact_p95").alias("p95_within_band"),
    ).orderBy("l_returnflag")


APPROX_QUANTILES_SQL = """
SELECT l_returnflag,
       CAST(floor(quantile_cont(l_extendedprice, 0.50) * 100 + 0.5) AS BIGINT) AS p50_cents,
       CAST(floor(quantile_cont(l_extendedprice, 0.95) * 100 + 0.5) AS BIGINT) AS p95_cents,
       TRUE AS p50_within_band,
       TRUE AS p95_within_band
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def full_outer_nation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer counts vs supplier
    counts — keeps nations populated on either side only (join-type
    coverage: the one outer variant the rest of the inventory lacks)."""
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


FULL_OUTER_SQL = """
WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
           FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
           FROM supplier GROUP BY 1)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s USING (nationkey)
ORDER BY nationkey
"""


def sample_systematic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% systematic sample of orders: keep a row when
    the first 8 hex chars of md5(orderkey), read as an integer, fall in
    the lowest 1/20 of the 32-bit space. Unlike TABLESAMPLE this is
    reproducible across engines AND across reruns — the property a
    training-data pipeline needs for holdout splits. Map-only: the
    predicate pushes into the scan stage, no shuffle."""
    orders = _t(spark, sf_dir, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        orders.filter(bucket % 20 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


SAMPLE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 20 = 0
ORDER BY o_orderkey
"""


def ntile_customer_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime order value → quartile (ntile) + percent_rank,
    with a custkey tiebreak so ranks are deterministic across engines.
    One shuffle for the groupBy; the global ranking is the exact
    two-pass distributed rank (operators/ranking.py: ordered range
    buckets → broadcast prefix offsets → bucket-partitioned window) —
    the per-customer relation grows with the corpus, so the old
    single-partition ntile window is banned. NTILE(4) and
    PERCENT_RANK are reconstructed arithmetically from the global
    row_number (total order ⇒ rank == row_number, so percent_rank is
    (rn−1)/(n−1) in the same double arithmetic both engines use).
    Bit-identical to the windowed form (oracle unchanged)."""
    from molgraphdb_spark.operators.ranking import ntile_from_rank, with_order_stats

    orders = _t(spark, sf_dir, "orders")
    totals = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("lifetime_value")
    )
    ranked, stats = with_order_stats(
        totals, [F.desc("lifetime_value"), F.asc("o_custkey")], rank_col="_rn"
    )
    n = stats["n"]
    pct = (
        F.lit(0.0)
        if n <= 1
        else (F.col("_rn") - 1).cast("double") / F.lit(float(n - 1))
    )
    return (
        ranked.select(
            "o_custkey",
            "lifetime_value",
            ntile_from_rank(F.col("_rn"), n, 4).alias("value_quartile"),
            F.floor(pct * 10000 + 0.5).alias("pct_rank_bp"),
        )
        .orderBy("o_custkey")
    )


STRATUM_QUOTA = 40  #: documents kept per (lang, source) stratum


def sample_stratified_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of the documents corpus: keep
    up to STRATUM_QUOTA docs per (lang, source) stratum, chosen by
    md5(doc_id) order — the reproducible equivalent of "random k per
    stratum" a training-data pipeline uses to balance mixtures across
    languages/sources. Hash order makes the pick independent of both
    ingestion order and engine, so holdout sets are stable across
    reruns AND across engines (same property as
    sample_systematic_orders, lifted to per-stratum quotas).

    One shuffle on the stratum key; the per-stratum top-k is a window
    over that same partitioning (rank + filter, no global sort). At
    100 TB strata are large but this is NOT the per-group buffering
    funnel the r7 sweep removed elsewhere: the rank≤k filter compiles
    to WindowGroupLimit with a MAP-SIDE partial stage (plan-asserted:
    two WindowGroupLimit nodes), so every task keeps at most k rows
    per stratum BEFORE the shuffle and the output is quota-bounded:
    |strata| × k rows."""
    docs = _t(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    pick = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang", "source").orderBy(pick.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", "source", F.row_number().over(w).alias("pick_rank"))
        .filter(F.col("pick_rank") <= STRATUM_QUOTA)
        .orderBy("lang", "source", "pick_rank")
    )


SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source, pick_rank FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (PARTITION BY lang, source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS pick_rank
  FROM documents)
WHERE pick_rank <= {STRATUM_QUOTA}
ORDER BY lang, source, pick_rank
"""


NTILE_SQL = """
WITH totals AS (
  SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS lifetime_value
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, lifetime_value,
       NTILE(4) OVER w AS value_quartile,
       CAST(floor(PERCENT_RANK() OVER w * 10000 + 0.5) AS BIGINT) AS pct_rank_bp
FROM totals
WINDOW w AS (ORDER BY lifetime_value DESC, o_custkey ASC)
ORDER BY o_custkey
"""


def source_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE decile table of document length — the mixture-health
    report a curation pipeline reads per corpus slice (is wiki's tail
    shorter than web's? did a crawl batch shift the p90?): for each
    source, documents rank into NTILE(10) by (n_chars, doc_id) and
    each decile reports its count and char range.

    Scale shape: ``Window.partitionBy(source)`` is the OTHER funnel
    class — a handful of sources, each growing with the corpus, so
    every source still sorts in ONE task. This uses
    with_grouped_order_stats (operators/ranking.py): one global
    two-pass rank over (source, n_chars, doc_id) makes groups
    contiguous, per-source offsets come from the broadcast group
    dictionary, and NTILE reconstructs arithmetically from the
    per-group rank and size — zero partitioned OR partitionless
    window over a corpus-growing relation (plan-asserted)."""
    from molgraphdb_spark.operators.ranking import (
        ntile_from_rank_cols,
        with_grouped_order_stats,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    ranked = with_grouped_order_stats(
        docs,
        ["source"],
        [F.asc("n_chars"), F.asc("doc_id")],
        rank_col="_rn",
        count_col="_n",
    )
    return (
        ranked.withColumn("decile", ntile_from_rank_cols("_rn", "_n", 10))
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("chars_min"),
            F.max("n_chars").alias("chars_max"),
        )
        .orderBy("source", "decile")
    )


SOURCE_LEN_DECILES_SQL = """
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(NTILE(10) OVER (PARTITION BY source
              ORDER BY n_chars ASC, doc_id ASC) AS INT) AS decile
  FROM documents
)
SELECT source, decile, COUNT(*) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS chars_min,
       CAST(MAX(n_chars) AS BIGINT) AS chars_max
FROM d
GROUP BY source, decile
ORDER BY source, decile
"""


QUERIES = {
    "ntile_customer_value": ntile_customer_value,
    "source_length_deciles": source_length_deciles,
    "full_outer_nation_profile": full_outer_nation_profile,
    "sample_systematic_orders": sample_systematic_orders,
    "sample_stratified_docs": sample_stratified_docs,
    "pivot_status_by_priority": pivot_status_by_priority,
    "unpivot_lineitem_measures": unpivot_lineitem_measures,
    "grouping_sets_revenue": grouping_sets_revenue,
    "quantiles_price_by_flag": quantiles_price_by_flag,
    "approx_quantiles_price": approx_quantiles_price,
}

ORACLES = {
    "source_length_deciles": SOURCE_LEN_DECILES_SQL,
    "ntile_customer_value": NTILE_SQL,
    "full_outer_nation_profile": FULL_OUTER_SQL,
    "sample_systematic_orders": SAMPLE_SQL,
    "sample_stratified_docs": SAMPLE_STRATIFIED_SQL,
    "pivot_status_by_priority": PIVOT_SQL,
    "unpivot_lineitem_measures": UNPIVOT_SQL,
    "grouping_sets_revenue": GROUPING_SETS_SQL,
    "quantiles_price_by_flag": QUANTILES_SQL,
    "approx_quantiles_price": APPROX_QUANTILES_SQL,
}
