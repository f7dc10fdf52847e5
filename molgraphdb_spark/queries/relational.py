"""Relational operator inventory (SURVEY.md §2.2, §2.3, §2.4, §2.6) as
named queries over the driver tables, each paired with a DuckDB oracle.

Design rules applied throughout:
- Declarative DataFrame API only — Catalyst supplies predicate pushdown,
  column pruning, join reordering, partial aggregation (SURVEY.md §4).
- Small dims joined with an explicit ``broadcast()`` hint: at 100 TB the
  fact side never moves for those joins (no shuffle), only the dim is
  replicated.
- Every computed column is aliased identically in Spark and SQL (driver
  hash-compares after sorting columns by name).
- Float aggregates are rounded on both sides: double addition is not
  associative, so an unrounded SUM would hash-differ between engines at
  the last ulp while being semantically identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from molgraphdb_spark.operators.ranking import ntile_from_rank, with_order_stats
from molgraphdb_spark.session import tune
from molgraphdb_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q1: pricing summary (TPC-H Q1 shape) — flagship aggregate scan.
# Reference analogue: the group-by-count surface of A2/A8/A10
# (main.py:319–325) generalized to multi-aggregate; SURVEY.md §7 M0.
# Scale: single shuffle on a 6-value grouping key; partial aggregation
# (map-side combine) reduces the shuffle to O(partitions * groups).
# --------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Q3-shape: customer ⋈ orders ⋈ lineitem with group-by revenue, top-10.
# Reference analogue: the "query join" J1 pattern at analytic scale.
# Scale: lineitem⋈orders shuffles on orderkey (both huge — sort-merge,
# AQE-coalesced); customer dim joined after aggregation would be better
# at extreme scale but customer is filterable first — Catalyst pushes
# the segment filter below the join.
# --------------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Q5-shape: six-way join, revenue per nation.
# Scale: region/nation/supplier are broadcast (no shuffle for those
# joins); only lineitem⋈orders and ⋈customer shuffle on their keys.
# --------------------------------------------------------------------------
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(cust.c_nationkey == sup.s_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# --------------------------------------------------------------------------
# P1/P2 analogue: projection + conjunctive filter with pushdown
# (reference validity predicate main.py:92–105 re-shaped onto lineitem).
# Scale: filter + 4-column ReadSchema reach the Parquet scan — verified
# via .explain in tests (PushedFilters).
# --------------------------------------------------------------------------
def filter_project_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") >= 30)
            & (F.col("l_discount") > 0.02)
            & (~F.col("l_returnflag").contains("N"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            # No rounding: per-row IEEE products are bit-identical across
            # engines, while ROUND ties (x.xx5) resolve differently.
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_quantity >= 30 AND l_discount > 0.02 AND NOT contains(l_returnflag, 'N')
"""


# --------------------------------------------------------------------------
# A1: distinct count (reference main.py:316–317 COUNT(DISTINCT smiles)).
# Scale note: exact distinct shuffles all keys; at 100 TB prefer
# approx_count_distinct (HLL) — exposed separately in bench, exact here
# because the oracle must match bit-for-bit.
# --------------------------------------------------------------------------
def distinct_count_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        F.countDistinct("o_custkey").alias("unique_customers"),
        F.count(F.lit(1)).alias("total_orders"),
    )


DISTINCT_COUNT_SQL = """
SELECT COUNT(DISTINCT o_custkey) AS unique_customers, COUNT(*) AS total_orders
FROM orders
"""


# --------------------------------------------------------------------------
# A2/A8/A10: group-by counts (reference main.py:319–325 — the
# commented-out GROUP BY relation COUNT(*)).
# --------------------------------------------------------------------------
def group_count_orderstatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_value"))
        .orderBy("o_orderstatus", "o_orderpriority")
    )


GROUP_COUNT_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS total_value
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
"""


# --------------------------------------------------------------------------
# O4: top-k per group via ranking window (SURVEY.md §2.5 — the
# visualizer's top-3-per-edge-count-bucket, mcs.py:546,583,651,662).
# Scale: single shuffle on the partition key; rank evaluated within
# partitions, no global sort.
# --------------------------------------------------------------------------
def topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").alias("totalprice"), "rk")
    )


TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice AS totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
)
WHERE rk <= 3
"""


# --------------------------------------------------------------------------
# O1/O5: multi-key descending sort + global cap (mcs.py:439–440 sort by
# (n_edges, n_nodes) desc; mcs.py:527 row cap). Unique tiebreaker added
# so the LIMIT boundary is deterministic.
# Scale: orderBy+limit is planned as TakeOrderedAndProject — per-
# partition top-k then a k-row merge on the driver; no full sort.
# --------------------------------------------------------------------------
def multikey_sort_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.orderBy(F.desc("p_size"), F.desc("p_retailprice"), F.asc("p_partkey"))
        .select("p_partkey", "p_name", "p_size", F.col("p_retailprice").alias("retailprice"))
        .limit(50)
    )


MULTIKEY_SORT_SQL = """
SELECT p_partkey, p_name, p_size, p_retailprice AS retailprice
FROM part
ORDER BY p_size DESC, p_retailprice DESC, p_partkey ASC
LIMIT 50
"""


# --------------------------------------------------------------------------
# J5: all-pairs cross join over a small dimension (mcs.py:744–751 —
# itertools.combinations over example molecules). Catalyst picks
# broadcast nested-loop for the tiny side, as the reference's loop did.
# --------------------------------------------------------------------------
def cross_pairs_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    a = nation.alias("a")
    b = nation.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
        )
    )


CROSS_PAIRS_SQL = """
SELECT a.n_name AS nation_a, b.n_name AS nation_b
FROM nation a, nation b
WHERE a.n_nationkey < b.n_nationkey
"""


# --------------------------------------------------------------------------
# J2 analogue: left-semi join — membership filter vs existing keys
# (main.py:216–218 "seed only if not already a cache key", positive form).
# --------------------------------------------------------------------------
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


# --------------------------------------------------------------------------
# J4/P4: left-anti join — the reference's novelty/dedup filter
# (add_and_return_new, main.py:262–270; INSERT OR IGNORE main.py:203).
# --------------------------------------------------------------------------
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
"""


# --------------------------------------------------------------------------
# A4-general: multi-statistic aggregate (min/max/avg/stddev).
# --------------------------------------------------------------------------
def agg_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.round(F.avg("l_extendedprice"), 3).alias("avg_price"),
            F.round(F.stddev_samp("l_extendedprice"), 3).alias("std_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


AGG_STATS_SQL = """
SELECT l_returnflag,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       ROUND(AVG(l_extendedprice), 3) AS avg_price,
       ROUND(STDDEV_SAMP(l_extendedprice), 3) AS std_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Analytic window with frame spec: per-customer running order total
# (SURVEY.md §2.5 — frame-spec windows enter via the extension surface).
# --------------------------------------------------------------------------
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       ROUND(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


# --------------------------------------------------------------------------
# Rollup (SURVEY.md §2.4 "absent in reference, covered natively"):
# customer counts per (region, nation) with subtotals.
# --------------------------------------------------------------------------
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_name", "n_name")
    )


ROLLUP_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
"""


# --------------------------------------------------------------------------
# Scalar-function surface: CASE bucketing (F11/F12 analogues) + string
# functions (F7 substring test generalized).
# --------------------------------------------------------------------------
def case_bucket_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50_000, "small")
        .when(F.col("o_totalprice") < 150_000, "medium")
        .otherwise("large")
    )
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
        .orderBy("bucket")
    )


CASE_BUCKET_SQL = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 150000 THEN 'medium'
            ELSE 'large' END AS bucket,
       COUNT(*) AS n, ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY 1
ORDER BY bucket
"""


def string_funcs_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias("segment_key"),
        F.col("c_name").contains("1").cast("int").alias("has_digit_one"),
    )


STRING_FUNCS_SQL = """
SELECT c_custkey,
       UPPER(c_name) AS name_upper,
       SUBSTRING(c_name, 1, 8) AS name_prefix,
       LENGTH(c_name) AS name_len,
       c_mktsegment || '-' || CAST(c_custkey AS VARCHAR) AS segment_key,
       CAST(contains(c_name, '1') AS INT) AS has_digit_one
FROM customer
"""


# --------------------------------------------------------------------------
# Correlated-aggregate shape: orders above their customer's average
# (scalar-subquery / re-join pattern; exercises join + agg composition).
# --------------------------------------------------------------------------
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # Compare against a rounded average on BOTH sides: the raw double
    # AVG depends on summation order, so a row landing exactly at the
    # boundary could flip between engines (module rounding rule).
    avg_per_cust = orders.groupBy("o_custkey").agg(
        F.round(F.avg("o_totalprice"), 2).alias("cust_avg")
    )
    return (
        orders.join(avg_per_cust, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", F.col("o_totalprice").alias("totalprice"))
    )


ORDERS_ABOVE_AVG_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice AS totalprice
FROM orders o
WHERE o_totalprice > (SELECT ROUND(AVG(i.o_totalprice), 2)
                      FROM orders i WHERE i.o_custkey = o.o_custkey)
"""


# --------------------------------------------------------------------------
# Date/time functions (extension surface — the reference has none,
# SURVEY.md §2.8): calendar truncation + date arithmetic.
# --------------------------------------------------------------------------
def orders_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy("month")
    )


ORDERS_MONTHLY_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS revenue
FROM orders GROUP BY 1 ORDER BY month
"""


def ship_delay_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: days between order and ship date, bucketed."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select((F.floor(delay / 30)).alias("delay_months"))
        .groupBy("delay_months")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("delay_months")
    )


SHIP_DELAY_SQL = """
SELECT CAST(floor(datediff('day', o_orderdate, l_shipdate) / 30) AS BIGINT) AS delay_months,
       COUNT(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY delay_months
"""


# --------------------------------------------------------------------------
# Array aggregation (A3 collect_set shape, emitted as a stable string).
# --------------------------------------------------------------------------
def supplier_part_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.size(F.collect_set("l_partkey")).alias("n_parts"),
            F.array_join(
                F.slice(F.array_sort(F.collect_set("l_partkey")), 1, 5), ","
            ).alias("first_parts"),
        )
        .orderBy("l_suppkey")
    )


SUPPLIER_PARTS_SQL = """
SELECT l_suppkey,
       len(list_distinct(list(l_partkey))) AS n_parts,
       array_to_string(list_sort(list_distinct(list(l_partkey)))[1:5], ',') AS first_parts
FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
"""


# --------------------------------------------------------------------------
# Cube (grouping-sets family; rollup's sibling — SURVEY.md §2.4 "absent
# in reference, native in Spark").
# --------------------------------------------------------------------------
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# --------------------------------------------------------------------------
# NULL-handling scalar functions (nullif/coalesce) — no natural NULLs in
# the corpus, so nullif synthesizes them.
# --------------------------------------------------------------------------
def null_handling_discounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    nd = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        nd.alias("discount_or_null"),
        F.coalesce(nd, F.lit(-1.0)).alias("discount_coalesced"),
        nd.isNull().cast("int").alias("is_zero_discount"),
    )


NULL_HANDLING_SQL = """
SELECT l_orderkey, l_linenumber,
       nullif(l_discount, 0.0) AS discount_or_null,
       coalesce(nullif(l_discount, 0.0), -1.0) AS discount_coalesced,
       CAST(nullif(l_discount, 0.0) IS NULL AS INT) AS is_zero_discount
FROM lineitem
"""


# --------------------------------------------------------------------------
# TPC-H Q6: forecasting revenue change — the canonical scan-filter-agg.
# Scale: all three predicates + the 3-column ReadSchema push to the
# parquet scan; single partial+final agg, no shuffle of row data.
# --------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# TPC-H Q10: returned-item reporting — fact-fact join + broadcast dims +
# group on a wide key + top-20. Scale: lineitem⋈orders shuffles on
# orderkey; customer/nation broadcast; the groupBy reuses the customer
# shuffle side; limit pushes through the sort (TakeOrderedAndProject).
# --------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# TPC-H Q14: promotion effect — conditional aggregation over a join
# (the SUM(CASE)/SUM ratio pattern). Scale: part side is dimension-like
# relative to lineitem; broadcast it so the date-filtered fact never
# shuffles.
# --------------------------------------------------------------------------
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter((F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT ROUND(100 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0.0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# --------------------------------------------------------------------------
# TPC-H Q7: volume shipping between two nations — double-dimension join
# with a pair predicate + year rollup. Scale: both nation maps broadcast;
# the fact tables shuffle once on orderkey; the pair filter prunes
# before the group-by.
# --------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# TPC-H Q13: customer order-count distribution — LEFT join preserving
# order-less customers, two-level aggregation. Scale: one shuffle on
# custkey, one (tiny) on the count.
# --------------------------------------------------------------------------
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# TPC-H Q18: large-volume customers — HAVING over a fact-side pre-agg
# that then drives a semi-filtered join. Scale: the qualifying-order
# set is tiny after the HAVING, so it broadcasts into the detail join;
# lineitem is aggregated once on its natural orderkey clustering.
# --------------------------------------------------------------------------
Q18_MIN_QTY = 320


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate"),
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM orders
JOIN (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_MIN_QTY}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
"""


# --------------------------------------------------------------------------
# TPC-H Q19: disjunctive multi-clause predicate over a join — the
# classic OR-of-ANDs the optimizer must keep push-down-able. Scale:
# part broadcasts; the common qty bound (the OR's hull) still prunes
# the fact scan.
# --------------------------------------------------------------------------
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(clause).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# TPC-H Q22: global sales opportunity — scalar-subquery threshold +
# anti join, grouped by nation. Scale: the AVG is a 1-row broadcast;
# the anti join is a shuffle-free broadcast-anti when the date-bounded
# custkey set is small, else a shuffled left-anti on custkey. (Adapted:
# every sf0.01 customer has SOME order, so "dormant" is defined as no
# order since Q22_CUTOFF instead of no order ever — same anti-join
# shape, non-degenerate result.)
# --------------------------------------------------------------------------
Q22_NATIONS = (1, 3, 5, 7, 9, 11, 13)
Q22_CUTOFF = "2000-01-01"


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(*Q22_NATIONS))
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderdate") >= Q22_CUTOFF),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


Q22_SQL = f"""
SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_nationkey IN {Q22_NATIONS}
  AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                   WHERE c_acctbal > 0 AND c_nationkey IN {Q22_NATIONS})
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '{Q22_CUTOFF}')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --------------------------------------------------------------------------
# Data profiling: per-column null counts / exact NDV / min-max in ONE
# aggregation pass — the ANALYZE TABLE-shaped statistics a pipeline
# collects before planning joins and validating landed data. Scale:
# single scan; the multi-distinct rewrites to one Expand + two-phase
# aggregate (map-side partials), never one job per column.
# --------------------------------------------------------------------------
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # four DIFFERENT countDistinct columns in one aggregate force the
    # distinct-Expand plan (5x the rows through every agg — the
    # approx_distinct_parts lesson); plain aggs in one branch, each
    # ndv in its own 2-stage distinct agg, 1x1 crossJoins
    plain = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("qty_nulls"),
        F.round(F.min("l_quantity"), 2).alias("qty_min"),
        F.round(F.max("l_quantity"), 2).alias("qty_max"),
        F.sum(F.col("l_discount").isNull().cast("long")).alias("disc_nulls"),
        F.round(F.min("l_discount"), 2).alias("disc_min"),
        F.round(F.max("l_discount"), 2).alias("disc_max"),
        F.min("l_returnflag").alias("flag_min"),
        F.max("l_returnflag").alias("flag_max"),
    )
    ndvs = [
        li.agg(F.countDistinct(c).alias(n))
        for c, n in (
            ("l_quantity", "qty_ndv"),
            ("l_discount", "disc_ndv"),
            ("l_returnflag", "flag_ndv"),
            ("l_orderkey", "order_ndv"),
        )
    ]
    out = plain
    for ndv in ndvs:
        out = out.crossJoin(ndv)
    return out.select(
        "n_rows", "qty_nulls", "qty_ndv", "qty_min", "qty_max",
        "disc_nulls", "disc_ndv", "disc_min", "disc_max",
        "flag_ndv", "flag_min", "flag_max", "order_ndv",
    )


PROFILE_LINEITEM_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qty_nulls,
       COUNT(DISTINCT l_quantity) AS qty_ndv,
       ROUND(MIN(l_quantity), 2) AS qty_min,
       ROUND(MAX(l_quantity), 2) AS qty_max,
       CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS disc_nulls,
       COUNT(DISTINCT l_discount) AS disc_ndv,
       ROUND(MIN(l_discount), 2) AS disc_min,
       ROUND(MAX(l_discount), 2) AS disc_max,
       COUNT(DISTINCT l_returnflag) AS flag_ndv,
       MIN(l_returnflag) AS flag_min,
       MAX(l_returnflag) AS flag_max,
       COUNT(DISTINCT l_orderkey) AS order_ndv
FROM lineitem
"""


# --------------------------------------------------------------------------
# ABC / Pareto analysis: cumulative-share classification of parts by
# revenue — the inventory-analytics staple (A = the head parts covering
# 70% of revenue, B = next 20%, C = tail).
# --------------------------------------------------------------------------
def parts_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part revenue in integer cents (floor(ep*(1-disc)*100+0.5)
    per line item — identical double expression both engines, then
    order-free integer sums), ranked desc with a deterministic
    partkey tiebreak, cumulative revenue share in basis points, and
    the A/<=7000bp, B/<=9000bp, C class.

    Scale shape: the fact scan reduces to a per-part aggregate FIRST
    (one shuffle on l_partkey, map-side combined); the cumulative sum
    over the ranked parts then uses the exact two-pass distributed
    ranking operator (operators/ranking.py: ordered range buckets →
    driver-side prefix offsets → bucket-partitioned window) instead of
    a single-partition global window, so NO task ever holds the whole
    parts relation — the r6-verdict scale fix, bit-identical to the
    windowed formulation (the oracle is unchanged). The grand total
    falls out of pass 1 as an exact driver literal (no extra global
    aggregate, no crossJoin)."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("long")
    rev = li.groupBy("l_partkey").agg(F.sum(cents).alias("revenue_c"))
    ranked_df, totals = with_order_stats(
        rev,
        [F.desc("revenue_c"), F.asc("l_partkey")],
        cumsum={"revenue_c": "cum_c"},
    )
    t = totals["revenue_c"] or 1  # empty-input guard; no rows evaluate it
    ranked = ranked_df.select(
        F.col("l_partkey").alias("p_partkey"), "revenue_c", "cum_c"
    )
    cum_bp = F.floor(F.col("cum_c") * 10000.0 / F.lit(t) + 0.5).cast("long")
    return ranked.select(
        "p_partkey",
        "revenue_c",
        cum_bp.alias("cum_share_bp"),
        F.when(cum_bp <= 7000, "A").when(cum_bp <= 9000, "B").otherwise("C").alias("abc_class"),
    ).orderBy(F.desc("revenue_c"), F.asc("p_partkey"))


PARTS_ABC_SQL = """
WITH rev AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT p_partkey, revenue_c,
         CAST(SUM(revenue_c) OVER (ORDER BY revenue_c DESC, p_partkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c,
         CAST(SUM(revenue_c) OVER () AS BIGINT) AS t
  FROM rev
)
SELECT p_partkey, revenue_c,
       CAST(floor(cum_c * 10000.0 / t + 0.5) AS BIGINT) AS cum_share_bp,
       CASE WHEN floor(cum_c * 10000.0 / t + 0.5) <= 7000 THEN 'A'
            WHEN floor(cum_c * 10000.0 / t + 0.5) <= 9000 THEN 'B'
            ELSE 'C' END AS abc_class
FROM ranked
ORDER BY revenue_c DESC, p_partkey
"""


# --------------------------------------------------------------------------
# Skew-mitigation demonstration: the salted two-phase aggregation
# (operators/skew.py) produces results identical to the plain groupBy.
# --------------------------------------------------------------------------
def skew_salted_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per o_orderstatus computed via the SALTED two-phase
    aggregation (count per (key, salt), re-aggregate per key) — wiring
    the skew operator into the oracle-checked surface proves the
    rewrite is semantics-preserving: the oracle is the plain GROUP BY.
    o_orderstatus is the textbook hot key (3 distinct values over the
    whole fact table); for algebraic counts Spark's map-side combine
    already absorbs the skew, so this exists as the CORRECTNESS pin
    for the pattern holistic aggregations genuinely need at 100 TB."""
    from molgraphdb_spark.operators.skew import salted_groupby_count

    orders = _t(spark, sf_dir, "orders")
    return (
        salted_groupby_count(orders.select("o_orderstatus"), "o_orderstatus")
        .select("o_orderstatus", F.col("n").cast("long").alias("n"))
        .orderBy("o_orderstatus")
    )


SKEW_SALTED_SQL = """
SELECT o_orderstatus, COUNT(*) AS n
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Skyline (Pareto frontier) via ONE window pass — the O(n log n)
# formulation of a query whose textbook form is a quadratic self-join.
# --------------------------------------------------------------------------
def parts_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (price low, size high) Pareto frontier: no other
    part is cheaper-or-equal AND bigger-or-equal with at least one
    strict. The naive formulation is NOT EXISTS over a self-join —
    O(n²) and a scale-killer; this plan is a SINGLE sort (one range
    shuffle): ordered by price, a part is dominated iff the running
    max size over STRICTLY cheaper parts reaches its size, or an
    equal-price part is strictly bigger. Two frames over one sort
    order — Spark evaluates both in the same Window exec, so at 100 TB
    the cost is one global sort, not n² comparisons. The oracle
    deliberately runs the quadratic NOT EXISTS form: two different
    algorithms agreeing on the frontier is the correctness point.
    Price is floored to cents so the range frame's -1 step means
    'strictly cheaper' exactly.

    Scale shape: frontier members must carry their price's MAX size
    (equal-price smaller parts are dominated; equal price AND size are
    mutually non-dominating, so all per-price maxima survive), so
    stage 1 is an ordinary skew-free hash aggregation + broadcast
    semi-reduction to ≤|distinct prices| candidates; the dominance
    scan over THAT reduced set then rides the strictly-before running
    max of operators/ranking.py (range buckets on price + driver
    prefix maxima — round 7): the price dictionary grows with the
    parts table, so even the reduced relation no longer pays a
    single-partition sort. Bit-identical to the old global RANGE
    window (oracle unchanged)."""
    part = _t(spark, sf_dir, "part")
    cents = F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long")
    sized = part.select(
        "p_partkey", cents.alias("price_c"), F.col("p_size").cast("int").alias("p_size")
    )
    per_price = sized.groupBy("price_c").agg(F.max("p_size").alias("_mx"))
    cand = sized.join(F.broadcast(per_price), "price_c").filter(
        F.col("p_size") == F.col("_mx")
    )
    from molgraphdb_spark.operators.ranking import with_running_max_before

    flagged = with_running_max_before(
        cand.select("p_partkey", "price_c", "p_size"),
        "price_c",
        "p_size",
        "_mx_cheaper",
    )
    return (
        flagged.filter(
            F.col("_mx_cheaper").isNull() | (F.col("_mx_cheaper") < F.col("p_size"))
        )
        .select("p_partkey", "price_c", "p_size")
        .orderBy("price_c", F.desc("p_size"), "p_partkey")
    )


PARTS_SKYLINE_SQL = """
WITH p AS (
  SELECT p_partkey, CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(p_size AS INT) AS p_size
  FROM part
)
SELECT p_partkey, price_c, p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
    AND (b.price_c < a.price_c OR b.p_size > a.p_size)
)
ORDER BY price_c, p_size DESC, p_partkey
"""


# --------------------------------------------------------------------------
# Bloom-filter runtime join pruning (operators/bloom.py) through the
# oracle gate: the bloom prefilter must be invisible in the RESULT.
# --------------------------------------------------------------------------
def orders_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of orders from BUILDING-segment customers, with the
    probe side pre-pruned by a bloom digest of the build keys
    (operators/bloom.py) BEFORE the exact broadcast join removes the
    false positives. The oracle is the plain semi-join aggregate: the
    bloom stage prunes, never decides, so the result is bit-identical
    with the filter on or off — which is exactly what makes the
    pattern safe to deploy at 100 TB, where it kills non-matching
    fact rows at the scan instead of after the shuffle."""
    from molgraphdb_spark.operators.bloom import bloom_build, bloom_might_contain

    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    words = bloom_build(cust, "c_custkey")
    orders = _t(spark, sf_dir, "orders")
    pruned = orders.filter(bloom_might_contain(F.col("o_custkey"), words))
    return (
        pruned.join(F.broadcast(cust), pruned.o_custkey == cust.c_custkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # floor to cents per ROW, then sum longs: exact in any
            # partition order (a float sum would drift in the last ulp)
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("revenue_c"),
        )
        .orderBy("o_orderstatus")
    )


ORDERS_BLOOM_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


# --------------------------------------------------------------------------
# RFM segmentation: the classic behavioral-quintile matrix.
# --------------------------------------------------------------------------
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-Frequency-Monetary segmentation: every ordering customer
    scored 1–5 on each axis by NTILE(5) (5 = most recent / most
    frequent / highest spend), combined into the 3-digit RFM code
    marketing pipelines key campaigns on (555 = champions, 111 =
    lost). Aggregated to segment counts — the report shape.

    Determinism: ntile needs a TOTAL order, so every ORDER BY ends in
    c_custkey (the repo tie rule); recency is integer days from the
    corpus max order date (a broadcast scalar), monetary is per-row
    cent-floored before the long sum. Shapes: one groupBy(custkey),
    then — because the per-customer relation GROWS with the corpus —
    each of the three quintile axes is an exact two-pass distributed
    rank (operators/ranking.py) with NTILE(5) reconstructed
    arithmetically from the global row_number (ntile_from_rank), not a
    partitionless window: no single task ever holds all customers.
    Bit-identical to the windowed form (oracle unchanged)."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias(
            "monetary_c"
        ),
    )
    maxd = orders.agg(F.max("o_orderdate").alias("max_d"))
    base = per_cust.crossJoin(F.broadcast(maxd)).select(
        "o_custkey",
        F.datediff(F.col("max_d"), F.col("last_order")).cast("long").alias("recency_d"),
        "frequency",
        "monetary_c",
    )
    s_r, totals = with_order_stats(
        base, [F.desc("recency_d"), F.asc("o_custkey")], rank_col="_rn_r"
    )
    s_f, _ = with_order_stats(
        s_r, [F.asc("frequency"), F.asc("o_custkey")], rank_col="_rn_f"
    )
    s_m, _ = with_order_stats(
        s_f, [F.asc("monetary_c"), F.asc("o_custkey")], rank_col="_rn_m"
    )
    n = totals["n"]
    scored = s_m.select(
        "o_custkey",
        ntile_from_rank(F.col("_rn_r"), n, 5).alias("r"),
        ntile_from_rank(F.col("_rn_f"), n, 5).alias("f"),
        ntile_from_rank(F.col("_rn_m"), n, 5).alias("m"),
    )
    return (
        scored.groupBy(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).cast("int").alias("rfm")
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("rfm")
    )


CUSTOMER_RFM_SQL = """
WITH pc AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_order, COUNT(*) AS frequency,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS monetary_c
  FROM orders GROUP BY o_custkey
), mx AS (SELECT MAX(o_orderdate) AS max_d FROM orders),
base AS (
  SELECT o_custkey, CAST(date_diff('day', last_order, max_d) AS BIGINT) AS recency_d,
         frequency, monetary_c
  FROM pc CROSS JOIN mx
), scored AS (
  SELECT o_custkey,
         NTILE(5) OVER (ORDER BY recency_d DESC, o_custkey ASC) AS r,
         NTILE(5) OVER (ORDER BY frequency ASC, o_custkey ASC) AS f,
         NTILE(5) OVER (ORDER BY monetary_c ASC, o_custkey ASC) AS m
  FROM base
)
SELECT CAST(r * 100 + f * 10 + m AS INT) AS rfm, COUNT(*) AS n_customers
FROM scored
GROUP BY 1
ORDER BY rfm
"""


# --------------------------------------------------------------------------
# Market-basket association rules: support / confidence / lift.
# --------------------------------------------------------------------------
def parts_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 part pairs co-ordered in the same order, scored with the
    association-rule trio: support (co-order count), confidence(a→b)
    = n_ab/n_a, and lift = n_ab·N/(n_a·n_b) — the Apriori-era
    primitives behind 'frequently bought together'.

    Scale shape: the pair join is keyed on the order (quadratic only
    within a basket — baskets are a handful of lines, so Σ|basket|²
    is linear-ish in the fact table), per-part counts broadcast back,
    N is one broadcast scalar. All three metrics emit as exact
    integer basis points; ranking ties break by the pair id."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    # localCheckpoint (NOT cache): referenced by both pair sides + the
    # per-part counts; frees on GC instead of pinning the CacheManager
    # across queries in a long-lived session (r6 advice)
    li = li.localCheckpoint()
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("n_pk")
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    joined = (
        pairs.join(
            F.broadcast(per_part.select(F.col("pk").alias("pa"), F.col("n_pk").alias("n_a"))),
            "pa",
        )
        .join(
            F.broadcast(per_part.select(F.col("pk").alias("pb"), F.col("n_pk").alias("n_b"))),
            "pb",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    return (
        joined.select(
            "pa",
            "pb",
            "support",
            F.expr("support * 10000 DIV n_a").cast("long").alias("conf_ab_bp"),
            F.expr("support * n_orders * 10000 DIV (n_a * n_b)")
            .cast("long")
            .alias("lift_bp"),
        )
        .orderBy(F.desc("support"), F.desc("lift_bp"), F.asc("pa"), F.asc("pb"))
        .limit(10)
    )


PARTS_BASKET_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
pp AS (SELECT l_partkey AS pk, COUNT(*) AS n_pk FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT pa, pb, CAST(support AS BIGINT) AS support,
       CAST(support * 10000 // x.n_pk AS BIGINT) AS conf_ab_bp,
       CAST(support * n.n_orders * 10000 // (x.n_pk * y.n_pk) AS BIGINT) AS lift_bp
FROM pairs
JOIN pp x ON x.pk = pa
JOIN pp y ON y.pk = pb
CROSS JOIN n
ORDER BY support DESC, lift_bp DESC, pa ASC, pb ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Concentration / inequality indices: HHI and Gini.
# --------------------------------------------------------------------------
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier revenue concentration —
    the antitrust-grade concentration number (Σ share², shares in
    basis points: <1500 competitive, >2500 concentrated), here the
    supply-chain-risk readout: how exposed is the order book to its
    top suppliers.

    Exact: per-supplier revenue sums cents as longs, shares floor to
    integer basis points against a broadcast total, and the index is
    the integer Σ share² — no float until nothing is left. One
    groupBy + one broadcast scalar."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")).alias("rev_c")
    )
    total = rev.agg(F.sum("rev_c").alias("total_c"))
    shares = rev.crossJoin(F.broadcast(total)).select(
        F.expr("rev_c * 10000 DIV total_c").alias("share_bp")
    )
    return shares.agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum(F.col("share_bp") * F.col("share_bp")).cast("long").alias("hhi"),
        F.max("share_bp").cast("long").alias("top_share_bp"),
    )


SUPPLIER_HHI_SQL = """
WITH rev AS (
  SELECT l_suppkey, SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev_c
  FROM lineitem GROUP BY l_suppkey
), t AS (SELECT SUM(rev_c) AS total_c FROM rev),
s AS (SELECT rev_c * 10000 // t.total_c AS share_bp FROM rev CROSS JOIN t)
SELECT CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi,
       CAST(MAX(share_bp) AS BIGINT) AS top_share_bp
FROM s
"""


def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the inequality number
    behind every "top X% of customers drive Y% of revenue" slide,
    from the sorted-cumulative formulation
    G = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n over spend ranked ascending.

    Exact: spend is cent-summed longs, the rank i is a TOTAL order
    (ties by custkey) materialized by the exact two-pass distributed
    ranking operator (operators/ranking.py — ordered range buckets +
    broadcast prefix offsets, no partitionless window: the
    per-customer relation grows with the corpus, so no single task
    may ever hold it), Σ i·xᵢ accumulates as DECIMAL(38,0), and the
    output is floored milli units from one fixed-order final
    expression. Bit-identical to the windowed form (oracle
    unchanged)."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("spend_c")
    )
    ranked_df, _tot = with_order_stats(
        spend, [F.asc("spend_c"), F.asc("o_custkey")], rank_col="i"
    )
    ranked = ranked_df.select("spend_c", "i")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("spend_c").alias("sx"),
        F.sum(dec(F.col("i")) * F.col("spend_c")).alias("six"),
    )
    g = (
        F.lit(2.0) * F.col("six").cast("double") / (F.col("n") * F.col("sx")).cast("double")
        - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.when(F.col("sx") == 0, F.lit(0))
        .otherwise(F.floor(g * 1000 + 0.5))
        .cast("long")
        .alias("gini_milli"),
    )


CUSTOMER_GINI_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend_c
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT spend_c,
         CAST(ROW_NUMBER() OVER (ORDER BY spend_c ASC, o_custkey ASC) AS BIGINT) AS i
  FROM spend
), m AS (
  SELECT COUNT(*) AS n, SUM(spend_c) AS sx,
         SUM(CAST(i AS DECIMAL(38,0)) * spend_c) AS six
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(CASE WHEN sx = 0 THEN 0
            ELSE floor((2.0 * CAST(six AS DOUBLE) / CAST(n * sx AS DOUBLE)
                        - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1000 + 0.5)
            END AS BIGINT) AS gini_milli
FROM m
"""


def customer_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve points behind the Gini number: customers ranked by
    spend DESCENDING into NTILE(10) deciles, each decile's revenue
    share and the top-down cumulative share in basis points — the
    "top 10% of customers drive X% of revenue" table itself.

    Exact: cent-long sums; the decile comes from NTILE(10)
    reconstructed arithmetically (ntile_from_rank) over the exact
    two-pass distributed rank (operators/ranking.py) — the
    per-customer relation grows with the corpus, so no partitionless
    window may sort it; the grand total is pass 1's exact driver
    literal; the ≤10-row decile cumulative sum is a broadcast
    triangular self-join (≤100 pairs), not a window. Bit-identical to
    the windowed form (oracle unchanged)."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("spend_c")
    )
    ranked, totals = with_order_stats(
        spend,
        [F.desc("spend_c"), F.asc("o_custkey")],
        rank_col="_rn",
        cumsum={"spend_c": "_cum_unused"},
    )
    total_c = totals["spend_c"] or 1  # empty-input guard; no rows evaluate it
    deciles = (
        ranked.withColumn("decile", ntile_from_rank(F.col("_rn"), totals["n"], 10))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("spend_c").alias("rev_c"),
        )
    )
    prior = deciles.select(
        F.col("decile").alias("_d2"), F.col("rev_c").alias("_rev2")
    )
    return (
        deciles.join(F.broadcast(prior), F.col("_d2") <= F.col("decile"))
        .groupBy("decile", "n_customers", "rev_c")
        .agg(F.sum("_rev2").alias("cum_c"))
        .select(
            "decile",
            "n_customers",
            F.expr(f"rev_c * 10000 DIV {total_c}").cast("long").alias("share_bp"),
            F.expr(f"cum_c * 10000 DIV {total_c}").cast("long").alias("cum_share_bp"),
        )
        .orderBy("decile")
    )


#: Percentiles reported by priority_ship_delay_percentiles, in bp.
DELAY_PCTS_BP = [5000, 9000, 9900]


def priority_ship_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p50/p90/p99 of order→ship latency (days) per
    order priority — the fulfillment-SLA table: does 1-URGENT actually
    ship faster at the tail? Deterministic to the day (no sketch): the
    p-th percentile of a priority with n line items is the delay at
    per-priority rank ⌈p·n⌉ under the total order (delay, orderkey,
    linenumber).

    Scale shape: priorities are FIVE and each grows with the fact
    table — the per-group funnel — so the per-priority rank rides
    with_grouped_order_stats (one global range order, broadcast
    per-priority offsets); targets are one exploded literal list and
    the positive-operand ceil DIV (the r7 cross-engine rule)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "o_orderpriority",
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            .cast("long")
            .alias("delay_d"),
        )
    )
    from molgraphdb_spark.operators.ranking import with_grouped_order_stats

    ranked = with_grouped_order_stats(
        base,
        ["o_orderpriority"],
        [F.asc("delay_d"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        rank_col="_rn",
        count_col="_n",
    )
    pcts = F.explode(
        F.array(*[F.lit(p).cast("long") for p in DELAY_PCTS_BP])
    ).alias("pct_bp")
    return (
        ranked.select("o_orderpriority", "delay_d", "_rn", "_n", pcts)
        .filter(F.expr("_rn = (pct_bp * _n + 9999) DIV 10000"))
        .select(
            "o_orderpriority",
            "pct_bp",
            F.col("_rn").cast("long").alias("rank_i"),
            F.col("_n").cast("long").alias("n_lines"),
            "delay_d",
        )
        .orderBy("o_orderpriority", "pct_bp")
    )


PRIORITY_DELAY_PCTL_SQL = f"""
WITH d AS (
  SELECT o_orderpriority, l_orderkey, l_linenumber,
         CAST(datediff('day', o_orderdate, l_shipdate) AS BIGINT) AS delay_d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), r AS (
  SELECT o_orderpriority, delay_d,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
              ORDER BY delay_d ASC, l_orderkey ASC, l_linenumber ASC) AS BIGINT) AS i,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM d
), t AS (SELECT UNNEST(ARRAY{DELAY_PCTS_BP}) AS pct_bp)
SELECT r.o_orderpriority, CAST(t.pct_bp AS BIGINT) AS pct_bp,
       CAST(r.i AS BIGINT) AS rank_i, CAST(r.n AS BIGINT) AS n_lines,
       r.delay_d
FROM t JOIN r ON r.i = (t.pct_bp * r.n + 9999) // 10000
ORDER BY o_orderpriority, pct_bp
"""


#: Percentiles reported by customer_spend_exact_percentiles, in bp.
SPEND_PCTS_BP = [2500, 5000, 7500, 9000, 9900]


def customer_spend_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles of per-customer spend — the deterministic twin
    of the approx_percentile family: the p-th percentile is the value
    at global rank ⌈p·n⌉ under the total order (spend asc, custkey
    asc), the nearest-rank definition both engines compute
    identically in integer arithmetic (no interpolation, no sketch
    error bound to reason about — the number a revenue SLA quotes).

    Scale shape: the rank is the exact two-pass distributed rank
    (operators/ranking.py — the per-customer relation grows with the
    corpus, so no partitionless window); n arrives as pass 1's exact
    driver literal, the five target ranks are integer literals, and
    the final filter keeps 5 rows. Recomputing approx vs exact drift
    is then one join away — the calibration a 100 TB pipeline runs
    before trusting its sketches."""
    orders = _t(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")).alias("spend_c")
    )
    ranked, totals = with_order_stats(
        spend, [F.asc("spend_c"), F.asc("o_custkey")], rank_col="i"
    )
    n = totals["n"]
    # ceil(p·n) via the POSITIVE-operand form (bp·n + 9999) // 10000 —
    # identical under Python floor division, Spark DIV and DuckDB //
    # (the latter two TRUNCATE toward zero, so the -(-a//b) ceil trick
    # silently floors there; caught by the sf0.001 parity gate where
    # p·n lands on .5)
    targets = {bp: (bp * n + 9999) // 10000 for bp in SPEND_PCTS_BP}
    target_df = F.broadcast(
        spark.createDataFrame(
            [(bp, r) for bp, r in targets.items()], "pct_bp long, i long"
        )
    )
    return (
        ranked.join(target_df, "i")
        .select("pct_bp", F.col("i").alias("rank_i"), "spend_c")
        .orderBy("pct_bp")
    )


CUSTOMER_PCTL_SQL = f"""
WITH spend AS (
  SELECT o_custkey, SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend_c
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT spend_c,
         CAST(ROW_NUMBER() OVER (ORDER BY spend_c ASC, o_custkey ASC) AS BIGINT) AS i,
         COUNT(*) OVER () AS n
  FROM spend
), targets AS (
  SELECT UNNEST(ARRAY{SPEND_PCTS_BP}) AS pct_bp
)
SELECT CAST(t.pct_bp AS BIGINT) AS pct_bp,
       CAST(r.i AS BIGINT) AS rank_i,
       CAST(r.spend_c AS BIGINT) AS spend_c
FROM targets t JOIN ranked r ON r.i = (t.pct_bp * r.n + 9999) // 10000
ORDER BY pct_bp
"""


CUSTOMER_LORENZ_SQL = """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend_c
  FROM orders GROUP BY o_custkey
), d AS (
  SELECT CAST(NTILE(10) OVER (ORDER BY spend_c DESC, o_custkey ASC) AS INT) AS decile,
         spend_c
  FROM spend
), g AS (
  SELECT decile, COUNT(*) AS n_customers, SUM(spend_c) AS rev_c FROM d GROUP BY decile
), t AS (SELECT SUM(rev_c) AS total_c FROM g)
SELECT decile, n_customers,
       CAST(rev_c * 10000 // t.total_c AS BIGINT) AS share_bp,
       CAST(SUM(rev_c) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000
            // t.total_c AS BIGINT) AS cum_share_bp
FROM g CROSS JOIN t
ORDER BY decile
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_nation_revenue": q5_nation_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_sales_opportunity": q22_sales_opportunity,
    "profile_lineitem": profile_lineitem,
    "filter_project_pushdown": filter_project_pushdown,
    "distinct_count_customers": distinct_count_customers,
    "group_count_orderstatus": group_count_orderstatus,
    "topk_orders_per_customer": topk_orders_per_customer,
    "multikey_sort_parts": multikey_sort_parts,
    "cross_pairs_nations": cross_pairs_nations,
    "semi_join_customers_with_orders": semi_join_customers_with_orders,
    "anti_join_customers_without_orders": anti_join_customers_without_orders,
    "agg_stats_lineitem": agg_stats_lineitem,
    "window_running_total": window_running_total,
    "rollup_region_nation": rollup_region_nation,
    "case_bucket_orders": case_bucket_orders,
    "string_funcs_customers": string_funcs_customers,
    "orders_above_customer_avg": orders_above_customer_avg,
    "orders_monthly_revenue": orders_monthly_revenue,
    "ship_delay_stats": ship_delay_stats,
    "supplier_part_sets": supplier_part_sets,
    "cube_status_priority": cube_status_priority,
    "null_handling_discounts": null_handling_discounts,
    "parts_abc_analysis": parts_abc_analysis,
    "skew_salted_status_counts": skew_salted_status_counts,
    "parts_skyline": parts_skyline,
    "orders_bloom_prefilter": orders_bloom_prefilter,
    "customer_rfm_segments": customer_rfm_segments,
    "parts_basket_rules": parts_basket_rules,
    "supplier_concentration_hhi": supplier_concentration_hhi,
    "customer_spend_gini": customer_spend_gini,
    "customer_lorenz_deciles": customer_lorenz_deciles,
    "customer_spend_exact_percentiles": customer_spend_exact_percentiles,
    "priority_ship_delay_percentiles": priority_ship_delay_percentiles,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_nation_revenue": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q10_returned_items": Q10_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_discounted_revenue": Q19_SQL,
    "q22_sales_opportunity": Q22_SQL,
    "profile_lineitem": PROFILE_LINEITEM_SQL,
    "filter_project_pushdown": FILTER_PROJECT_SQL,
    "distinct_count_customers": DISTINCT_COUNT_SQL,
    "group_count_orderstatus": GROUP_COUNT_SQL,
    "topk_orders_per_customer": TOPK_SQL,
    "multikey_sort_parts": MULTIKEY_SORT_SQL,
    "cross_pairs_nations": CROSS_PAIRS_SQL,
    "semi_join_customers_with_orders": SEMI_JOIN_SQL,
    "anti_join_customers_without_orders": ANTI_JOIN_SQL,
    "agg_stats_lineitem": AGG_STATS_SQL,
    "window_running_total": WINDOW_RUNNING_SQL,
    "rollup_region_nation": ROLLUP_SQL,
    "case_bucket_orders": CASE_BUCKET_SQL,
    "string_funcs_customers": STRING_FUNCS_SQL,
    "orders_above_customer_avg": ORDERS_ABOVE_AVG_SQL,
    "orders_monthly_revenue": ORDERS_MONTHLY_SQL,
    "ship_delay_stats": SHIP_DELAY_SQL,
    "supplier_part_sets": SUPPLIER_PARTS_SQL,
    "cube_status_priority": CUBE_SQL,
    "null_handling_discounts": NULL_HANDLING_SQL,
    "parts_abc_analysis": PARTS_ABC_SQL,
    "skew_salted_status_counts": SKEW_SALTED_SQL,
    "parts_skyline": PARTS_SKYLINE_SQL,
    "orders_bloom_prefilter": ORDERS_BLOOM_SQL,
    "customer_rfm_segments": CUSTOMER_RFM_SQL,
    "parts_basket_rules": PARTS_BASKET_SQL,
    "supplier_concentration_hhi": SUPPLIER_HHI_SQL,
    "customer_spend_gini": CUSTOMER_GINI_SQL,
    "customer_lorenz_deciles": CUSTOMER_LORENZ_SQL,
    "customer_spend_exact_percentiles": CUSTOMER_PCTL_SQL,
    "priority_ship_delay_percentiles": PRIORITY_DELAY_PCTL_SQL,
}
