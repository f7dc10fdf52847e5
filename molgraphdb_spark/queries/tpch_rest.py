"""TPC-H completion: the 11 queries (q2 q4 q8 q9 q11 q12 q15 q16 q17
q20 q21) that close the relational matrix to 22/22, adapted to the
driver's reduced schema (SURVEY.md §2.2–§2.4 join/subquery shapes;
r4 verdict stretch item 7).

The testdata has no ``partsupp`` table and lineitem carries no
shipmode/commitdate/receiptdate, so each query keeps the ORIGINAL's
structural shape (the part the optimizer and the 100 TB plan care
about) while substituting available columns:

- partsupp               → per-(part, supplier) aggregate of lineitem
  (min observed unit price stands in for ps_supplycost; shipped
  quantity for ps_availqty).
- l_commitdate lateness  → ``l_shipdate > o_orderdate + N days``.
- l_shipmode             → ship-delay bucket (≤30 d 'FAST' else 'SLOW').

Scale notes: every dim (region/nation/supplier/part and all derived
1-row scalars) is broadcast — the lineitem/orders fact side never
shuffles for those joins; fact-fact joins (lineitem⋈orders) shuffle
once on orderkey. Correlated scalar subqueries (q17's per-part avg,
q15's max revenue, q11's total threshold) are expressed as
aggregate-then-broadcast-join, the standard decorrelation Spark's
optimizer would also pick — never a per-row subquery.

Float policy: double SUMs are rounded to 2 decimals on BOTH engines
before any comparison/threshold (addition order differs between
engines; see relational.py header). Equality joins on raw doubles
appear only where the value is a single IEEE division result (q2's
unit cost), which is bit-identical on both engines — never on an
accumulated sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from molgraphdb_spark.session import tune
from molgraphdb_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier. partsupp proxy: min observed unit price
# per (part, supplier) from lineitem. Shape preserved: region-filtered
# supplier dim ⋈ cost relation, correlated min-per-part (decorrelated
# to groupBy + equijoin on the exact double — a single division, not a
# sum, so bit-identical across engines).
# --------------------------------------------------------------------------
Q2_REGION = "EUROPE"
Q2_SIZES = (5, 15, 25, 35, 45)
Q2_TYPE = "LARGE"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    eu_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == Q2_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    eu_supp = supp.join(
        F.broadcast(eu_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")

    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    tgt = part.filter(F.col("p_size").isin(*Q2_SIZES) & (F.col("p_type") == Q2_TYPE)).select(
        "p_partkey", "p_name"
    )
    # cache(): offers is referenced twice below (min-per-part groupBy +
    # the equality join back) with different projections — without it
    # the lineitem aggregation under ps executes twice (Spark reuses no
    # exchanges across differently-projected references; see dedup.py).
    # The cached relation is small: target-parts × EU-suppliers offers.
    offers = ps.join(F.broadcast(tgt), F.col("l_partkey") == F.col("p_partkey")).join(
        F.broadcast(eu_supp), F.col("l_suppkey") == F.col("s_suppkey")
    ).cache()
    min_cost = offers.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        offers.join(
            F.broadcast(min_cost),
            (F.col("l_partkey") == F.col("mk")) & (F.col("unit_cost") == F.col("min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
), ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
), offers AS (
  SELECT ps.*, p_name, s_name, s_acctbal, n_name
  FROM ps JOIN part ON l_partkey = p_partkey
          JOIN eu_supp ON l_suppkey = s_suppkey
  WHERE p_size IN {Q2_SIZES} AND p_type = '{Q2_TYPE}'
)
SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
       l_partkey AS p_partkey, p_name, ROUND(unit_cost, 4) AS unit_cost
FROM offers o
WHERE unit_cost = (SELECT MIN(unit_cost) FROM offers i WHERE i.l_partkey = o.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --------------------------------------------------------------------------
# Q4: order priority checking. EXISTS(lineitem late) → left-semi join;
# lateness adapted to shipdate > orderdate + 60 days (no commitdate).
# Scale: the semi join shuffles both sides on orderkey once; the count
# is a 5-group agg.
# --------------------------------------------------------------------------
Q4_START, Q4_END = "1996-07-01", "1996-10-01"


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(Q4_START).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(Q4_END).cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{Q4_START}' AND o_orderdate < TIMESTAMP '{Q4_END}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Q8: national market share — the deepest dim tree in TPC-H (8 tables
# here: lineitem ⋈ orders fact-fact, everything else broadcast).
# Share of one supplier nation in a customer region's volume per year.
# Both engines divide identically-rounded sums, so the quotient is
# deterministic.
# --------------------------------------------------------------------------
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_6"  # a nation inside AMERICA (regionkey 1)
Q8_TYPE = "ECONOMY"


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    part = _t(spark, sf_dir, "part")

    cust_in_region = cust.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == Q8_REGION)),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey")
        ),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nation = supp.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")

    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(F.broadcast(part.filter(F.col("p_type") == Q8_TYPE).select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.round(F.sum(F.when(F.col("supp_nation") == Q8_NATION, F.col("volume")).otherwise(0.0)), 2).alias("nation_volume"),
            F.round(F.sum("volume"), 2).alias("total_volume"),
        )
        .select(
            "o_year",
            "nation_volume",
            "total_volume",
            F.round(F.col("nation_volume") / F.col("total_volume"), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = '{Q8_TYPE}'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    AND o_custkey IN (SELECT c_custkey FROM customer
                      JOIN nation cn ON c_nationkey = cn.n_nationkey
                      JOIN region ON cn.n_regionkey = r_regionkey
                      WHERE r_name = '{Q8_REGION}')
)
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume ELSE 0 END), 2) AS nation_volume,
       ROUND(SUM(volume), 2) AS total_volume,
       ROUND(ROUND(SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN volume ELSE 0 END), 2)
             / ROUND(SUM(volume), 2), 6) AS mkt_share
FROM base
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year. supplycost proxy: 50% of
# p_retailprice. Part filter on a name substring, as in the original.
# --------------------------------------------------------------------------
Q9_NAME_LIKE = "red"


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part")

    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").startswith(Q9_NAME_LIKE)).select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - 0.5 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '{Q9_NAME_LIKE}%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
ORDER BY nation, o_year DESC
"""


# --------------------------------------------------------------------------
# Q11: important stock identification. partsupp value proxy: revenue
# per part from suppliers in one region; HAVING value > fraction ×
# total (scalar subquery → 1-row broadcast cross join).
# --------------------------------------------------------------------------
Q11_REGION = "ASIA"
Q11_FRACTION = 0.001


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    asia_supp = supp.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == Q11_REGION)),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    # cache(): per_part feeds both the total (scalar subquery) and the
    # threshold filter — uncached, the semi-join + aggregation over
    # lineitem would execute twice.
    per_part = (
        li.join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("part_value"))
    ).cache()
    total = per_part.agg(F.round(F.sum("part_value"), 2).alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * Q11_FRACTION)
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
        .orderBy(F.desc("part_value"), "p_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS part_value
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = '{Q11_REGION}')
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, part_value
FROM per_part
WHERE part_value > (SELECT ROUND(SUM(part_value), 2) FROM per_part) * {Q11_FRACTION}
ORDER BY part_value DESC, p_partkey
"""


# --------------------------------------------------------------------------
# Q12: shipping-mode priority. shipmode proxy: delay bucket (≤30 days
# 'FAST' else 'SLOW'). Fact-fact join on orderkey; conditional counts.
# --------------------------------------------------------------------------
Q12_YEAR = 1997


def q12_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.year("l_shipdate") == Q12_YEAR)
        .select(
            F.when(F.datediff("l_shipdate", "o_orderdate") <= 30, "FAST").otherwise("SLOW").alias("ship_mode"),
            hi.cast("long").alias("is_high"),
        )
        .groupBy("ship_mode")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(F.lit(1) - F.col("is_high")).alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


Q12_SQL = f"""
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
            THEN 'FAST' ELSE 'SLOW' END AS ship_mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE year(l_shipdate) = {Q12_YEAR}
GROUP BY 1
ORDER BY ship_mode
"""


# --------------------------------------------------------------------------
# Q15: top supplier (the original defines a revenue VIEW, then selects
# the supplier(s) hitting its MAX — a scalar subquery over an
# aggregate). Revenue rounded to 2 on both engines BEFORE the max/
# equality so double-sum association order cannot split the winner.
# --------------------------------------------------------------------------
Q15_START, Q15_END = "1996-01-01", "1996-04-01"


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    # cache(): the revenue view is referenced by both the MAX scalar
    # and the equality filter — one materialization instead of two
    # lineitem aggregations.
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q15_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_END).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    ).cache()
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_START}' AND l_shipdate < TIMESTAMP '{Q15_END}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q16: parts/supplier relationship. Distinct-supplier counts per part
# attribute triple from the lineitem-derived relation, with the
# original's brand/type exclusion filters.
# --------------------------------------------------------------------------
Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    tgt = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(tgt), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN {Q16_SIZES}
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue. The original's correlated per-part
# AVG subquery, decorrelated to a broadcast aggregate join (the avg is
# over ALL lineitems of the part, the outer filter over one brand).
# --------------------------------------------------------------------------
Q17_BRAND = "Brand#1"


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_brand") == Q17_BRAND).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(per_part_avg), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = f"""
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < 0.2 * (SELECT AVG(l_quantity) FROM lineitem i
                          WHERE i.l_partkey = lineitem.l_partkey)
"""


# --------------------------------------------------------------------------
# Q20: potential part promotion. availqty proxy: total shipped quantity
# per (supplier, part) of the name-filtered parts in one year; the
# supplier qualifies if any such stock exceeds the threshold. Nested
# semi-join chain, region-filtered supplier dim.
# --------------------------------------------------------------------------
Q20_NAME_LIKE = "red"
Q20_REGION = "AFRICA"
Q20_YEAR = 1997
Q20_MIN_QTY = 30


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    stock = (
        li.filter(F.year("l_shipdate") == Q20_YEAR)
        .join(
            F.broadcast(part.filter(F.col("p_name").startswith(Q20_NAME_LIKE)).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("shipped_qty"))
        .filter(F.col("shipped_qty") > Q20_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    afr_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == Q20_REGION)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    return (
        supp.join(F.broadcast(afr_nations), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(stock, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = '{Q20_REGION}')
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '{Q20_NAME_LIKE}%' AND year(l_shipdate) = {Q20_YEAR}
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(l_quantity) > {Q20_MIN_QTY})
ORDER BY s_suppkey
"""


# --------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting — the hardest subquery shape
# in TPC-H: correlated EXISTS (another supplier on the order) AND
# NOT EXISTS (another supplier ALSO late). Lateness adapted to
# shipdate > orderdate + 90 days. Spark: one distinct (order, supp)
# relation reused for the semi (other-supplier) and anti (other-late-
# supplier) joins — both shuffle on orderkey, the same key as the base
# join, so AQE coalesces into one exchange layout.
# --------------------------------------------------------------------------
Q21_REGION = "ASIA"
Q21_LATE_DAYS = 90


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    asia_supp = supp.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == Q21_REGION)),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ).select("n_nationkey")
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")

    # ONE pass over the fact-fact join: collapse to distinct
    # (order, supplier) pairs carrying a was-ever-late flag, cached —
    # deriving `late` and `all_pairs` as separate distincts would
    # execute the lineitem⋈orders join twice.
    lo = li.join(
        orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    pairs_flagged = (
        lo.select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
            ).cast("int").alias("is_late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("is_late").alias("is_late"))
    ).cache()
    late = pairs_flagged.filter(F.col("is_late") == 1).select("l_orderkey", "l_suppkey")
    all_pairs = pairs_flagged.select("l_orderkey", "l_suppkey")

    l1 = late.join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
    others = all_pairs.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    others_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    return (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey")) & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            others_late,
            (F.col("l_orderkey") == F.col("o3_orderkey")) & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), late AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
)
SELECT s_name, COUNT(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                      JOIN region ON n_regionkey = r_regionkey
                      WHERE r_name = '{Q21_REGION}')
  AND EXISTS (SELECT 1 FROM pairs p WHERE p.l_orderkey = l1.l_orderkey
              AND p.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_ship_priority": q12_ship_priority,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier_counts": q16_part_supplier_counts,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q4_order_priority": Q4_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q12_ship_priority": Q12_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_part_supplier_counts": Q16_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}
