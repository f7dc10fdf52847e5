"""Set operations (SURVEY.md §2.7: U1–U4) as named queries with oracles.

Reference analogues: hash-set intersection/union for the Jaccard
numerator/denominator (mcs.py:310–311), frontier accumulate-with-dedup
(main.py:301), frontier-minus-visited except (main.py:296–299).
Spark's set operators shuffle on the full row; at scale prefer the
join forms (semi/anti) when only membership matters — both are shown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from molgraphdb_spark.session import tune
from molgraphdb_spark.sources.tables import load_table


def _nations_of(spark: SparkSession, sf_dir: str, table: str, key: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, table).select(F.col(key).alias("nationkey"))


def intersect_customer_supplier_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: nations that have both customers and suppliers."""
    c = _nations_of(spark, sf_dir, "customer", "c_nationkey")
    s = _nations_of(spark, sf_dir, "supplier", "s_nationkey")
    return c.intersect(s).orderBy("nationkey")


INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def union_all_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/U3: distinct union of customer and supplier nations."""
    c = _nations_of(spark, sf_dir, "customer", "c_nationkey")
    s = _nations_of(spark, sf_dir, "supplier", "s_nationkey")
    return c.union(s).distinct().orderBy("nationkey")


UNION_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def except_customer_only_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: nations with customers but no suppliers (frontier-minus-visited
    shape, main.py:296–299)."""
    c = _nations_of(spark, sf_dir, "customer", "c_nationkey")
    s = _nations_of(spark, sf_dir, "supplier", "s_nationkey")
    # subtract == EXCEPT DISTINCT (set semantics); exceptAll would keep
    # surviving multiplicities of the 1500-row left side.
    return c.subtract(s).orderBy("nationkey")


EXCEPT_SQL = """
SELECT DISTINCT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


QUERIES = {
    "setop_intersect_nations": intersect_customer_supplier_nations,
    "setop_union_nations": union_all_nation_keys,
    "setop_except_nations": except_customer_only_nations,
}

ORACLES = {
    "setop_intersect_nations": INTERSECT_SQL,
    "setop_union_nations": UNION_SQL,
    "setop_except_nations": EXCEPT_SQL,
}
