"""Parquet sources for the driver's TPC-H-ish star schema.

Replaces the reference's SQLite full-table scans (main.py:173–188,
S1 in SURVEY.md §2.1) with Parquet reads: columnar, splittable, with
predicate pushdown and column pruning supplied by Catalyst for free.

Scale notes (100 TB design):
- Reads stay lazy; no ``.cache()`` here — callers decide lifetime.
- Fact tables (lineitem/orders/events) would be written partitioned by
  a date column and sorted/bucketed on their join key on a real
  cluster; dims (region/nation/supplier/part/customer at low SF) are
  broadcast-join candidates and marked as such in query code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables small enough (at any SF — they scale sub-linearly or are fixed)
#: that the broadcast side of a join should always be them.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every driver table as a temp view so ad-hoc users work
    in plain ``spark.sql`` — the SQL-first entry point a user migrating
    from any SQL engine expects (``spark.sql("SELECT ... FROM
    lineitem ...")`` after one call). Views are lazy parquet scans;
    pushdown/pruning behave exactly as the DataFrame API. Returns the
    registered names."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLE_NAMES)
