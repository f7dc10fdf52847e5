"""Sinks (SURVEY.md §2.1 S5/S6/S7): idempotent append, upsert-by-key,
and bucketed table layout.

The reference's write path is INSERT OR IGNORE under a UNIQUE
constraint (/root/reference/main.py:151,203) and a row-at-a-time
upsert (mcs.py:101–144). Spark tables have no unique constraints
(SURVEY.md §4), so both become join/aggregation reformulations with
single-writer discipline; Delta MERGE is the multi-writer form — the
same shapes, transactional.

Scale notes (100 TB):
- append_new_keys: the anti-join touches only the target's key
  columns (column-pruned scan), and the append writes only the delta —
  never rewrite the table (the reference re-serializes its whole cache
  per flush, main.py:230–232; explicitly NOT reproduced, SURVEY.md
  §1.3).
- bucketed layout: writing fact tables bucketed+sorted by join key
  makes key-equi-joins shuffle-free (SortMergeJoin with no Exchange) —
  Spark's answer to the reference's secondary indexes (main.py:156–161
  → SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def append_new_keys(spark: SparkSession, path: str, new: DataFrame, keys: list[str]) -> int:
    """Idempotent keyed append to a parquet dataset: rows whose key
    already exists are ignored (INSERT OR IGNORE semantics). Returns
    the number of rows appended. Single-writer discipline assumed."""
    deduped = new.dropDuplicates(keys)
    if os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        existing_keys = spark.read.parquet(path).select(*keys)
        delta = deduped.join(existing_keys, keys, "left_anti")
    else:
        delta = deduped
    delta = delta.localCheckpoint()  # freeze before writing to the same path
    n = delta.count()
    if n:
        delta.write.mode("append").parquet(path)
    return n


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, n_buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted managed table: joins/aggregations
    on ``bucket_col`` between tables bucketed the same way need no
    shuffle (test_sinks.py asserts the Exchange-free plan)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
