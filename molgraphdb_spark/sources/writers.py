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

import fcntl
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def _pointer_path(root: str) -> str:
    return os.path.join(root, "_CURRENT")


def read_current(spark: SparkSession, root: str) -> DataFrame | None:
    """Read the current snapshot of a merge-managed dataset (None if
    no snapshot has been committed yet)."""
    ptr = _pointer_path(root)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(root, version))


def _merge_upsert_delta(
    spark: SparkSession, root: str, updates: DataFrame, keys: list[str]
) -> int:
    """Real ACID MERGE via delta-spark (r7 verdict item 7): on a
    cluster with the Delta Lake runtime, the same upsert-by-key shape
    rides DeltaTable.merge — multi-writer safe through the Delta
    transaction log instead of this module's single-host fcntl lock.
    Import-gated: this container has no delta-spark, so the path is
    exercised only for its graceful refusals (tests/test_sinks.py)."""
    # Refuse to bootstrap-write into a non-empty root that is not a
    # Delta table (no _delta_log): it would silently replace a prior
    # parquet snapshot store (the default merge_upsert path) with ONLY
    # the new updates — a format switch must be an explicit migration,
    # not a data loss (r8 ADVICE item, writers.py:95). Checked
    # structurally BEFORE the delta import so the guard is real (and
    # testable) even where delta-spark is absent.
    if (
        os.path.isdir(root)
        and os.listdir(root)
        and not os.path.isdir(os.path.join(root, "_delta_log"))
    ):
        raise RuntimeError(
            f"refusing Delta bootstrap into non-empty non-Delta root "
            f"{root!r}: it holds a prior (likely parquet-snapshot) "
            f"store; migrate explicitly with read_current() + an "
            f"initial Delta write to a fresh root"
        )
    try:
        from delta.tables import DeltaTable
    except ImportError as ex:
        raise RuntimeError(
            "format='delta' requires the delta-spark package "
            "(pip install delta-spark + Delta-enabled SparkSession); "
            "use the default format='parquet' snapshot MERGE here"
        ) from ex
    fresh = updates.dropDuplicates(keys)
    if DeltaTable.isDeltaTable(spark, root):
        target = DeltaTable.forPath(spark, root)
        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            target.alias("t")
            .merge(fresh.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
    else:
        fresh.write.format("delta").mode("overwrite").save(root)
    return spark.read.format("delta").load(root).count()


def merge_upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    keys: list[str],
    *,
    format: str = "parquet",
) -> int:
    """MERGE (upsert-by-key, S6 / SURVEY.md §1.3 multi-writer form):
    rows matching on ``keys`` are replaced by ``updates``, others kept —
    the reference's row-at-a-time upsert (mcs.py:101–144) as one
    anti-join + union, committed as a two-phase atomic snapshot swap:

    1. write the merged result to a fresh versioned directory;
    2. atomically repoint ``_CURRENT`` at it (``os.replace``).

    Readers (:func:`read_current`) always see a complete snapshot —
    never a half-written mix. Writers serialize on an fcntl file lock,
    so concurrent merges apply in some serial order with no lost
    updates. This is the single-host stand-in for Delta/Iceberg MERGE
    (same logical shape; a real cluster swaps this file pointer for a
    transaction log). Returns the merged snapshot's row count.

    ``format="delta"`` switches to a real Delta Lake MERGE when
    delta-spark is installed (raises a clear RuntimeError here, where
    it is not — the documented production swap).
    """
    if format == "delta":
        return _merge_upsert_delta(spark, root, updates, keys)
    if format != "parquet":
        raise ValueError(f"unknown merge format {format!r}")
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "_LOCK"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        current = read_current(spark, root)
        fresh = updates.dropDuplicates(keys)
        if current is not None:
            merged = fresh.unionByName(current.join(fresh, keys, "left_anti"))
        else:
            merged = fresh
        ptr = _pointer_path(root)
        if os.path.exists(ptr):
            with open(ptr) as f:
                version = int(f.read().strip().lstrip("v"))
        else:
            version = 0
        new_dir = f"v{version + 1:05d}"
        merged.write.mode("overwrite").parquet(os.path.join(root, new_dir))
        n = spark.read.parquet(os.path.join(root, new_dir)).count()
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(new_dir)
        os.replace(tmp, ptr)  # the atomic commit point
        return n


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Persist hive-partitioned parquet (S7 layout for time/tenant
    keys): queries filtering on ``partition_cols`` scan only matching
    directories — partition pruning, the directory-level complement of
    row-group predicate pushdown. The 100 TB events table would be
    partitioned by event date exactly like this (tests assert the
    pruned-scan plan)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def _dataset_bytes(path: str) -> int:
    """Recursive parquet byte count — hive-partitioned datasets keep
    their files in key=value subdirectories, so a top-level listdir
    sees nothing."""
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, f))
    return total


def _dataset_files(path: str) -> int:
    return sum(
        f.endswith(".parquet")
        for _d, _s, files in os.walk(path)
        for f in files
    )


def _partition_cols(path: str) -> list[str]:
    """Re-discover hive partition columns from the key=value directory
    chain (what Spark's partition discovery does on read)."""
    cols: list[str] = []
    p = path
    while True:
        subdirs = [
            d
            for d in os.listdir(p)
            if "=" in d and os.path.isdir(os.path.join(p, d))
        ]
        if not subdirs:
            return cols
        cols.append(subdirs[0].split("=", 1)[0])
        p = os.path.join(p, subdirs[0])


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ~``target_file_bytes`` files (the operational fix for the
    many-tiny-files problem that kills scan throughput and NameNode/
    listing latency at scale — streaming sinks and per-wave appends
    both produce it). Returns the output file count.

    Hive-partitioned datasets are handled: sizes are walked
    recursively, partition columns are re-discovered from the
    key=value directory chain, and the rewrite keeps ``partitionBy``
    (repartitioning ON the partition columns, so each task writes one
    file per directory it owns — the layout and its pruning survive).

    Commit is write-aside + directory swap behind the same fcntl lock
    discipline merge_upsert uses; stale ``._compact``/``._old`` debris
    from a crashed prior run is recovered or cleared first. POSIX has
    no atomic directory exchange, so there is a sub-millisecond window
    between the two renames when ``path`` is absent — single-writer,
    reader-tolerant datasets only. For zero-gap compaction use a
    merge_upsert-managed root and :func:`compact_current`, which
    commits through the ``_CURRENT`` pointer (one atomic
    ``os.replace``) and never unlinks a live snapshot."""
    import shutil

    tmp = path.rstrip("/") + "._compact"
    old = path.rstrip("/") + "._old"
    with open(path.rstrip("/") + "._lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        # crash recovery: a prior run that died between its two renames
        # left the data in ._old — restore it before anything else.
        if not os.path.isdir(path) and os.path.isdir(old):
            os.rename(old, path)
        for stale in (tmp, old):
            if os.path.isdir(stale):
                shutil.rmtree(stale)
        total = _dataset_bytes(path)
        n_files = max(1, -(-total // target_file_bytes))  # ceil
        part_cols = _partition_cols(path)
        df = spark.read.parquet(path)
        if part_cols:
            (
                df.repartition(n_files, *part_cols)
                .write.mode("overwrite")
                .partitionBy(*part_cols)
                .parquet(tmp)
            )
        else:
            df.repartition(n_files).write.mode("overwrite").parquet(tmp)
        os.rename(path, old)
        os.rename(tmp, path)  # ← the gap closes here
        shutil.rmtree(old)
        return _dataset_files(path)


def compact_current(
    spark: SparkSession, root: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Compact the current snapshot of a merge_upsert-managed root into
    a NEW versioned directory and atomically repoint ``_CURRENT`` — the
    zero-gap form of :func:`compact_parquet`: readers either see the
    old snapshot or the compacted one, never an absent or partial
    dataset. Returns the compacted snapshot's file count."""
    ptr = _pointer_path(root)
    with open(os.path.join(root, "_LOCK"), "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        with open(ptr) as f:
            version_dir = f.read().strip()
        src = os.path.join(root, version_dir)
        total = _dataset_bytes(src)
        n_files = max(1, -(-total // target_file_bytes))  # ceil
        new_dir = f"v{int(version_dir.lstrip('v')) + 1:05d}"
        spark.read.parquet(src).repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(root, new_dir)
        )
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(new_dir)
        os.replace(tmp, ptr)  # the atomic commit point
        return _dataset_files(os.path.join(root, new_dir))


def metadata_set(spark: SparkSession, root: str, key: str, value: str) -> None:
    """Keyed metadata store (S7 — the reference's ``metadata`` KV table,
    /root/reference/main.py:164–169: ``key TEXT PRIMARY KEY, value
    TEXT``). The PRIMARY-KEY upsert is merge_upsert on the key column —
    same snapshot-swap atomicity, trivially small data."""
    kv = spark.createDataFrame([(key, value)], "key string, value string")
    merge_upsert(spark, root, kv, ["key"])


def metadata_get(spark: SparkSession, root: str, key: str) -> str | None:
    """Point lookup in the metadata KV store (None when absent)."""
    current = read_current(spark, root)
    if current is None:
        return None
    row = current.filter(current.key == key).select("value").first()
    return None if row is None else row.value


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


def _zvalue(c1, c2, lo1, hi1, lo2, hi2, bits: int = 16):
    """Interleaved-bit Morton code of two numeric columns, each
    min-max normalized to ``bits`` bits. Pure integer expressions —
    whole-stage codegen, no UDF."""
    span1 = max(hi1 - lo1, 1)
    span2 = max(hi2 - lo2, 1)
    scale = (1 << bits) - 1
    n1 = F.floor((F.col(c1) - F.lit(lo1)) * F.lit(scale) / F.lit(span1)).cast("long")
    n2 = F.floor((F.col(c2) - F.lit(lo2)) * F.lit(scale) / F.lit(span2)).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(n1, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(n2, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame, path: str, col1: str, col2: str, n_files: int = 8
) -> None:
    """Z-order (Morton-curve) clustered parquet layout: rows are
    range-partitioned and sorted by the interleaved bit code of the two
    columns, so EVERY file covers a narrow range of BOTH — parquet
    footer min/max stats then prune files/row-groups for predicates on
    either column (hive partitioning can only do this for one key;
    Z-ordering is the standard multi-dimension layout for a 100 TB
    fact table queried by more than one selective column).

    One pass to compute the two global bounds (an agg, driver-sized),
    one range-shuffle on the code. The code column is dropped before
    writing — layout is a property of row order, not schema."""
    b = df.agg(
        F.min(col1), F.max(col1), F.min(col2), F.max(col2)
    ).first()
    if b[0] is None or b[2] is None:
        # empty frame or all-NULL cluster column: no bounds to
        # normalize against — there is no meaningful order; plain write
        df.write.mode("overwrite").parquet(path)
        return
    z = _zvalue(col1, col2, b[0], b[1], b[2], b[3])
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
