"""Sink semantics (S5/S6) + bucketed-layout plan tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from molgraphdb_spark.plans.explain import plan_summary
from molgraphdb_spark.sources.tables import load_table
from molgraphdb_spark.sources.writers import (
    append_new_keys,
    merge_upsert,
    read_current,
    write_bucketed,
)


def test_merge_upsert_semantics(spark, tmp_path):
    root = str(tmp_path / "merged")
    assert read_current(spark, root) is None
    v1 = spark.createDataFrame([("A", 1), ("B", 1)], ["k", "val"])
    assert merge_upsert(spark, root, v1, ["k"]) == 2
    # update one key, insert one
    v2 = spark.createDataFrame([("B", 2), ("C", 1)], ["k", "val"])
    assert merge_upsert(spark, root, v2, ["k"]) == 3
    rows = {r.k: r.val for r in read_current(spark, root).collect()}
    assert rows == {"A": 1, "B": 2, "C": 1}  # updates win, others kept


def test_merge_upsert_concurrent_writers(spark, tmp_path):
    # two writers merging concurrently serialize on the lock: both
    # batches land, per-key last-committed wins, reader never sees a
    # partial snapshot.
    import threading

    root = str(tmp_path / "cmerged")
    merge_upsert(spark, root, spark.createDataFrame([("A", 0)], ["k", "val"]), ["k"])

    def writer(tag: int):
        batch = spark.createDataFrame(
            [(f"W{tag}", tag), ("A", 100 + tag)], ["k", "val"]
        )
        merge_upsert(spark, root, batch, ["k"])

    ts = [threading.Thread(target=writer, args=(i,)) for i in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    rows = {r.k: r.val for r in read_current(spark, root).collect()}
    assert set(rows) == {"A", "W1", "W2"}  # no lost update
    assert rows["W1"] == 1 and rows["W2"] == 2
    assert rows["A"] in (101, 102)  # one of the concurrent updates won


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


def test_compact_parquet_merges_small_files(spark, tmp_path):
    import os

    from molgraphdb_spark.sources.writers import compact_parquet

    path = str(tmp_path / "shards")
    # 40 tiny files (the streaming-sink pathology)
    spark.range(4000).repartition(40).write.parquet(path)
    assert sum(f.endswith(".parquet") for f in os.listdir(path)) == 40
    before = {r.id for r in spark.read.parquet(path).collect()}
    n = compact_parquet(spark, path, target_file_bytes=10**9)
    assert n == 1
    assert sum(f.endswith(".parquet") for f in os.listdir(path)) == 1
    assert {r.id for r in spark.read.parquet(path).collect()} == before


def test_compact_parquet_preserves_partitions(spark, tmp_path):
    import os

    from molgraphdb_spark.sources.writers import compact_parquet, write_partitioned

    path = str(tmp_path / "parts")
    df = spark.createDataFrame(
        [(i, "AF"[i % 2]) for i in range(400)], ["k", "status"]
    ).repartition(20)
    write_partitioned(df, path, ["status"])
    before = {(r.k, r.status) for r in spark.read.parquet(path).collect()}
    n = compact_parquet(spark, path, target_file_bytes=10**9)
    # hive layout survives: key=value dirs still present, data intact
    subdirs = {d for d in os.listdir(path) if d.startswith("status=")}
    assert subdirs == {"status=A", "status=F"}
    assert {(r.k, r.status) for r in spark.read.parquet(path).collect()} == before
    assert n == 2  # one compacted file per partition directory
    plan = (
        spark.read.parquet(path)
        .filter(F.col("status") == "A")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan  # pruning still works post-compaction


def test_compact_parquet_recovers_stale_old(spark, tmp_path):
    import os

    from molgraphdb_spark.sources.writers import compact_parquet

    path = str(tmp_path / "crashed")
    spark.range(100).repartition(4).write.parquet(path)
    # simulate a prior run that died between its two renames: data
    # sits in ._old, the live path is gone
    os.rename(path, path + "._old")
    n = compact_parquet(spark, path, target_file_bytes=10**9)
    assert n == 1
    assert {r.id for r in spark.read.parquet(path).collect()} == set(range(100))
    assert not os.path.exists(path + "._old")


def test_compact_current_zero_gap(spark, tmp_path):
    import os

    from molgraphdb_spark.sources.writers import (
        compact_current,
        merge_upsert,
        read_current,
    )

    root = str(tmp_path / "managed")
    df = spark.range(500).withColumnRenamed("id", "k").repartition(16)
    merge_upsert(spark, root, df, ["k"])
    v1 = open(os.path.join(root, "_CURRENT")).read().strip()
    n = compact_current(spark, root, target_file_bytes=10**9)
    assert n == 1
    v2 = open(os.path.join(root, "_CURRENT")).read().strip()
    assert v2 != v1  # committed a NEW snapshot via the pointer
    assert os.path.isdir(os.path.join(root, v1))  # old snapshot not unlinked
    assert {r.k for r in read_current(spark, root).collect()} == set(range(500))


def test_metadata_kv_roundtrip(spark, tmp_path):
    from molgraphdb_spark.sources.writers import metadata_get, metadata_set

    root = str(tmp_path / "meta")
    assert metadata_get(spark, root, "schema_version") is None
    metadata_set(spark, root, "schema_version", "1")
    metadata_set(spark, root, "created_by", "molgraphdb_spark")
    assert metadata_get(spark, root, "schema_version") == "1"
    # PRIMARY KEY semantics: same key overwrites, no duplicate rows
    metadata_set(spark, root, "schema_version", "2")
    assert metadata_get(spark, root, "schema_version") == "2"
    assert metadata_get(spark, root, "created_by") == "molgraphdb_spark"


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from molgraphdb_spark.sources.writers import write_partitioned

    path = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_partitioned(orders, path, ["o_orderstatus"])
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the status predicate must land in PartitionFilters (directory
    # pruning), not PushedFilters/post-scan filter
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderstatus" in m.group(1), plan
    # and the data still round-trips
    expect = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expect


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


def test_zordered_write_narrows_both_columns(spark, sf_dir, tmp_path):
    """Z-order layout: every output file must cover a narrow range of
    BOTH cluster columns (footer min/max verified with pyarrow), so
    predicates on either column prune files — vs a naive write where
    the second column spans ~the full range in every file."""
    import glob
    import os

    import pyarrow.parquet as pq_

    from molgraphdb_spark.sources.writers import write_zordered

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    def avg_width(path, col):
        lo = hi = None
        widths, bounds = [], []
        for f in glob.glob(os.path.join(path, "part-*.parquet")):
            md = pq_.ParquetFile(f).metadata
            fmin = fmax = None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            bounds.append((fmin, fmax))
            lo = fmin if lo is None else min(lo, fmin)
            hi = fmax if hi is None else max(hi, fmax)
        span = max(hi - lo, 1)
        return sum((b - a) / span for a, b in bounds) / len(bounds)

    zpath = str(tmp_path / "z")
    write_zordered(orders, zpath, "o_custkey", "o_totalprice", n_files=8)
    # naive comparison layout: sorted by custkey only
    npath = str(tmp_path / "naive")
    orders.repartitionByRange(8, "o_custkey").write.parquet(npath)

    # both columns narrow under Z-order...
    zc, zp = avg_width(zpath, "o_custkey"), avg_width(zpath, "o_totalprice")
    assert zc < 0.6 and zp < 0.6, (zc, zp)
    # ...while the single-key layout leaves the second column unpruned
    nc, np_ = avg_width(npath, "o_custkey"), avg_width(npath, "o_totalprice")
    assert nc < 0.3 and np_ > 0.9, (nc, np_)
    # layout changes row order only — content identical
    assert spark.read.parquet(zpath).count() == orders.count()


def test_orc_interchange_roundtrip(spark, sf_dir, tmp_path):
    # ORC is the other columnar interchange format Spark ships a native
    # (vectorized, predicate-pushing) reader for — pin that our tables
    # survive a parquet -> ORC -> DataFrame roundtrip bit-for-bit
    import os

    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    p = str(tmp_path / "nation.orc")
    nation.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))
    # pushdown reaches the ORC scan too
    plan = back.filter(F.col("n_nationkey") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]" in plan


def test_register_views_sql_entry_point(spark, sf_dir):
    from molgraphdb_spark.sources.tables import register_views

    names = register_views(spark, sf_dir)
    assert "lineitem" in names
    row = spark.sql(
        "SELECT COUNT(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).first()
    assert row.n > 0
    # views are lazy scans: pushdown still reaches parquet
    plan = (
        spark.sql("SELECT l_orderkey FROM lineitem WHERE l_quantity = 1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_merge_upsert_delta_gate(spark, tmp_path):
    # format='delta' is the documented production swap (r7 verdict
    # item 7): without delta-spark it must refuse with a clear error,
    # never fall back silently; unknown formats are rejected too.
    import pytest

    from molgraphdb_spark.sources.writers import merge_upsert

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    try:
        import delta.tables  # noqa: F401

        has_delta = True
    except ImportError:
        has_delta = False
    if not has_delta:
        with pytest.raises(RuntimeError, match="delta-spark"):
            merge_upsert(spark, str(tmp_path / "d"), df, ["k"], format="delta")
    with pytest.raises(ValueError, match="unknown merge format"):
        merge_upsert(spark, str(tmp_path / "x"), df, ["k"], format="orc")


def test_merge_upsert_delta_refuses_nonempty_non_delta_root(spark, tmp_path):
    # r8 ADVICE (writers.py:95): a format switch on an existing
    # parquet-snapshot store must REFUSE, not silently overwrite the
    # merged history with only the new updates. The guard is a
    # structural _delta_log precheck, so it fires even where
    # delta-spark is absent (this container) — before the import gate.
    import pytest

    from molgraphdb_spark.sources.writers import merge_upsert, read_current

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    root = str(tmp_path / "store")
    assert merge_upsert(spark, root, df, ["k"]) == 1  # parquet snapshot
    with pytest.raises(RuntimeError, match="non-Delta root"):
        merge_upsert(spark, root, df, ["k"], format="delta")
    # prior store untouched by the refused call
    assert read_current(spark, root).count() == 1
