"""Salted join / aggregation must equal their unsalted twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from molgraphdb_spark.operators.skew import salted_groupby_count, salted_join
from molgraphdb_spark.sources.tables import load_table


def test_salted_join_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    salted = salted_join(li, sup, "l_suppkey", n_salts=4)
    plain = li.join(sup, "l_suppkey")
    assert salted.count() == plain.count()
    a = sorted(map(tuple, salted.select("l_orderkey", "l_suppkey", "s_name").collect()))
    b = sorted(map(tuple, plain.select("l_orderkey", "l_suppkey", "s_name").collect()))
    assert a == b


def test_salted_groupby_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = {r.l_returnflag: r.n for r in salted_groupby_count(li, "l_returnflag").collect()}
    plain = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert salted == plain
def test_quadratic_guard_refuses_large_input(tmp_path, monkeypatch, sf_dir):
    # The guard reads parquet FOOTER metadata (no Spark job, no Spark
    # session needed at all) — construction of the quadratic baseline
    # stays lazy like every other query.
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from molgraphdb_spark.queries import similarity as sim

    pq.write_table(
        pa.table({"vec_id": list(range(20))}),
        str(tmp_path / "embeddings.parquet"),
    )
    sim._guard_quadratic(str(tmp_path), "test")  # 20 <= default cap
    monkeypatch.setattr(sim, "MAX_EXACT_PAIRS_INPUT", 10)
    with pytest.raises(ValueError, match="exact-quadratic baseline refused"):
        sim._guard_quadratic(str(tmp_path), "test")
    # real testdata passes under the default cap
    monkeypatch.undo()
    sim._guard_quadratic(sf_dir, "test")
