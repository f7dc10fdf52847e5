"""Lloyd's k-means operator: invariant tests (exact centroid bits are
partition-order dependent — see operators/kmeans.py docstring — so we
assert convergence behavior, not float values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from molgraphdb_spark.operators.kmeans import assign_cells, kmeans_fit, kmeans_wcss


def _emb(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select("vec_id", F.col("embedding").alias("v"))


def test_kmeans_partitions_all_points(spark, sf_dir):
    df = _emb(spark, sf_dir)
    cents = kmeans_fit(df, "v", "vec_id", k=4, n_iter=3)
    assert [c for c, _ in cents] == [0, 1, 2, 3]
    assigned = assign_cells(df, "v", cents)
    assert assigned.count() == df.count()
    assert assigned.filter(~F.col("cid").isin(0, 1, 2, 3)).count() == 0
    # every cell non-empty on this data
    assert assigned.select("cid").distinct().count() == 4


def test_kmeans_wcss_monotone_nonincreasing(spark, sf_dir):
    df = _emb(spark, sf_dir)
    prev = None
    for it in (0, 1, 3, 5):
        cents = kmeans_fit(df, "v", "vec_id", k=4, n_iter=it)
        w = kmeans_wcss(df, "v", cents)
        if prev is not None:
            assert w <= prev * (1 + 1e-9), (it, w, prev)
        prev = w


def test_kmeans_trained_beats_naive_init_for_ivf(spark, sf_dir):
    # The point of training: trained centroids give lower WCSS than the
    # deterministic first-k init the oracle-checked IVF queries use.
    df = _emb(spark, sf_dir)
    naive = kmeans_fit(df, "v", "vec_id", k=4, n_iter=0)
    trained = kmeans_fit(df, "v", "vec_id", k=4, n_iter=5)
    assert kmeans_wcss(df, "v", trained) < kmeans_wcss(df, "v", naive)


def test_assignment_is_map_only(spark, sf_dir):
    # no Exchange in the assignment plan — the argmin fold is map-only
    df = _emb(spark, sf_dir)
    cents = kmeans_fit(df, "v", "vec_id", k=2, n_iter=1)
    plan = assign_cells(df, "v", cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_centroid_literal_roundtrips_exact_bits(spark):
    # _centroid_literal builds ONE SQL string parsed JVM-side (plan-build
    # perf: per-node py4j construction cost dominated the PQ queries).
    # repr(float) is the shortest round-trip decimal and Spark's parser
    # recovers the exact bits; non-finite components need the CAST form
    # (bare 'nan'/'inf' are not SQL double literals).
    import math

    from molgraphdb_spark.operators.kmeans import _centroid_literal

    vals = [0.1234567890123456789, -1e-305, 3.0000000000000004, 1e308]
    col = _centroid_literal(
        [(0, vals), (1, [float("nan"), float("inf"), float("-inf"), 0.0])]
    )
    got = spark.range(1).select(col.alias("c")).first().c
    assert got[0].cv == vals  # exact bit round-trip
    assert math.isnan(got[1].cv[0])
    assert got[1].cv[1] == float("inf") and got[1].cv[2] == float("-inf")


def test_assign_cells_ubp_tie_to_lowest_cid(spark):
    from molgraphdb_spark.operators.kmeans import assign_cells_ubp

    df = spark.createDataFrame([(0, [1.0, 0.0])], "id long, v array<double>")
    # two centroids exactly equidistant from v → lowest cid wins
    cents = [(7, [0.0, 0.0]), (3, [2.0, 0.0]), (9, [10.0, 10.0])]
    row = assign_cells_ubp(df, "v", cents).first()
    assert row.cid == 3 and row.d2_upm == 1_000_000
