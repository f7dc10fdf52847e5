"""literal_df: JVM-side literal DataFrames (no Python pickle stage)."""

from __future__ import annotations

import pytest

from molgraphdb_spark.functions.literals import literal_df


def test_literal_df_roundtrip(spark):
    rows = [("a", 1, 1.5), ("b", 2, -0.25), ("c", 3, 0.0)]
    df = literal_df(spark, rows, ["s", "n", "x"])
    assert df.columns == ["s", "n", "x"]
    assert sorted((r.s, r.n, r.x) for r in df.collect()) == sorted(rows)


def test_literal_df_plan_has_no_python_stage(spark):
    df = literal_df(spark, [("a", 1)], ["s", "n"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan and "BatchEvalPython" not in plan


def test_literal_df_rejects_empty(spark):
    with pytest.raises(ValueError):
        literal_df(spark, [], ["s"])
