"""JVM-side construction of small literal DataFrames.

``spark.createDataFrame(local_rows)`` parallelizes a PICKLED Python
collection: every action on (or downstream of) that DataFrame runs an
extra Python-runner stage just to deserialize it — measured at ~2-4 s
per job in local mode, paid on EVERY reuse unless checkpointed. For
fixture/seed-sized data the fix is to inline the rows as a literal
array of structs over ``spark.range``: the source is then native JVM,
costs nothing per job, and participates in whole-stage codegen.

Use for seeds and fixtures (≲ a few hundred rows); beyond that the
literal expression tree itself gets expensive — write a parquet fixture
instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def literal_df(spark: SparkSession, rows: Sequence[tuple], cols: Sequence[str]) -> DataFrame:
    """Small literal DataFrame, built JVM-side (see module docstring).

    Types come from ``F.lit`` inference per cell (int→int/bigint,
    str→string, float→double); all rows must be type-consistent.
    """
    if not rows:
        raise ValueError("literal_df needs at least one row; use an explicit schema path")
    arr = F.array(
        *[
            F.struct(*[F.lit(v).alias(c) for v, c in zip(r, cols, strict=True)])
            for r in rows
        ]
    )
    return (
        spark.range(len(rows))
        .select(F.element_at(arr, (F.col("id") + 1).cast("int")).alias("_s"))
        .select("_s.*")
    )
