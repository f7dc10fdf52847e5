"""Distributed Count-Min sketch (point-frequency estimation).

Complements the Misra-Gries sketch (operators/sketch.py): MG answers
"which items are frequent" (heavy hitters, lower-bound counts); CMS
answers "how often does THIS item occur" for any item, including ones
no summary kept — overestimating, never underestimating. Together they
are the two classic mergeable frequency sketches a 100 TB profiling
pass wants: constant memory per partition, merge = integer matrix sum.

Structure: a d x w counter matrix. Each occurrence of an item
increments one cell per row r: ``cell = H(r, item) mod w``. The
estimate for an item is the MIN over its d cells. Guarantees (standard
CMS, Cormode & Muthukrishnan): ``estimate >= true_count`` always
(deterministic, collisions only ADD); ``estimate <= true_count +
e/w * N`` with probability ``1 - e^-d`` per query.

Distribution: every partition fills its own d x w matrix in one pass
(mapInPandas, Arrow batches; the matrix lives across batches of the
same partition), emits it as <= d*w (r, c, weight) rows, and the
global sketch is a groupBy(r, c).sum over ``d*w*n_partitions`` rows —
independent of corpus size, exactly the MG merge shape. Cell addition
is commutative/associative, so the sketch is partition-invariant.

Hashing is md5-based (PYTHONHASHSEED-independent — repo design rule
F9, never Python ``hash()``), so sketches built on different workers,
sessions, or hosts merge correctly.

mapInPandas is the documented exception to the built-ins-first rule:
the per-partition matrix accumulation is stateful-imperative with no
Catalyst expression. (An explode-to-(r,c)-then-groupBy formulation
exists but ships d rows per OCCURRENCE through the shuffle — the
sketch's whole point is to ship d*w counters per partition instead.)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(row: int, item: str, width: int) -> int:
    """Deterministic, engine/session-independent cell index."""
    digest = hashlib.md5(f"{row}\x1f{item}".encode()).hexdigest()
    return int(digest[:15], 16) % width


def cms_summaries(df: DataFrame, col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Per-partition CMS matrices as (r, c, weight) rows (zero cells
    omitted), plus one (-1, -1, n_p) row per partition carrying the
    partition row count so callers can compute the eN/w error bound."""

    def _cms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cells: dict[tuple[int, int], int] = {}
        n_rows = 0
        for pdf in batches:
            # count per distinct item first: d hash computations per
            # DISTINCT item per batch, not per occurrence
            for item, cnt in pdf[col].dropna().value_counts().items():
                n_rows += int(cnt)
                for r in range(depth):
                    key = (r, _cell(r, str(item), width))
                    cells[key] = cells.get(key, 0) + int(cnt)
        out = pd.DataFrame(
            {
                "r": [k[0] for k in cells] + [-1],
                "c": [k[1] for k in cells] + [-1],
                "weight": list(cells.values()) + [n_rows],
            }
        )
        yield out

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _cms, schema="r int, c int, weight long"
    )


def cms_sketch(df: DataFrame, col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """The merged global sketch: (r, c, weight) with r = -1 row holding
    the total count N. At most ``depth * width + 1`` rows."""
    return (
        cms_summaries(df, col, depth, width)
        .groupBy("r", "c")
        .agg(F.sum("weight").alias("weight"))
    )


def cms_estimate(
    sketch: DataFrame, items: list[str], depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point estimates for ``items`` from a merged sketch: (item,
    est_count, n_total). est_count >= true count, always; the expected
    overcount is N/width per row, and min-of-d rows tightens it.

    The probe set is a tiny literal relation broadcast against the
    sketch (itself <= d*w rows) — no corpus access at query time; this
    is what makes the sketch a reusable profiling artifact."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame(
        [(item, r, _cell(r, item, width)) for item in items for r in range(depth)],
        schema="item string, r int, c int",
    )
    totals = sketch.filter(F.col("r") == -1).select(
        F.col("weight").alias("n_total")
    )
    # an item absent from a row's cell has weight 0 for that row; a
    # left join from probes keeps it (min over rows then sees the 0)
    full = (
        probes.join(sketch, ["r", "c"], "left")
        .select("item", F.coalesce("weight", F.lit(0)).alias("w"))
        .groupBy("item")
        .agg(F.min("w").alias("est_count"))
    )
    return (
        full.crossJoin(F.broadcast(totals))
        .select("item", "est_count", "n_total")
        .orderBy(F.desc("est_count"), F.asc("item"))
    )
