"""As-of and interval (range) joins — temporal operators the reference
lacks entirely (SURVEY.md §2.3 "Absent: sort-merge, range/as-of/interval
... joins"; they enter via the `events` extension surface).

Both are implemented as compositions of built-in DataFrame ops — no
Python UDF, no cross join, no per-row range probe:

- ``asof_join``: the union-then-window formulation. Tag both inputs,
  union them, sort within each key partition by (ts, side, tiebreak),
  and carry the most recent right-side payload forward with
  ``last(..., ignoreNulls=True)``. ONE shuffle on the join key, one
  sort — exactly the cost profile of a dedicated merge-as-of operator
  (kdb aj / pandas merge_asof / DuckDB ASOF JOIN), but expressed so
  Catalyst plans it. No range explosion: each left row costs O(1)
  state regardless of how many right rows precede it.

- ``interval_point_join``: equi-join on (key, time-bucket) after
  exploding each interval to the buckets it overlaps. The theta
  predicate (start <= ts < end) is applied AFTER the equi-join, so the
  join itself is a plain hash join that scales: candidate pairs are
  bounded by bucket co-occupancy, never |points| x |intervals|. Bucket
  width trades replication (intervals spanning many buckets) against
  selectivity; for intervals of bounded duration d, width ~ d caps
  replication at 2x.

At 100 TB: both shapes shuffle each side exactly once on the join key
(plus bucket). Skewed keys fall under AQE skew-join splitting; the
window in ``asof_join`` is per-key and streaming (running ``last``),
so no per-key state blowup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
    allow_exact: bool = True,
    tolerance_micros: int | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the most recent
    right row with the same key and ``right_ts <= left_ts`` (strict
    ``<`` when ``allow_exact=False``).

    Ties among right rows at the same timestamp resolve to the largest
    ``tiebreak`` value (deterministic; required when right timestamps
    can collide). Right payload columns come back suffixed, plus
    ``asof_ts{suffix}`` = the matched right timestamp; all are NULL
    when no right row precedes the left row.

    ``tolerance_micros`` bounds staleness (pandas ``merge_asof``
    tolerance): a match older than ``left_ts − tolerance`` is treated
    as no-match (NULL payload). Applied as a post-predicate on the
    matched struct — the window pass is unchanged, so the plan shape
    (one shuffle per side) is identical with or without it.
    """
    keys = list(on)
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)

    pay = F.struct(
        F.col(right_ts).alias("asof_ts"), *[F.col(c) for c in rcols]
    )
    # One joined field list (asof_ts included) so an empty rcols can't
    # produce a trailing comma in the cast type string.
    pay_fields = [f"asof_ts:{rtypes[right_ts]}"] + [f"{c}:{rtypes[c]}" for c in rcols]
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c) for c in lcols],
        F.lit(None)
        .cast(f"struct<{','.join(pay_fields)}>")
        .alias("_rpay"),
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("_tb"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        pay.alias("_rpay"),
    )
    # Ordering at equal timestamps: with allow_exact the right row must
    # sort BEFORE the left row that may match it (side 1 first), else
    # after. Among equal-ts right rows, ascending tiebreak + running
    # last() == "largest tiebreak wins".
    side_order = F.desc("_side") if allow_exact else F.asc("_side")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc("_ats"), side_order, F.asc_nulls_last("_tb"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l2.unionByName(r2).withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
    if tolerance_micros is not None:
        fresh = F.unix_micros(F.col("_match.asof_ts")) >= (
            F.unix_micros(F.col("_ats")) - F.lit(int(tolerance_micros))
        )
        filled = filled.withColumn("_match", F.when(fresh, F.col("_match")))
    out = filled.filter(F.col("_side") == 0).select(
        *keys,
        F.col("_ats").alias(left_ts),
        *[F.col(c) for c in lcols],
        F.col("_match.asof_ts").alias(f"asof_ts{suffix}"),
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
    return out


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    on: Sequence[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_micros: int = 300 * 1_000_000,
    how: str = "inner",
) -> DataFrame:
    """Join points into half-open intervals ``[start, end)`` sharing
    the key columns, via time-bucket equi-join (see module docstring).

    ``start_col``/``end_col``/``point_ts`` must be TIMESTAMP columns.
    Returns interval columns + matched point columns (NULL-padded when
    ``how='left'`` and an interval has no points).
    """
    keys = list(on)
    b_int = F.explode(
        F.sequence(
            F.floor(F.unix_micros(F.col(start_col)) / bucket_micros),
            # end is exclusive: a point at exactly `end` never matches,
            # so the last bucket that can contain a match is (end-1)//w.
            F.floor((F.unix_micros(F.col(end_col)) - 1) / bucket_micros),
        )
    ).alias("_bucket")
    # Surrogate row id BEFORE exploding: the left-join empty-interval
    # recovery groups on it, so duplicate interval rows keep their
    # multiplicity and non-groupable column types (map, ...) never
    # enter a groupBy key.
    iv_src = intervals.withColumn("_iid", F.monotonically_increasing_id())
    iv = iv_src.select("*", b_int)
    pt_cols = [c for c in points.columns if c not in keys]
    pt = points.select(
        *keys,
        F.floor(F.unix_micros(F.col(point_ts)) / bucket_micros).alias("_bucket"),
        *[F.col(c) for c in pt_cols],
    )
    in_range = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    if how == "inner":
        return iv.join(pt, keys + ["_bucket"]).filter(in_range).drop("_bucket", "_iid")
    if how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    # Left join keeps empty intervals: group the exploded copies back to
    # one row per SOURCE interval on the surrogate id, keep those with
    # no in-range match, and null-pad the point columns.
    joined = iv.join(pt, keys + ["_bucket"], "left").withColumn(
        "_ok", F.coalesce(in_range, F.lit(False))
    )
    matched = joined.filter(F.col("_ok")).drop("_bucket", "_ok", "_iid")
    empty = (
        joined.groupBy("_iid")
        .agg(
            F.max(F.col("_ok").cast("int")).alias("_any"),
            *[F.first(c).alias(c) for c in intervals.columns],
        )
        .filter(F.col("_any") == 0)
        .select(
            *intervals.columns,
            *[F.lit(None).cast(dict(points.dtypes)[c]).alias(c) for c in pt_cols],
        )
    )
    return matched.unionByName(empty)
