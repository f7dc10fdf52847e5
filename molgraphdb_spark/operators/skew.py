"""Skew-mitigation operators (SURVEY.md 'Optimize for scale': salting
for skewed keys). AQE's skew-join splitting handles most cases at
runtime; explicit salting is the deterministic fallback when one key
dominates so heavily that even split partitions overwhelm an executor
(the classic null-key / hot-customer problem at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s hot keys would skew the shuffle:
    ``big`` rows get a random-but-deterministic salt (hash of the full
    row spread over ``n_salts``), ``small`` is replicated once per salt
    value, and the join runs on (key, salt) — every hot key now spreads
    over ``n_salts`` reducers. Result is identical to the unsalted
    join; cost is ``n_salts``× replication of the small side."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    return big_salted.join(small_rep, [key, "_salt"], how).drop("_salt")


def salted_groupby_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-phase aggregation for a skewed group key: count per
    (key, salt) first (spreads the hot key), then re-aggregate per key.
    Spark's partial aggregation usually makes this unnecessary for
    algebraic aggs — the pattern matters for holistic aggs
    (collect_list/percentile) where map-side combine can't help."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("n"))
