"""Distributed Misra–Gries heavy-hitters sketch.

The exact way to find frequent tokens is ``groupBy(token).count()`` —
one full shuffle of every occurrence, with a Zipf-headed key space. At
100 TB that shuffle dominates the job even though only the head of the
distribution is wanted. Misra–Gries summarizes each PARTITION into at
most ``k`` (item, weight) pairs in one pass and constant memory; the
tiny summaries then merge with an ordinary groupBy-sum whose input is
``k × n_partitions`` rows — independent of corpus size.

Guarantees (standard MG algebra, mergeable summaries):
- each partition summary undercounts any item by at most
  ``n_p / (k+1)`` (n_p = rows in that partition), so after summing,
  ``true_count − n/(k+1) ≤ estimate ≤ true_count``;
- every item with true frequency > ``n/(k+1)`` is present in the
  merged summary.

So callers pick ``k ≈ (1/support) − 1`` for a support threshold and
post-filter with the error bound. Deterministic: counts depend only on
partition contents, and the decrement step removes no surviving item's
lower-bound validity; the final merge is integer addition (order-free).

The per-partition pass is ``mapInPandas`` (Arrow batches; the dict
lives across batches of the same partition) — this is the documented
exception to the built-ins-first rule: MG's decrement step is
inherently stateful-imperative and has no Catalyst expression."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra–Gries summaries: ≤ k (item, weight) rows per
    partition plus one (NULL, n_p) row carrying the partition's row
    count so callers can compute the global error bound."""

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            for item in pdf[col].dropna():
                n_rows += 1
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        out = pd.DataFrame(
            {"item": list(counters.keys()), "weight": list(counters.values())}
        )
        tally = pd.DataFrame({"item": [None], "weight": [n_rows]})
        yield pd.concat([out, tally], ignore_index=True)

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _mg, schema="item string, weight long"
    )


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Merged heavy-hitters estimate: (item, est_count, n_total,
    max_undercount) for every item surviving any partition summary.
    ``est_count`` is a lower bound; the true count is at most
    ``est_count + max_undercount`` where max_undercount = n/(k+1).
    Every item with true count > max_undercount is guaranteed present.
    """
    # cache(): the summaries are referenced twice below (items filter +
    # totals filter) and Spark would otherwise execute the mapInPandas
    # MG pass — and the full input scan under it — once per reference,
    # defeating the one-pass design. The cached relation is tiny:
    # ≤ (k+1) × n_partitions rows.
    sums = mg_summaries(df, col, k).cache()
    items = (
        sums.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("weight").alias("est_count"))
    )
    totals = sums.filter(F.col("item").isNull()).agg(
        F.sum("weight").alias("n_total")
    )
    return (
        items.crossJoin(F.broadcast(totals))
        .select(
            "item",
            "est_count",
            "n_total",
            F.floor(F.col("n_total") / (k + 1)).cast("long").alias("max_undercount"),
        )
        .orderBy(F.desc("est_count"), F.asc("item"))
    )
