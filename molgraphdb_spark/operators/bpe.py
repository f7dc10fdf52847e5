"""Byte-pair-encoding tokenizer induction — the full merge LOOP.

``queries/text.py::vocab_bpe_merge_pairs`` computes merge step 1 (the
corpus-wide adjacent-pair histogram); a tokenizer trainer iterates:
pick the most frequent adjacent symbol pair, merge it everywhere, and
repeat (Sennrich et al. 2016, the GPT-2 vocab construction). This
module supplies that loop Spark-first.

Scale shape (100 TB of text): the DICTIONARY-RESOLVE pattern
(queries/linkage.py) — the corpus crosses ONE shuffle into the
distinct-word dictionary with counts, and every merge iteration is
dictionary-local: a map-only fold applying the merge to each word's
symbol array plus one tiny aggregation (pair keyspace ≤ |alphabet|²
after the first merges) for the next argmax. The token stream is never
touched again. Each iteration eagerly ``localCheckpoint``s the
dictionary state: the per-word merge fold would otherwise nest one
``F.aggregate`` per iteration into a single codegen expression
(exponential plan growth), and the dictionary is tiny relative to the
corpus at any scale.

Determinism: pair argmax ties break by (lhs ASC, rhs ASC) — plain
string order, reproducible in DuckDB; merge application is the
standard greedy left-to-right pass (a fold), identical to the
reference pure-Python BPE the goldens pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """Greedy left-to-right application of merge ``(lhs, rhs)`` to a
    symbol array: whenever the accumulator's last symbol is ``lhs`` and
    the incoming symbol is ``rhs``, replace the pair with ``lhs+rhs``
    (which then cannot re-merge with the next symbol in this pass —
    exactly the classic BPE single-pass semantics)."""
    merged = F.lit(lhs + rhs)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, cur: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (cur == F.lit(rhs)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(cur))),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """(lhs, rhs, cnt) over adjacent symbol pairs, weighted by word
    count — one explode + one tiny groupBy (keyspace ≤ alphabet²)."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("syms", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
    )
    return (
        state.select(F.explode(pairs).alias("p"), "c")
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("c").cast("long").alias("cnt"))
    )


def bpe_train(wc: DataFrame, n_merges: int) -> list[tuple[str, str, int]]:
    """Run ``n_merges`` BPE merge steps over a ``(w, c)`` word-count
    dictionary. Returns the ordered merge table
    ``[(lhs, rhs, pair_count), ...]`` — the artifact a tokenizer ships.

    Each iteration runs one dictionary aggregation (the argmax is a
    2-row driver fetch of a ≤alphabet²-key aggregate, not a data
    collect) and one map-only merge fold; the state is re-checkpointed
    so plan depth stays constant in ``n_merges``."""
    state = wc.select(F.split("w", "").alias("syms"), F.col("c")).localCheckpoint(
        eager=True
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(state)
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .first()
        )
        if best is None:
            break  # dictionary fully merged — nothing left to pair
        merges.append((best["lhs"], best["rhs"], int(best["cnt"])))
        state = state.select(
            apply_merge(F.col("syms"), best["lhs"], best["rhs"]).alias("syms"), "c"
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(df: DataFrame, text_col: str, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge table: split to
    characters, apply the merges in training order (map-only — the
    merge table is a driver-side literal, the standard deployment shape
    for a trained tokenizer), emit ``bpe_tokens: array<string>``."""
    syms = F.split(F.col(text_col), "")
    for lhs, rhs, _ in merges:
        syms = apply_merge(syms, lhs, rhs)
    return df.withColumn("bpe_tokens", syms)
