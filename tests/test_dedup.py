"""Dedup-family unit tests (the oracle gate covers end-to-end results;
these pin the pieces DuckDB can't see: the stop-shingle cap and the
inverted-index helper's semantics)."""

from __future__ import annotations

import pytest

from molgraphdb_spark.queries.dedup import MAX_SHINGLE_DF, _shingle_rows


@pytest.fixture(scope="module")
def hot_shingle_dir(spark, tmp_path_factory):
    """Six-doc corpus where the phrase 'omega omega omega' appears in
    every document (df=6) and each doc carries one unique shingle."""
    path = str(tmp_path_factory.mktemp("hotshingle"))
    rows = [
        (i, f"unique{i} token{i} word{i} omega omega omega", "en", "t", 40)
        for i in range(6)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_hot_shingle_excluded(spark, hot_shingle_dir):
    sh = _shingle_rows(spark, hot_shingle_dir, max_df=3)
    shingles = {r.shingle for r in sh.collect()}
    # the planted ubiquitous shingle (df=6 > 3) must be gone...
    assert "omega omega omega" not in shingles
    # ...while per-document rare shingles survive
    assert "unique0 token0 word0" in shingles


def test_df_cap_noop_below_threshold(spark, hot_shingle_dir):
    """With the cap above every df, the filtered index is identical to
    the unfiltered one — the production default must be a no-op on
    corpora without stop-shingles (the sf test corpora qualify; oracle
    parity would catch a divergence there)."""
    capped = _shingle_rows(spark, hot_shingle_dir, max_df=MAX_SHINGLE_DF)
    uncapped = _shingle_rows(spark, hot_shingle_dir, max_df=None)
    assert capped.exceptAll(uncapped).count() == 0
    assert uncapped.exceptAll(capped).count() == 0


def test_df_cap_is_broadcast_anti_join(spark, hot_shingle_dir):
    """The df cap must be a broadcast left-anti join against the tiny
    hot-shingle set — NOT a full-row shuffle/sort by shingle (the
    round-3/4 window form, which regressed neardup_jaccard_pairs
    2.6 s → 4.8 s). The full (doc_id, shingle) rows may be shuffled
    only by the distinct; the cap itself adds no row Exchange and no
    Window/Sort."""
    sh = _shingle_rows(spark, hot_shingle_dir, max_df=3)
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight" in plan or "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_dedup_clusters_uses_cheap_cc_at_test_scale(spark, sf_dir):
    # The LSH pair graph at bench scale is a few hundred edges — the
    # size dispatch must pick min-label (cheap rounds) and converge in
    # single-digit rounds; star-CC's 3x-per-round constant is reserved
    # for graphs past the threshold (round-3 verdict item 6).
    from molgraphdb_spark.operators.graph import (
        connected_components,
        connected_components_auto,
    )
    from molgraphdb_spark.queries.dedup import dedup_clusters

    n = dedup_clusters(spark, sf_dir).count()
    assert n > 0
    assert connected_components_auto.last_strategy == "minlabel"
    assert connected_components.last_converged
    assert connected_components.last_rounds <= 8, connected_components.last_rounds


def test_prefix_pairs_equals_inverted_index(spark, sf_dir):
    # AllPairs prefix filtering must lose NO pair vs the plain
    # inverted-index join — same rows, same scores (its registry oracle
    # is literally neardup_jaccard_pairs' SQL; this pins the Spark
    # sides against each other too)
    from molgraphdb_spark.queries.dedup import (
        neardup_jaccard_pairs,
        neardup_prefix_pairs,
    )

    plain = sorted(tuple(r) for r in neardup_jaccard_pairs(spark, sf_dir).collect())
    pref = sorted(tuple(r) for r in neardup_prefix_pairs(spark, sf_dir).collect())
    assert pref == plain
    assert plain  # the corpus plants near-dups; empty would be vacuous
