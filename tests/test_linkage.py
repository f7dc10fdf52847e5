"""Fuzzy record linkage (queries/linkage.py): internal consistency of
the block -> verify -> cluster pipeline beyond the oracle parity check
(which pins exact values; these pin the *relationships* between the
two query surfaces)."""

from __future__ import annotations

import pytest

from molgraphdb_spark.queries.linkage import (
    MAX_EDIT_DIST,
    fuzzy_name_clusters,
    fuzzy_name_pairs,
)


@pytest.fixture(scope="module")
def pairs(spark, sf_dir):
    return fuzzy_name_pairs(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def clusters(spark, sf_dir):
    return fuzzy_name_clusters(spark, sf_dir).collect()


def test_pairs_ordered_and_bounded(pairs):
    assert pairs, "fixture corpus must produce at least one fuzzy match"
    for r in pairs:
        assert r.name_a < r.name_b  # canonical pair orientation
        assert 1 <= r.edit_dist <= MAX_EDIT_DIST


def test_pairs_share_a_token(pairs):
    # Blocking contract: every emitted pair shares >= 1 whole word.
    for r in pairs:
        assert set(r.name_a.split(" ")) & set(r.name_b.split(" "))


def test_clusters_cover_all_matched_names(pairs, clusters):
    matched = {r.name_a for r in pairs} | {r.name_b for r in pairs}
    n_names = sum(r.n_names for r in clusters)
    assert n_names == len(matched)
    # canonical = min member, so every canonical is itself matched
    for c in clusters:
        assert c.canonical_name in matched
        assert c.n_parts >= c.n_names  # parts table repeats names


def test_paired_names_share_cluster(spark, sf_dir, pairs):
    from molgraphdb_spark.operators.graph import connected_components
    from molgraphdb_spark.queries.linkage import _fuzzy_pairs
    from pyspark.sql import functions as F

    p = _fuzzy_pairs(spark, sf_dir)
    e = p.select(F.col("name_a").alias("src"), F.col("name_b").alias("dst"))
    e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    comp = {r.id: r.component for r in connected_components(e).collect()}
    for r in pairs:
        assert comp[r.name_a] == comp[r.name_b]
