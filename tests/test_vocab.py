"""Golden test for the BPE merge-step pair counter: classic BPE
example corpus — the top pair is what a byte-pair-encoding trainer
would merge first."""

from __future__ import annotations

import os

import pytest

from molgraphdb_spark.queries.text import vocab_bpe_merge_pairs


@pytest.fixture(scope="module")
def bpe_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("bpe_sf")
    rows = [
        (0, "low low low lower lower newest", "en", "src0", 30),
        (1, "newest newest widest a", "en", "src0", 22),  # 'a' too short to pair
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
    return str(d)


def test_bpe_pair_counts(spark, bpe_sf_dir):
    rows = vocab_bpe_merge_pairs(spark, bpe_sf_dir).collect()
    counts = {r["pair"]: r["cnt"] for r in rows}
    # word counts: low×3 lower×2 newest×3 widest×1 ('a' filtered, len<2)
    # lo/ow ride low(3)+lower(2); we rides lower(2)+newest(3);
    # es/st ride newest(3)+widest(1); ne/ew ride newest(3); er lower(2)
    assert counts == {
        "lo": 5, "ow": 5, "we": 5,
        "es": 4, "st": 4,
        "ne": 3, "ew": 3,
        "er": 2,
        "wi": 1, "id": 1, "de": 1,
    }
    # deterministic ordering: count desc, then pair asc
    assert [r["pair"] for r in rows[:5]] == ["lo", "ow", "we", "es", "st"]


def test_source_divergence_orders_skew(spark, sf_dir, tmp_path_factory):
    """A source whose token distribution matches the corpus blend shows
    near-zero KL; a skewed source shows strictly higher KL."""
    import os

    from molgraphdb_spark.queries.text import source_token_divergence

    d = tmp_path_factory.mktemp("kl_sf")
    balanced = "alpha beta gamma delta " * 10
    rows = (
        [(i, balanced, "en", "srcA", 80) for i in range(5)]
        + [(10 + i, balanced, "en", "srcB", 80) for i in range(5)]
        + [(20, "alpha alpha alpha alpha " * 10, "en", "srcC", 80)]
    )
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
    kl = {r["source"]: r["kl_micro"] for r in source_token_divergence(spark, str(d)).collect()}
    # the two identical sources diverge from the blend only by what
    # srcC's skew pulls into the GLOBAL distribution (~0.012 nats here)
    assert kl["srcA"] == kl["srcB"]
    assert abs(kl["srcA"]) <= 50_000
    # the all-alpha source diverges by two orders of magnitude more
    # (ln(1/p_g(alpha)) ≈ 1.14 nats ≈ 1.14M micro-nats)
    assert kl["srcC"] > 20 * abs(kl["srcA"])
    assert kl["srcC"] > 1_000_000
