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
