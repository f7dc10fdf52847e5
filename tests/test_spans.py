"""Golden-behavior tests for the sub-document duplication analytics
(queries/spans.py): exact interval-union coverage for cross-document
duplicated spans, and brute-force-Python equivalence for the Gopher
repetition folds."""

from __future__ import annotations

import os
from collections import Counter

import pytest

from molgraphdb_spark.queries.spans import (
    SPAN_W,
    doc_dup_span_stats,
    doc_repetition_suite,
)

assert SPAN_W == 8, "golden fixtures below are built for SPAN_W=8"

#: doc_id -> text. Docs 0 and 1 share a 9-token run (two overlapping
#: 8-windows -> union must be 9 tokens, not 16); doc 2 is unique but
#: internally repeats an 8-gram (within-doc only -> must NOT flag);
#: doc 3 is short (< SPAN_W tokens); doc 4 shares the same run as 0/1.
SPAN_DOCS = {
    0: "s1 s2 s3 s4 s5 s6 s7 s8 s9 u01 u02 u03",
    1: "v11 v12 s1 s2 s3 s4 s5 s6 s7 s8 s9 v13",
    2: "r1 r2 r3 r4 r5 r6 r7 r8 w1 r1 r2 r3 r4 r5 r6 r7 r8",
    3: "t1 t2 t3",
    4: "s1 s2 s3 s4 s5 s6 s7 s8 s9",
}


@pytest.fixture(scope="module")
def span_sf_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("span_sf")
    rows = [(i, t, "en", "src0", len(t)) for i, t in SPAN_DOCS.items()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
    return str(d)


def test_dup_span_interval_union(spark, span_sf_dir):
    out = {
        r["doc_id"]: r.asDict()
        for r in doc_dup_span_stats(spark, span_sf_dir).collect()
    }
    # doc 0: shared 9-run at positions 0..8 -> 2 windows, union 9 tokens
    assert out[0]["n_dup_windows"] == 2
    assert out[0]["dup_token_cnt"] == 9
    assert out[0]["dup_token_bp"] == round(9 / 12 * 10000)
    # doc 1: same run at offset 2 -> identical coverage
    assert out[1]["n_dup_windows"] == 2
    assert out[1]["dup_token_cnt"] == 9
    # doc 2: 8-gram repeats only WITHIN the doc -> cross-doc rule says clean
    assert out[2]["n_dup_windows"] == 0
    assert out[2]["dup_token_cnt"] == 0
    assert out[2]["keep"] == 1
    # doc 3: too short for any window
    assert out[3]["n_dup_windows"] == 0 and out[3]["n_tokens"] == 3
    # doc 4: exactly the shared run -> fully covered, flagged
    assert out[4]["dup_token_cnt"] == 9 and out[4]["n_tokens"] == 9
    assert out[4]["dup_token_bp"] == 10000 and out[4]["keep"] == 0


def _grams(toks: list[str], k: int) -> list[str]:
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _expected_suite(text: str) -> tuple[int, int, int]:
    toks = text.split()
    n = len(toks)
    top3 = max(Counter(_grams(toks, 3)).values()) if n >= 3 else 0
    top4 = max(Counter(_grams(toks, 4)).values()) if n >= 4 else 0
    top3_bp = round(top3 * 10000 / (n - 2)) if n >= 3 else 0
    top4_bp = round(top4 * 10000 / (n - 3)) if n >= 4 else 0
    if n >= 5:
        c5 = Counter(_grams(toks, 5))
        dup = sum(len(g) * c for g, c in c5.items() if c >= 2)
        allc = sum(len(g) * c for g, c in c5.items())
        dup5_bp = round(dup * 10000 / allc) if allc else 0
    else:
        dup5_bp = 0
    return top3_bp, top4_bp, dup5_bp


def test_repetition_suite_matches_bruteforce(spark, span_sf_dir):
    out = {
        r["doc_id"]: r.asDict()
        for r in doc_repetition_suite(spark, span_sf_dir).collect()
    }
    for i, text in SPAN_DOCS.items():
        t3, t4, d5 = _expected_suite(text)
        assert out[i]["top3_bp"] == t3, (i, "top3")
        assert out[i]["top4_bp"] == t4, (i, "top4")
        assert out[i]["dup5_char_bp"] == d5, (i, "dup5")


def test_repetition_suite_flags_templated_text(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("rep_sf")
    rows = [
        (0, "click here now " * 12, "en", "src0", 180),  # pure template
        (1, " ".join(f"w{i}" for i in range(40)), "en", "src0", 160),  # all unique
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
    out = {
        r["doc_id"]: r.asDict()
        for r in doc_repetition_suite(spark, str(d)).collect()
    }
    assert out[0]["keep"] == 0 and out[0]["dup5_char_bp"] == 10000
    assert out[1]["keep"] == 1 and out[1]["dup5_char_bp"] == 0


def test_dup_span_removal_golden(spark, span_sf_dir):
    from molgraphdb_spark.queries.spans import doc_dup_span_removal

    out = {
        r["doc_id"]: r.asDict()
        for r in doc_dup_span_removal(spark, span_sf_dir).collect()
    }
    # doc 0: overlapping windows merge to one [0,8] interval
    assert out[0]["n_removed"] == 9
    assert out[0]["text_clean"] == "u01 u02 u03"
    # doc 1: interval [2,10] -> outer tokens survive
    assert out[1]["n_removed"] == 9
    assert out[1]["text_clean"] == "v11 v12 v13"
    # doc 2: within-doc repetition only -> untouched
    assert out[2]["n_removed"] == 0
    assert out[2]["text_clean"] == SPAN_DOCS[2]
    # doc 4: fully duplicated -> scrubbed to empty
    assert out[4]["n_removed"] == 9 and out[4]["text_clean"] == ""


def test_removal_matches_stats_coverage(spark, span_sf_dir):
    # invariant tying the two queries: tokens REMOVED by the transform
    # must equal tokens COVERED per the stats query, doc by doc
    from molgraphdb_spark.queries.spans import doc_dup_span_removal

    stats = {
        r["doc_id"]: r["dup_token_cnt"]
        for r in doc_dup_span_stats(spark, span_sf_dir).collect()
    }
    removed = {
        r["doc_id"]: r["n_removed"]
        for r in doc_dup_span_removal(spark, span_sf_dir).collect()
    }
    assert stats == removed


def test_phash_pairs_identical_payloads(spark, sf_dir, tmp_path_factory):
    # multimodal perceptual-hash dedup: identical payloads must pair at
    # hamming 0; an unrelated payload must not pair with them
    from molgraphdb_spark.queries.multimodal_queries import mm_phash_neardup
    import os

    d = tmp_path_factory.mktemp("phash_sf")
    base = " ".join(f"tok{i % 7}" for i in range(40))
    other = " ".join(f"zz{i * 13 % 23}" for i in range(40))
    rows = [
        (0, base, "en", "src0", len(base)),
        (1, base, "en", "src0", len(base)),       # exact duplicate payload
        (2, other, "en", "src0", len(other)),     # unrelated
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in mm_phash_neardup(spark, str(d)).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs
