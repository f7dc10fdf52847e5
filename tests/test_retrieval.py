"""Independent goldens for the retrieval/quality/mixture queries.

The DuckDB oracles share each query's scoring formula by design (the
formula IS the spec), so cross-engine parity cannot catch a
both-sides-wrong formula bug. These tests recompute every result with
a THIRD implementation — plain Python (hashlib / math / dict loops),
no Spark, no SQL — on a hand-built corpus small enough to eyeball.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from molgraphdb_spark.queries.mixing import source_temperature_weights
from molgraphdb_spark.queries.similarity import (
    RRF_K,
    RRF_LEG_K,
    RRF_N_QUERIES,
    RRF_TOPK,
    retrieval_rrf_hybrid,
)
from molgraphdb_spark.queries.text import (
    BM25_B,
    BM25_K1,
    BM25_QUERIES,
    QC_DIMS,
    QC_MIX,
    doc_bm25_topk,
    doc_quality_classifier,
)

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"

#: 8 docs; ids 0–4 double as RRF query identities. Texts are chosen so
#: BM25 terms ("fast table scan" / "hash join merge" / "window agg
#: group") hit different docs with different tf and lengths.
MINI_DOCS = [
    (0, "fast table scan fast", "en", "web", 20),
    (1, "hash join merge hash join", "en", "web", 25),
    (2, "window agg group window", "en", "book", 24),
    (3, "fast scan", "en", "book", 9),
    (4, "table table table filler filler filler filler filler", "en", "web", 50),
    (5, "fast table scan", "en", "code", 15),
    (6, "join merge", "en", "code", 10),
    (7, "unrelated words entirely here", "en", "web", 28),
]

#: 8 embeddings (4-dim); constructed so each query id has an obvious
#: dense nearest neighbor (its clone at id+? with a known cosine order).
MINI_EMBS = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [0.0, 1.0, 0.0, 0.0], 0),
    (2, [0.0, 0.0, 1.0, 0.0], 1),
    (3, [0.9, 0.1, 0.0, 0.0], 1),
    (4, [0.0, 0.9, 0.1, 0.0], 0),
    (5, [0.8, 0.2, 0.0, 0.0], 0),
    (6, [0.1, 0.0, 0.9, 0.0], 1),
    (7, [0.5, 0.5, 0.5, 0.5], 1),
]


@pytest.fixture(scope="module")
def mini_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("retrieval_mini"))
    spark.createDataFrame(MINI_DOCS, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")
    spark.createDataFrame(MINI_EMBS, EMB_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/embeddings.parquet")
    return path


# ---------------------------------------------------------------------------
# Pure-Python references
# ---------------------------------------------------------------------------
def _toks(text: str) -> list[str]:
    return text.strip().split()


def _ref_bm25() -> list[tuple[int, int, int, int]]:
    docs = {d[0]: _toks(d[1]) for d in MINI_DOCS}
    n = len(docs)
    avg_num = sum(len(t) for t in docs.values())  # n*avgdl == total tokens
    out = []
    for qid, terms in BM25_QUERIES:
        scored = []
        for doc_id, toks in docs.items():
            s = 0
            for t in terms:
                tf = toks.count(t)
                if tf == 0:
                    continue
                df = sum(1 for tt in docs.values() if t in tt)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(toks) * n / avg_num)
                s += math.floor(1000 * idf * tf * (BM25_K1 + 1.0) / denom + 0.5)
            if s or any(t in toks for t in terms):
                scored.append((doc_id, s))
        scored.sort(key=lambda p: (-p[1], p[0]))
        out.extend((qid, d, s, rk + 1) for rk, (d, s) in enumerate(scored[:10]))
    return out


def _ref_rrf() -> list[tuple[int, int, int, int]]:
    embs = {e[0]: e[1] for e in MINI_EMBS}
    docs = {d[0]: set(_toks(d[1])) for d in MINI_DOCS}
    fused: dict[tuple[int, int], int] = {}
    for q in range(RRF_N_QUERIES):
        qv = embs[q]
        dense = []
        for i, v in embs.items():
            if i == q:
                continue
            dot = 0.0
            for a, b in zip(qv, v):
                dot += a * b
            na = math.sqrt(sum(a * a for a in qv))
            nb = math.sqrt(sum(b * b for b in v))
            dense.append((i, math.floor(dot / (na * nb) * 1_000_000 + 0.5)))
        dense.sort(key=lambda p: (-p[1], p[0]))
        qt = docs[q]
        sparse = []
        for i, t in docs.items():
            if i == q:
                continue
            inter = len(qt & t)
            if inter:
                sparse.append((i, inter * 1_000_000 // (len(qt) + len(t) - inter)))
        sparse.sort(key=lambda p: (-p[1], p[0]))
        for leg in (dense, sparse):
            for rk, (i, _) in enumerate(leg[:RRF_LEG_K], start=1):
                fused[(q, i)] = fused.get((q, i), 0) + 1_000_000_000 // (RRF_K + rk)
    out = []
    for q in range(RRF_N_QUERIES):
        cands = sorted(
            ((i, s) for (qq, i), s in fused.items() if qq == q),
            key=lambda p: (-p[1], p[0]),
        )
        out.extend((q, i, s, rk + 1) for rk, (i, s) in enumerate(cands[:RRF_TOPK]))
    return out


def _ref_weight(token: str) -> int:
    h = int(hashlib.md5(token.encode()).hexdigest()[:8], 16)
    return h % QC_DIMS * QC_MIX % 2147483648 % 2001 - 1000


def _ref_classifier() -> dict[str, tuple[int, int, int, int]]:
    per_src: dict[str, list[int]] = {}
    for _, text, _, source, _ in MINI_DOCS:
        per_src.setdefault(source, []).append(
            sum(_ref_weight(t) for t in _toks(text))
        )
    return {
        s: (
            len(v),
            sum(1 for x in v if x >= 0),
            sum(1 for x in v if x >= 0) * 10000 // len(v),
            sum(v),
        )
        for s, v in per_src.items()
    }


def _ref_temperature() -> dict[str, tuple[int, int, int, int]]:
    per_src: dict[str, list[int]] = {}
    for _, text, _, source, _ in MINI_DOCS:
        per_src.setdefault(source, []).append(len(_toks(text)))
    toks = {s: sum(v) for s, v in per_src.items()}
    isq = {s: math.floor(math.sqrt(t)) for s, t in toks.items()}
    tot_tok, tot_isq = sum(toks.values()), sum(isq.values())
    return {
        s: (
            len(per_src[s]),
            toks[s],
            toks[s] * 10000 // tot_tok,
            isq[s] * 10000 // tot_isq,
        )
        for s in per_src
    }


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------
def test_bm25_matches_python_reference(spark, mini_dir):
    got = [
        (r.query_id, r.doc_id, r.score_milli, r.rank)
        for r in doc_bm25_topk(spark, mini_dir).collect()
    ]
    assert got == _ref_bm25()


def test_bm25_tf_and_length_semantics(spark, mini_dir):
    rows = doc_bm25_topk(spark, mini_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.doc_id] = r.score_milli
    q0 = by_q[0]  # terms: fast table scan
    # doc 0 ("fast table scan fast", tf_fast=2) beats doc 5 ("fast
    # table scan", tf all 1, shorter) is NOT obvious — but doc 7 (no
    # query terms) must be absent, and every doc with a term present.
    assert 7 not in q0 and {0, 3, 4, 5} <= set(q0)
    # tf monotonicity at equal length is guaranteed: within q1, doc 1
    # has tf(hash)=2,tf(join)=2 and must beat doc 6 (tf=1 each, and
    # shorter docs get a boost — verify the reference agrees rather
    # than asserting a direction blindly).
    assert by_q[1][1] == max(by_q[1].values())


def test_rrf_matches_python_reference(spark, mini_dir):
    got = [
        (r.query_id, r.neighbor_id, r.rrf_score_nano, r.rank)
        for r in retrieval_rrf_hybrid(spark, mini_dir).collect()
    ]
    assert got == _ref_rrf()


def test_rrf_both_legs_outrank_single_leg(spark, mini_dir):
    # a candidate appearing in BOTH legs at rank r carries two
    # contributions; the top fused candidate for every query must have
    # fused score >= any single-leg maximum 1e9/(60+1)
    rows = retrieval_rrf_hybrid(spark, mini_dir).collect()
    top = {r.query_id: r.rrf_score_nano for r in rows if r.rank == 1}
    for q in range(RRF_N_QUERIES):
        assert top[q] >= 1_000_000_000 // (RRF_K + RRF_LEG_K)


def test_quality_classifier_matches_python_reference(spark, mini_dir):
    got = {
        r.source: (r.n_docs, r.accepted, r.accept_bp, r.sum_score_milli)
        for r in doc_quality_classifier(spark, mini_dir).collect()
    }
    assert got == _ref_classifier()


def test_temperature_weights_match_python_reference(spark, mini_dir):
    got = {
        r.source: (r.n_docs, r.tokens, r.natural_bp, r.temperature_bp)
        for r in source_temperature_weights(spark, mini_dir).collect()
    }
    assert got == _ref_temperature()


def test_temperature_flattens_the_mixture(spark, mini_dir):
    # alpha=0.5 must move every source's share toward uniform: the
    # largest source's temperature share <= its natural share, the
    # smallest's >= (the whole point of temperature sampling)
    rows = source_temperature_weights(spark, mini_dir).collect()
    big = max(rows, key=lambda r: r.tokens)
    small = min(rows, key=lambda r: r.tokens)
    assert big.temperature_bp <= big.natural_bp
    assert small.temperature_bp >= small.natural_bp


def test_priority_sample_matches_python_reference(spark, mini_dir):
    from molgraphdb_spark.queries.mixing import doc_priority_sample

    def ref():
        out = []
        for doc_id, text, _, source, n_chars in MINI_DOCS:
            if text is None or n_chars <= 0:
                continue
            h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            u = (h + 1) / 4294967296.0
            key = math.floor(math.log(u) / n_chars * 1_000_000)
            out.append((doc_id, source, n_chars, key))
        out.sort(key=lambda r: (-r[3], r[0]))
        return out[:100]

    got = [
        (r.doc_id, r.source, r.n_chars, r.priority_micro)
        for r in doc_priority_sample(spark, mini_dir).collect()
    ]
    assert got == ref() and len(got) == len(MINI_DOCS)


def test_priority_sample_weight_monotonicity(spark, mini_dir):
    # ln(u) <= 0 and w = n_chars divides it, so every priority is <= 0
    # and the output order is (priority desc, doc_id asc) exactly
    from molgraphdb_spark.queries.mixing import doc_priority_sample

    rows = doc_priority_sample(spark, mini_dir).collect()
    assert all(r.priority_micro <= 0 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a.priority_micro > b.priority_micro or (
            a.priority_micro == b.priority_micro and a.doc_id < b.doc_id
        )


def test_cross_source_matrix_hand_corpus(spark, tmp_path_factory):
    """Hand-built near-dup provenance matrix: two identical 5-token
    docs across web/code (one cross pair, jaccard 1.0 = 10000 bp) and
    two identical docs within web (one within pair), plus distinct
    noise docs. Identical shingle sets collide in every LSH band and
    verify at exactly 10000 bp, so the rollup is hand-checkable."""
    from molgraphdb_spark.queries.dedup import dedup_cross_source_matrix

    path = str(tmp_path_factory.mktemp("xsrc_mini"))
    rows = [
        (0, "alpha beta gamma delta epsilon", "en", "web", 31),
        (1, "alpha beta gamma delta epsilon", "en", "code", 31),
        (2, "one two three four five", "en", "web", 23),
        (3, "one two three four five", "en", "web", 23),
        (4, "lonely words entirely unrelated here", "en", "book", 36),
        (5, "another quite different document text", "en", "code", 37),
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")
    got = [
        (r.source_a, r.source_b, r.n_pairs, r.sum_jaccard_bp)
        for r in dedup_cross_source_matrix(spark, path).collect()
    ]
    assert got == [
        ("code", "web", 1, 10000),
        ("web", "web", 1, 10000),
    ]


def test_hard_negatives_ann_rejects_sparse_vec_ids(spark, tmp_path_factory):
    """r10 ADVICE: a NON-empty corpus with no vec_id < IVF_K must raise
    loudly (the dense-vec_id centroid fixture invariant), never fall
    through to the empty-centroid sentinel — that sentinel would assign
    EVERY vector to one constant cell and degenerate the shortlist into
    an all-pairs join."""
    from molgraphdb_spark.queries.similarity import (
        IVF_K,
        embedding_hard_negatives_ann,
    )

    d = tmp_path_factory.mktemp("sparse_ids")
    spark.createDataFrame(
        [(IVF_K + i, [float(i), 1.0], "a") for i in range(5)],
        "vec_id long, embedding array<float>, label string",
    ).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    with pytest.raises(ValueError, match="vec_id < IVF_K"):
        embedding_hard_negatives_ann(spark, str(d))
