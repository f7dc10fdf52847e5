"""Property tests for the span-dedup operators against a pure-Python
reference (brute-force window counting + interval union + token
filtering) on randomized small-vocabulary corpora — the tiny alphabet
forces genuine cross-document duplicated windows."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from molgraphdb_spark.queries.spans import (
    SPAN_W,
    dup_span_removal,
    dup_span_stats,
)

_VOCAB = ["a", "b"]  # 2^8 possible windows — cross-doc duplicates common


def _ref(corpus: list[list[str]]):
    """doc_id -> (n_dup_windows, dup_token_cnt, text_clean)."""
    from collections import defaultdict

    docs_per_win: dict[tuple, set[int]] = defaultdict(set)
    for i, toks in enumerate(corpus):
        for p in range(len(toks) - SPAN_W + 1):
            docs_per_win[tuple(toks[p : p + SPAN_W])].add(i)
    out = {}
    for i, toks in enumerate(corpus):
        starts = [
            p
            for p in range(len(toks) - SPAN_W + 1)
            if len(docs_per_win[tuple(toks[p : p + SPAN_W])]) >= 2
        ]
        covered = set()
        for s in starts:
            covered.update(range(s, s + SPAN_W))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        out[i] = (len(starts), len(covered), " ".join(kept))
    return out


corpora = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=14),
    min_size=1,
    max_size=8,
)


@given(corpus=corpora)
@settings(max_examples=10, deadline=None)
def test_span_stats_and_removal_match_reference(spark, corpus):
    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    want = _ref(corpus)
    stats = {
        r["doc_id"]: (r["n_dup_windows"], r["dup_token_cnt"])
        for r in dup_span_stats(docs).collect()
    }
    removal = {
        r["doc_id"]: (r["n_removed"], r["text_clean"])
        for r in dup_span_removal(docs).collect()
    }
    for i, (n_wins, n_cov, clean) in want.items():
        assert stats[i] == (n_wins, n_cov), (i, "stats")
        assert removal[i] == (n_cov, clean), (i, "removal")
