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


def _pure_python_bpe(word_counts: dict[str, int], n_merges: int):
    """Classic reference BPE trainer (Sennrich et al.): greedy
    left-to-right merge application, ties to (lhs, rhs) ascending."""
    state: dict[tuple, int] = {}
    for w, c in word_counts.items():
        k = tuple(w)
        state[k] = state.get(k, 0) + c
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple, int] = {}
        for syms, c in state.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (x, y), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((x, y, cnt))
        new: dict[tuple, int] = {}
        for syms, c in state.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == x and s == y:
                    out[-1] = x + y
                else:
                    out.append(s)
            new[tuple(out)] = new.get(tuple(out), 0) + c
        state = new
    return merges


def test_bpe_train_matches_reference_on_classic_corpus(spark):
    """Full induction loop on the classic low/lower/newest/widest
    corpus — merge-for-merge identical to the pure-Python trainer,
    including a multi-character merge ('es'+'t') past step 1."""
    from molgraphdb_spark.operators.bpe import bpe_train

    wc_dict = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    wc = spark.createDataFrame(list(wc_dict.items()), "w string, c long")
    got = bpe_train(wc, 6)
    want = _pure_python_bpe(wc_dict, 6)
    assert got == want
    # spot-pin the head so the reference impl itself is sanity-checked:
    # es rides newest(6)+widest(3)=9, then est merges es(9)+t(9)
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)


def test_bpe_train_exhausts_gracefully(spark):
    """More requested merges than pairs exist: loop stops when the
    dictionary is fully merged instead of erroring."""
    from molgraphdb_spark.operators.bpe import bpe_train

    wc = spark.createDataFrame([("ab", 3)], "w string, c long")
    got = bpe_train(wc, 5)
    assert got == [("a", "b", 3)]


def test_bpe_segment_applies_merge_table(spark):
    from molgraphdb_spark.operators.bpe import bpe_segment, bpe_train

    wc = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], "w string, c long"
    )
    merges = bpe_train(wc, 4)
    df = spark.createDataFrame([(0, "lowest")], "id long, text string")
    [row] = bpe_segment(df, "text", merges).collect()
    ref = list("lowest")
    for x, y, _ in merges:
        out = []
        for s in ref:
            if out and out[-1] == x and s == y:
                out[-1] = x + y
            else:
                out.append(s)
        ref = out
    assert row.bpe_tokens == ref


def test_bpe_merge_table_query_head_matches_pairs_top1(spark, bpe_sf_dir):
    """The loop's step 1 IS vocab_bpe_merge_pairs' argmax — except the
    table tie-breaks on (lhs, rhs) while the pair histogram tie-breaks
    on the concatenated string, so compare count only."""
    from molgraphdb_spark.queries.text import vocab_bpe_merge_table

    rows = vocab_bpe_merge_table(spark, bpe_sf_dir).collect()
    assert [r.step for r in rows] == list(range(1, len(rows) + 1))
    top_pairs = vocab_bpe_merge_pairs(spark, bpe_sf_dir).collect()
    assert rows[0].cnt == top_pairs[0].cnt
