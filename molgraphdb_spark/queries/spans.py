"""Sub-document duplication analytics: cross-document duplicated token
spans and the full Gopher-style within-document repetition suite.

Extension surface (SURVEY.md §7 M4 / §2.12): the reference has no text
pipeline — these are the remaining large-scale training-data curation
operators the dedup family (queries/dedup.py, whole-document) does not
cover:

- ``doc_dup_span_stats``: EXACT SUBSTRING-LEVEL duplication in the
  style of exact-substring training-data dedup (Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better"): slide a
  ``SPAN_W``-token window over every document, find windows that occur
  in ≥2 DISTINCT documents, and report per document how many of its
  token positions are covered by at least one such duplicated window.
  Whole-doc dedup (exact/minhash/simhash) misses boilerplate that is
  pasted INTO otherwise-unique documents; this catches it.
- ``doc_repetition_suite``: the Gopher repetition filters beyond the
  top-bigram share already in ``doc_gopher_repetition`` — top-trigram
  share, top-quadgram share, and the fraction of 5-gram CHARACTERS
  belonging to 5-grams that repeat within the document.

Cross-engine determinism: tokenization is the repo-standard
``split(trim(text), '[ \\t\\n\\r\\f]+')`` (identical Java-regex/RE2 behavior),
window keys are the joined token strings themselves (portable; the
round-5 A/B in BASELINE.md showed pre-hashing buys nothing), and all
ratios are floored to basis points on both sides.

Scale shape (100 TB):
- ``doc_dup_span_stats`` is THE linear formulation of substring dedup:
  windows ≈ corpus tokens, one groupBy on the window string (map-side
  partial count + count-distinct-doc), one join back of the duplicated
  subset (a filter, never an expansion), one per-doc window pass for
  interval-union coverage. Three shuffles, all O(corpus); no pairwise
  anything — the suffix-array of the original paper is replaced by
  hash aggregation, which is the shuffle-native equivalent. Skew note:
  a window shared by millions of docs produces ONE aggregation row
  (count-distinct via partial aggregation) and rejoins as a semi-join
  probe — posting lists are never materialized, so no cap is needed
  (contrast the Jaccard pair-join in dedup.py, which IS quadratic per
  posting and caps at MAX_SHINGLE_DF).
- ``doc_repetition_suite`` is MAP-ONLY: per-document sorted-run folds
  (the doc_gopher_repetition trick, one consumer per built array),
  zero exchanges at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from molgraphdb_spark.queries.text import _docs, _tokens

#: Duplicated-span window width in tokens. The exact-substring dedup
#: literature uses 50 BPE tokens on web corpora; the synthetic corpus
#: has ~30-token documents, so 8 keeps the operator exercised while the
#: formulation is width-independent.
SPAN_W = 8

#: Keep threshold: documents with more than this share of token
#: positions covered by cross-document duplicated windows are flagged.
DUP_SPAN_MAX_BP = 5000

#: Gopher repetition thresholds (fractions → basis points):
#: top-3-gram ≤ 0.18, top-4-gram ≤ 0.16, duplicated-5-gram chars ≤ 0.15.
GOPHER_TOP3_MAX_BP = 1800
GOPHER_TOP4_MAX_BP = 1600
GOPHER_DUP5_MAX_BP = 1500


def _ngram_array(toks: Column, n: Column, k: int) -> Column:
    """Array of ``k``-gram strings (space-joined) from a token array.

    Built with a zip_with chain over shifted slices so each level's
    array argument is evaluated exactly once (the doc_gopher_repetition
    lesson: CollapseProject re-inlines aliases and higher-order-function
    subtrees are not subexpression-eliminated — but the re-evaluated
    leaf here is the cheap ``split``, never a sort)."""
    out = toks
    for i in range(1, k):
        shifted = F.slice(toks, i + 1, F.greatest(n - i, F.lit(1)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.slice(out, 1, F.greatest(n - (k - 1), F.lit(0)))


def _top_run(arr: Column) -> Column:
    """Count of the most frequent element, as the longest equal-run of
    the sorted array — one O(n log n) sort + O(n) fold, no shuffle."""
    acc0 = F.struct(
        F.lit("\x00").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def _merge(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(a["best"], run).alias("best")
        )

    return F.aggregate(F.array_sort(arr), acc0, _merge, lambda a: a["best"])


def _dup_char_bp(arr: Column) -> Column:
    """Duplicated-character share of ``arr`` in basis points: chars
    (gram lengths summed over occurrences) belonging to elements that
    appear ≥2 times, over total chars — ONE sorted-run fold tracking
    both sums, with the ratio computed in the finish lambda so the
    caller consumes a single scalar. (Returning a two-field struct and
    referencing both fields would make CollapseProject evaluate the
    sort+fold twice — A/B'd at sf0.1: separate dup/all folds 2.77 s,
    this combined fold 2.19 s, hash-sorted variant 2.41 s rejected.)
    A run's 2nd element books both its chars, later elements their own."""
    acc0 = F.struct(
        F.lit("\x00").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("all"),
    )

    def _merge(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long"))
        add = (
            F.when(run == 2, F.length(x) * 2)
            .when(run > 2, F.length(x))
            .otherwise(F.lit(0))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (a["dup"] + add).alias("dup"),
            (a["all"] + F.length(x)).alias("all"),
        )

    return F.aggregate(
        F.array_sort(arr),
        acc0,
        _merge,
        lambda a: F.when(
            a["all"] > 0,
            F.floor(a["dup"] * 10000.0 / a["all"] + 0.5).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def dup_span_stats(docs: DataFrame) -> DataFrame:
    """Core of ``doc_dup_span_stats`` over any frame with
    ``(doc_id, text)`` — split out so property tests can drive it with
    in-memory corpora."""
    toks = _tokens()
    n = F.size(toks)
    wins = _ngram_array(toks, n, SPAN_W)
    # pos is 0-based window start. occ feeds BOTH the dup-window
    # aggregation and the semi-join probe side — unmaterialized, the
    # window-array construction (zip_with chain over the token split)
    # executes once per reference (A/B at sf0.1: 4.89 s uncached,
    # 3.18 s cached; the tfidf tf-cache precedent). localCheckpoint
    # instead of cache(): this relation is corpus×SPAN_W-sized and a
    # cache() here is never unpersisted (the returned frame is lazy, so
    # there is no post-collect hook) — repeated registry invocations
    # would accumulate corpus-sized pinned blocks (ADVICE r5, the
    # module's dominant memory hazard). Checkpoint blocks are freed by
    # the ContextCleaner once the plan is GC'd; wall unchanged (A/B at
    # sf0.1: stats 2.78 s cache vs 2.34 s checkpoint, removal 2.63
    # vs 2.71 — noise-level).
    occ = docs.select(
        "doc_id", F.posexplode(wins).alias("pos", "win")
    ).localCheckpoint(eager=True)
    dup_wins = (
        occ.groupBy("win")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("win")
    )
    dup_occ = occ.join(dup_wins, "win", "left_semi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    covered = F.least(
        F.lit(SPAN_W).cast("long"),
        F.col("pos") - F.lag("pos").over(w),
    )
    per_doc = (
        dup_occ.withColumn(
            "cov", F.coalesce(covered, F.lit(SPAN_W).cast("long"))
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_dup_windows"),
            F.sum("cov").alias("dup_token_cnt"),
        )
    )
    out = docs.select("doc_id", n.cast("long").alias("n_tokens")).join(
        per_doc, "doc_id", "left"
    )
    bp = F.floor(
        F.col("dup_token_cnt") * 10000.0 / F.col("n_tokens") + 0.5
    ).cast("long")
    return out.select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
        F.coalesce("dup_token_cnt", F.lit(0)).cast("long").alias("dup_token_cnt"),
        F.coalesce(
            F.when(F.col("n_tokens") > 0, bp), F.lit(0).cast("long")
        ).alias("dup_token_bp"),
    ).withColumn(
        "keep",
        F.when(F.col("dup_token_bp") <= DUP_SPAN_MAX_BP, 1).otherwise(0),
    )


def doc_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document coverage by cross-document duplicated token windows.

    Output: ``doc_id, n_tokens, n_dup_windows, dup_token_cnt,
    dup_token_bp, keep`` — ``dup_token_cnt`` is the exact size of the
    union of ``[pos, pos+SPAN_W-1]`` intervals over this document's
    duplicated-window start positions (computed with a per-doc lag
    window: each interval contributes ``min(SPAN_W, gap to previous
    start)``), and ``dup_token_bp`` is that count over ``n_tokens`` in
    basis points."""
    return dup_span_stats(_docs(spark, sf_dir))


DOC_DUP_SPAN_SQL = f"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\r\\f]+') AS toks FROM documents
), occ AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(toks[i:i+{SPAN_W - 1}], ' ') AS win
  FROM tk, unnest(range(1, len(toks) - {SPAN_W - 2})) AS u(i)
), dup AS (
  SELECT win FROM occ GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2
), docc AS (
  SELECT o.doc_id, o.pos FROM occ o SEMI JOIN dup d ON o.win = d.win
), cov AS (
  SELECT doc_id,
         COALESCE(LEAST({SPAN_W}, pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)),
                  {SPAN_W}) AS c
  FROM docc
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows,
         CAST(SUM(c) AS BIGINT) AS dup_token_cnt
  FROM cov GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) AS BIGINT) AS n_tokens,
       COALESCE(p.n_dup_windows, 0) AS n_dup_windows,
       COALESCE(p.dup_token_cnt, 0) AS dup_token_cnt,
       COALESCE(CASE WHEN len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) > 0
                THEN CAST(floor(p.dup_token_cnt * 10000.0
                     / len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) + 0.5) AS BIGINT)
                END, 0) AS dup_token_bp,
       CAST(CASE WHEN COALESCE(CASE WHEN len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) > 0
                     THEN floor(p.dup_token_cnt * 10000.0
                          / len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) + 0.5) END, 0)
                 <= {DUP_SPAN_MAX_BP} THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY doc_id
"""


def _dup_start_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, starts) — sorted array of this doc's duplicated-window
    start positions (empty array when the doc has none)."""
    toks = _tokens()
    n = F.size(toks)
    # localCheckpoint: same double-reference and same cache-leak
    # rationale as dup_span_stats (see there)
    occ = docs.select(
        "doc_id", F.posexplode(_ngram_array(toks, n, SPAN_W)).alias("pos", "win")
    ).localCheckpoint(eager=True)
    dup_wins = (
        occ.groupBy("win")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("win")
    )
    return (
        occ.join(dup_wins, "win", "left_semi")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("starts"))
    )


def dup_span_removal(docs: DataFrame) -> DataFrame:
    """Core of ``doc_dup_span_removal`` over any ``(doc_id, text)``
    frame — split out so property tests can drive it with in-memory
    corpora."""
    toks = _tokens()
    n = F.size(toks)
    joined = docs.select(
        "doc_id", "text", n.cast("long").alias("n_tokens")
    ).join(_dup_start_arrays(docs), "doc_id", "left")
    starts = F.coalesce("starts", F.array().cast("array<int>"))

    # Fold 1: sorted starts -> merged disjoint intervals [s, e].
    iacc0 = F.struct(
        F.array().cast("array<struct<s:long,e:long>>").alias("done"),
        F.lit(None).cast("long").alias("cs"),
        F.lit(None).cast("long").alias("ce"),
    )

    def _imerge(a, x):
        x = x.cast("long")
        xe = x + F.lit(SPAN_W - 1)
        fresh = a["cs"].isNull()
        overlaps = x <= a["ce"] + 1
        return F.struct(
            F.when(fresh | overlaps, a["done"])
            .otherwise(
                F.concat(
                    a["done"],
                    F.array(F.struct(a["cs"].alias("s"), a["ce"].alias("e"))),
                )
            )
            .alias("done"),
            F.when(fresh | ~overlaps, x).otherwise(a["cs"]).alias("cs"),
            xe.alias("ce"),  # starts ascend, so the new end always wins
        )

    intervals = F.aggregate(
        starts,
        iacc0,
        _imerge,
        lambda a: F.when(
            a["cs"].isNull(), a["done"]
        ).otherwise(
            F.concat(a["done"], F.array(F.struct(a["cs"].alias("s"), a["ce"].alias("e"))))
        ),
    )

    # Covered-token count from the CHEAP intervals fold (no token
    # slicing), so the expensive `kept` expression below has exactly ONE
    # consumer — referencing it twice (e.g. size(kept) + array_join(kept))
    # makes CollapseProject evaluate the whole slice chain twice (the
    # doc_gopher_repetition lesson; measured 134 s vs 36 s at the 50k-doc
    # scale probe). Intervals are merged and disjoint, so the union size
    # is just Σ(e-s+1); e ≤ n-1 by construction (s ≤ n-W).
    covered = F.aggregate(
        intervals,
        F.lit(0).cast("long"),
        lambda a, iv: a + iv["e"] - iv["s"] + 1,
    )

    # Fold 2: intervals -> kept token slices (the gaps), then re-join.
    tok_col = _tokens()  # rebuilt from text; consumed once per slice below
    kacc0 = F.struct(
        F.lit(0).cast("long").alias("g0"),
        F.array().cast("array<string>").alias("kept"),
    )

    def _kmerge(a, iv):
        gap = F.slice(tok_col, (a["g0"] + 1).cast("int"), (iv["s"] - a["g0"]).cast("int"))
        return F.struct(
            (iv["e"] + 1).alias("g0"),
            F.concat(a["kept"], gap).alias("kept"),
        )

    kept = F.aggregate(
        intervals,
        kacc0,
        _kmerge,
        lambda a: F.concat(
            a["kept"],
            F.slice(
                tok_col,
                (a["g0"] + 1).cast("int"),
                F.greatest(F.col("n_tokens") - a["g0"], F.lit(0)).cast("int"),
            ),
        ),
    )
    return joined.select(
        "doc_id",
        "n_tokens",
        covered.alias("n_removed"),
        F.array_join(kept, " ").alias("text_clean"),
    )


def doc_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSFORM counterpart of ``doc_dup_span_stats`` (the same
    detect→transform pairing as doc_content_filter→doc_pii_redact):
    remove every token covered by a cross-document duplicated window and
    emit the scrubbed text — what exact-substring dedup actually does to
    a training corpus.

    The removal is LINEAR per document: the sorted start positions fold
    into merged disjoint ``[s, e]`` intervals (one O(|starts|) pass),
    then the kept text is the concatenation of the gap slices between
    intervals — never a per-token × per-interval membership test (which
    would be O(n²) on a fully-boilerplate document). Everything after
    the stats query's shuffles is map-side; the scrubbed text itself is
    compared cross-engine, pinning tokenization, interval union, and
    reconstruction bit-for-bit."""
    return dup_span_removal(_docs(spark, sf_dir))


DOC_DUP_SPAN_REMOVAL_SQL = f"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\r\\f]+') AS toks FROM documents
), occ AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         array_to_string(toks[i:i+{SPAN_W - 1}], ' ') AS win
  FROM tk, unnest(range(1, len(toks) - {SPAN_W - 2})) AS u(i)
), dup AS (
  SELECT win FROM occ GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2
), docc AS (
  SELECT o.doc_id, o.pos FROM occ o SEMI JOIN dup d ON o.win = d.win
), covered AS (
  SELECT DISTINCT doc_id, pos + v AS cpos
  FROM docc, unnest(range(0, {SPAN_W})) AS w(v)
), tok AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
  FROM tk, unnest(range(1, len(toks) + 1)) AS u(i)
), kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.cpos
  WHERE c.cpos IS NULL
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS text_clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) - COALESCE(a.n_kept, 0)
            AS BIGINT) AS n_removed,
       COALESCE(a.text_clean, '') AS text_clean
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id
"""


def doc_repetition_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters beyond the top-bigram share: top-3-gram
    and top-4-gram occurrence shares plus the duplicated-5-gram
    character share, each floored to basis points; ``keep`` requires all
    three under their Gopher thresholds. Entirely map-only (per-doc
    sorted-run folds); the DuckDB oracle keeps the groupBy formulation.

    Repartitioned first: the corpus is one scan split (single parquet
    row group) but the per-doc n-gram sort folds are the whole cost —
    single-split funnel (measured 4.6 s → sub-second at sf0.1)."""
    docs = _docs(spark, sf_dir).repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    toks = _tokens()
    n = F.size(toks)

    staged = docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.greatest(n - 2, F.lit(0)).cast("long").alias("n3"),
        F.greatest(n - 3, F.lit(0)).cast("long").alias("n4"),
        F.when(n >= 3, _top_run(_ngram_array(toks, n, 3)))
        .otherwise(F.lit(0).cast("long"))
        .alias("top3_n"),
        F.when(n >= 4, _top_run(_ngram_array(toks, n, 4)))
        .otherwise(F.lit(0).cast("long"))
        .alias("top4_n"),
        F.when(n >= 5, _dup_char_bp(_ngram_array(toks, n, 5)))
        .otherwise(F.lit(0).cast("long"))
        .alias("dup5_char_bp"),
    )
    bp = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0,
        F.floor(F.col(num) * 10000.0 / F.col(den) + 0.5).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    scored = staged.select(
        "doc_id",
        "n_tokens",
        bp("top3_n", "n3").alias("top3_bp"),
        bp("top4_n", "n4").alias("top4_bp"),
        "dup5_char_bp",
    )
    return scored.withColumn(
        "keep",
        F.when(
            (F.col("top3_bp") <= GOPHER_TOP3_MAX_BP)
            & (F.col("top4_bp") <= GOPHER_TOP4_MAX_BP)
            & (F.col("dup5_char_bp") <= GOPHER_DUP5_MAX_BP),
            1,
        ).otherwise(0),
    )


def _gram_cte(k: int) -> str:
    return f"""
  SELECT doc_id, array_to_string(toks[i:i+{k - 1}], ' ') AS g
  FROM tk, unnest(range(1, len(toks) - {k - 2})) AS u(i)
"""


DOC_REPETITION_SQL = f"""
WITH tk AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\r\\f]+') AS toks FROM documents
), g3 AS ({_gram_cte(3)}), g4 AS ({_gram_cte(4)}), g5 AS ({_gram_cte(5)}),
c3 AS (SELECT doc_id, MAX(c) AS top_n FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1),
c4 AS (SELECT doc_id, MAX(c) AS top_n FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM g4 GROUP BY 1, 2) GROUP BY 1),
c5 AS (SELECT doc_id,
              CAST(SUM(CASE WHEN c >= 2 THEN c * glen ELSE 0 END) AS BIGINT) AS dup_chars,
              CAST(SUM(c * glen) AS BIGINT) AS all_chars
       FROM (SELECT doc_id, g, COUNT(*) AS c, len(g) AS glen FROM g5 GROUP BY 1, 2)
       GROUP BY 1)
SELECT d.doc_id,
       CAST(len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) AS BIGINT) AS n_tokens,
       COALESCE(CASE WHEN len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) >= 3
            THEN CAST(floor(c3.top_n * 10000.0
                 / (len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) - 2) + 0.5) AS BIGINT)
            END, 0) AS top3_bp,
       COALESCE(CASE WHEN len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) >= 4
            THEN CAST(floor(c4.top_n * 10000.0
                 / (len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) - 3) + 0.5) AS BIGINT)
            END, 0) AS top4_bp,
       COALESCE(CASE WHEN c5.all_chars > 0
            THEN CAST(floor(c5.dup_chars * 10000.0 / c5.all_chars + 0.5) AS BIGINT)
            END, 0) AS dup5_char_bp
       , CAST(CASE WHEN
           COALESCE(CASE WHEN len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) >= 3
                THEN floor(c3.top_n * 10000.0
                     / (len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) - 2) + 0.5) END, 0)
                <= {GOPHER_TOP3_MAX_BP}
           AND COALESCE(CASE WHEN len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) >= 4
                THEN floor(c4.top_n * 10000.0
                     / (len(regexp_split_to_array(trim(d.text), '[ \\t\\n\\r\\f]+')) - 3) + 0.5) END, 0)
                <= {GOPHER_TOP4_MAX_BP}
           AND COALESCE(CASE WHEN c5.all_chars > 0
                THEN floor(c5.dup_chars * 10000.0 / c5.all_chars + 0.5) END, 0)
                <= {GOPHER_DUP5_MAX_BP}
           THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM documents d
LEFT JOIN c3 ON d.doc_id = c3.doc_id
LEFT JOIN c4 ON d.doc_id = c4.doc_id
LEFT JOIN c5 ON d.doc_id = c5.doc_id
ORDER BY d.doc_id
"""


QUERIES = {
    "doc_dup_span_stats": doc_dup_span_stats,
    "doc_dup_span_removal": doc_dup_span_removal,
    "doc_repetition_suite": doc_repetition_suite,
}

ORACLES = {
    "doc_dup_span_stats": DOC_DUP_SPAN_SQL,
    "doc_dup_span_removal": DOC_DUP_SPAN_REMOVAL_SQL,
    "doc_repetition_suite": DOC_REPETITION_SQL,
}
