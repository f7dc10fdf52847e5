"""Training-data mixture operators over ``documents``: deterministic
rebalancing sampling and sequence-packing offsets — the two steps
between a deduplicated corpus and a tokenizer shard list in an LLM
data pipeline (extension surface alongside dedup/text/similarity;
same first-class treatment: oracle-checked, scale-annotated).

Determinism rule (SURVEY.md §7 risk 3): sampling decisions use an
integer mixing hash of doc_id (Knuth multiplicative, identical
arithmetic in Spark and DuckDB) — never rand()/PYTHONHASHSEED — so
the sample is reproducible at any parallelism and testable against
the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from molgraphdb_spark.session import tune
from molgraphdb_spark.sources.tables import load_table

#: Deterministic per-doc uniform in [0, 1e6): Knuth multiplicative
#: hash of doc_id. doc_id fits in 40 bits across every sf, so the
#: product stays inside int64 on both engines.
_HASH_MOD = 1_000_000


def _u_milli(col):
    return (col * 2654435761) % _HASH_MOD


# --------------------------------------------------------------------------
# Mixture sampling: equalize language contributions.
# --------------------------------------------------------------------------
def doc_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to an equal-count language mixture: every
    language is downsampled to the size of the smallest one with a
    deterministic hash-threshold filter (u(doc_id) < rate).

    Output: per-language accounting (input count, rate in ppm of the
    hash modulus, sampled count) — the mixture report a pipeline logs
    when it builds a training shard list.

    Scale: one two-level aggregation computes the per-language counts
    (map-side combined), the min is a 1-row broadcast, the rate join
    is a broadcast of |langs| rows, and the sampling filter is
    map-only over the corpus — the documents themselves are never
    shuffled. Exactly-target-size sampling would need a per-language
    rank (sort); the hash-threshold form trades ±√n wobble for a
    shuffle-free plan, the standard at-scale choice."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # cache(): counts feeds both the target scalar and the rates join
    # (tiny: |langs| rows) — uncached, the corpus count agg runs twice.
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_in")).cache()
    target = counts.agg(F.min("n_in").alias("target_n"))
    rates = counts.crossJoin(F.broadcast(target)).select(
        "lang",
        "n_in",
        "target_n",
        F.least(
            F.lit(_HASH_MOD),
            F.floor(F.col("target_n") * _HASH_MOD / F.col("n_in")).cast("long"),
        ).alias("rate_ppm"),
    )
    sampled = (
        docs.join(F.broadcast(rates), "lang")
        .filter(_u_milli(F.col("doc_id")) < F.col("rate_ppm"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        rates.join(sampled, "lang", "left")
        .select("lang", "n_in", "target_n", "rate_ppm", F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"))
        .orderBy("lang")
    )


DOC_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_in FROM documents GROUP BY lang
), rates AS (
  SELECT lang, n_in,
         (SELECT MIN(n_in) FROM counts) AS target_n,
         LEAST({_HASH_MOD}, CAST(floor((SELECT MIN(n_in) FROM counts) * {_HASH_MOD} / n_in) AS BIGINT)) AS rate_ppm
  FROM counts
), sampled AS (
  SELECT d.lang, COUNT(*) AS n_sampled
  FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE (d.doc_id * 2654435761) % {_HASH_MOD} < r.rate_ppm
  GROUP BY d.lang
)
SELECT r.lang, r.n_in, r.target_n, r.rate_ppm, COALESCE(s.n_sampled, 0) AS n_sampled
FROM rates r LEFT JOIN sampled s ON r.lang = s.lang
ORDER BY r.lang
"""


# --------------------------------------------------------------------------
# Sequence packing: concat-then-chunk offsets.
# --------------------------------------------------------------------------
PACK_CAP = 512  #: context window size in (whitespace) tokens


def doc_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing, offset form: within each source,
    documents are concatenated in doc_id order and cut into
    ``PACK_CAP``-token context windows; each doc's [start_tok,
    end_tok) span and the bins it lands in fall out of one running
    token cumsum. This is the standard "concat and chunk" packing —
    bins are full by construction and a document may straddle a bin
    boundary (first_bin < last_bin).

    Scale: sources are FEW and each grows with the corpus, so a
    per-source window would still sort every source in ONE task (the
    partitioned edge of the r6 funnel class). The running sum instead
    rides the grouped two-pass distributed operator
    (operators/ranking.py::with_grouped_order_stats): one global range
    order over (source, doc_id), per-source offsets from the broadcast
    group dictionary — no task ever holds a whole source, same exact
    sequential packing semantics (oracle unchanged)."""
    from molgraphdb_spark.operators.ranking import with_grouped_order_stats

    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).cast("long").alias("n_tok"),
    )
    docs = with_grouped_order_stats(
        docs, ["source"], [F.asc("doc_id")], cumsum={"n_tok": "_end"}
    )
    end = F.col("_end")
    start = end - F.col("n_tok")
    return docs.select(
        "doc_id",
        "source",
        "n_tok",
        start.alias("start_tok"),
        end.alias("end_tok"),
        F.floor(start / PACK_CAP).cast("long").alias("first_bin"),
        F.floor((end - 1) / PACK_CAP).cast("long").alias("last_bin"),
        (F.floor((end - 1) / PACK_CAP) - F.floor(start / PACK_CAP) + 1).cast("long").alias("n_bins_spanned"),
    ).orderBy("source", "doc_id")


DOC_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER w - n_tok AS start_tok,
         SUM(n_tok) OVER w AS end_tok
  FROM t
  WINDOW w AS (PARTITION BY source ORDER BY doc_id)
)
SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(end_tok AS BIGINT) AS end_tok,
       CAST(floor(start_tok / {PACK_CAP}) AS BIGINT) AS first_bin,
       CAST(floor((end_tok - 1) / {PACK_CAP}) AS BIGINT) AS last_bin,
       CAST(floor((end_tok - 1) / {PACK_CAP}) - floor(start_tok / {PACK_CAP}) + 1 AS BIGINT) AS n_bins_spanned
FROM c
ORDER BY source, doc_id
"""


# --------------------------------------------------------------------------
# Retention cohorts (orders): the classic cohort matrix.
# --------------------------------------------------------------------------
def orders_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly retention cohort matrix over orders: customers grouped
    by the quarter of their FIRST order (the cohort), counted as
    retained in each subsequent quarter they ordered again — the
    standard growth-analytics rollup, here quarterly so the matrix
    stays dense at every sf.

    Scale: the first-order derivation is a groupBy(custkey) min
    (map-side combined) joined back to orders ON custkey — both sides
    hash-partition on custkey, one co-partitioned shuffle each; the
    cohort matrix agg is a tiny (cohort × period) grid. No windows, no
    fact-side broadcast, integer period arithmetic on both engines."""
    tune(spark)
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    q = F.date_trunc("quarter", "o_orderdate")
    first = orders.groupBy("o_custkey").agg(F.min(q).alias("cohort_q"))
    period = (
        (F.year(q) - F.year("cohort_q")) * 4 + (F.quarter(q) - F.quarter("cohort_q"))
    ).cast("long")
    return (
        orders.join(first, "o_custkey")
        .select("o_custkey", F.col("cohort_q").alias("cohort"), period.alias("period_q"))
        .distinct()
        .groupBy("cohort", "period_q")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("cohort", "period_q")
    )


ORDERS_RETENTION_SQL = """
WITH first AS (
  SELECT o_custkey, MIN(date_trunc('quarter', o_orderdate)) AS cohort_q
  FROM orders GROUP BY o_custkey
), activity AS (
  SELECT DISTINCT o.o_custkey,
         f.cohort_q AS cohort,
         (year(date_trunc('quarter', o.o_orderdate)) - year(f.cohort_q)) * 4
           + (quarter(date_trunc('quarter', o.o_orderdate)) - quarter(f.cohort_q)) AS period_q
  FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
)
SELECT CAST(cohort AS TIMESTAMP) AS cohort, CAST(period_q AS BIGINT) AS period_q,
       COUNT(*) AS n_customers
FROM activity
GROUP BY cohort, period_q
ORDER BY cohort, period_q
"""


# --------------------------------------------------------------------------
# Deterministic train/val/test split.
# --------------------------------------------------------------------------
SPLIT_VAL_PPM = 10_000   #: 1% validation
SPLIT_TEST_PPM = 10_000  #: 1% test


def doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: the same mixing hash as
    doc_mixture_sample partitions [0, 1e6) into test | val | train
    ranges — membership is a pure function of doc_id, so the split is
    stable across runs, re-shards, and engine versions (the property
    leakage audits depend on: a doc can NEVER migrate between splits).
    Output: per (split, lang) counts + char volume — the shard
    manifest summary. Map-only over the corpus + a 15-group agg."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    u = _u_milli(F.col("doc_id"))
    split = (
        F.when(u < SPLIT_TEST_PPM, "test")
        .when(u < SPLIT_TEST_PPM + SPLIT_VAL_PPM, "val")
        .otherwise("train")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


DOC_SPLIT_SQL = f"""
SELECT CASE WHEN (doc_id * 2654435761) % {_HASH_MOD} < {SPLIT_TEST_PPM} THEN 'test'
            WHEN (doc_id * 2654435761) % {_HASH_MOD} < {SPLIT_TEST_PPM + SPLIT_VAL_PPM} THEN 'val'
            ELSE 'train' END AS split,
       lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""


# --------------------------------------------------------------------------
# Mixture diagnostics: per-source language-mix entropy.
# --------------------------------------------------------------------------
def source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Shannon entropy of the language mix — the diversity
    diagnostic a curation dashboard tracks next to the KL drift monitor
    (``source_token_divergence``): a source whose entropy collapses has
    become monolingual; one whose entropy jumps is mixing in new
    languages (often a crawl-routing bug).

    Cross-engine exactness (the KL precedent): each language's
    ``-p·ln(p)`` term is floored to integer MICRO-nats before the
    per-source summation, so the result is order-free and
    partition-invariant.

    Scale: one (source, lang) aggregation with map-side combine (the
    keyspace is |sources|×|langs| — tiny at any corpus size), a
    broadcast join of the per-source totals, and a final tiny groupBy.
    The corpus crosses exactly one shuffle."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("source", "lang")
    counts = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    term = F.floor(-p * F.log(p) * 1_000_000 + 0.5).cast("long")
    return (
        counts.join(F.broadcast(totals), "source")
        .select("source", "n", term.alias("term"))
        .groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.sum("term").cast("long").alias("entropy_micro"),
        )
        .orderBy("source")
    )


SOURCE_LANG_ENTROPY_SQL = """
WITH c AS (
  SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2
), t AS (
  SELECT source, SUM(n) AS tot FROM c GROUP BY 1
)
SELECT c.source,
       CAST(SUM(c.n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       CAST(SUM(CAST(floor(-(c.n * 1.0 / t.tot) * ln(c.n * 1.0 / t.tot) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS entropy_micro
FROM c JOIN t USING (source)
GROUP BY 1
ORDER BY source
"""


# --------------------------------------------------------------------------
# Budget-constrained quality selection: greedy top-quality per source.
# --------------------------------------------------------------------------
#: Per-source token budget for the selection report.
TOKEN_BUDGET = 5_000


def source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy budget allocation: each source contributes its
    highest-quality documents until a fixed token budget is spent —
    the selection step of a quality-weighted data mixture (rank by
    quality, take while the budget lasts; a document is taken iff it
    STARTS under budget, so every source contributes at least one).

    Quality is the alpha-character ratio in basis points (deterministic,
    JVM-side regexp); ties break by ascending doc_id. Output per
    source: candidate/selected counts, selected token mass, and the
    effective quality cutoff (min selected quality) — the knobs a
    mixture designer actually reads.

    Scale: sources are FEW and corpus-growing, so the per-source
    ranked running sum goes through the grouped two-pass distributed
    operator (with_grouped_order_stats — one global range order over
    (source, quality desc, doc_id), broadcast per-source offsets):
    even a single dominant source never serializes through one task,
    closing the skew note the old per-source window carried. Then one
    map-side-combined aggregation; the corpus crosses the wire once;
    oracle unchanged."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).cast("long").alias("n_tok"),
        F.coalesce(
            F.floor(
                F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
                * 10000
                / F.nullif(F.length("text"), F.lit(0))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("quality_bp"),
    )
    from molgraphdb_spark.operators.ranking import with_grouped_order_stats

    ranked = with_grouped_order_stats(
        docs,
        ["source"],
        [F.desc("quality_bp"), F.asc("doc_id")],
        cumsum={"n_tok": "_cum"},
    ).select(
        "source",
        "n_tok",
        "quality_bp",
        (F.col("_cum") - F.col("n_tok")).alias("cum_before"),
    )
    sel = F.col("cum_before") < TOKEN_BUDGET
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(sel.cast("long")).cast("long").alias("n_selected"),
            F.sum(F.when(sel, F.col("n_tok")).otherwise(0)).cast("long").alias("tok_selected"),
            F.min(F.when(sel, F.col("quality_bp"))).cast("long").alias("quality_cutoff_bp"),
        )
        .orderBy("source")
    )


SOURCE_TOKEN_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '[ \\t\\n\\r\\f]+')) AS n_tok,
         COALESCE(CAST(floor(
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 10000
           / NULLIF(length(text), 0)) AS BIGINT), 0) AS quality_bp
  FROM documents
), ranked AS (
  SELECT source, n_tok, quality_bp,
         SUM(n_tok) OVER (PARTITION BY source
                          ORDER BY quality_bp DESC, doc_id ASC) - n_tok AS cum_before
  FROM t
)
SELECT source,
       COUNT(*) AS n_candidates,
       CAST(SUM(CASE WHEN cum_before < {TOKEN_BUDGET} THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(SUM(CASE WHEN cum_before < {TOKEN_BUDGET} THEN n_tok ELSE 0 END) AS BIGINT) AS tok_selected,
       CAST(MIN(CASE WHEN cum_before < {TOKEN_BUDGET} THEN quality_bp END) AS BIGINT) AS quality_cutoff_bp
FROM ranked
GROUP BY source
ORDER BY source
"""


# --------------------------------------------------------------------------
# Weighted systematic sampling: exact integer threshold crossings.
# --------------------------------------------------------------------------
#: Target sample size for the weighted systematic sample.
WSAMPLE_TARGET = 50


def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional systematic sample of ~WSAMPLE_TARGET
    documents (weight = n_chars): walk the corpus in doc_id order and
    take a document whenever its weight interval crosses one of
    ``target`` evenly-spaced marks on the cumulative-weight axis —
    long docs can cross several marks (recorded in ``n_marks``), so
    inclusion probability is proportional to weight, the property a
    char-budget-aware downsampler needs.

    Exactness: selection is ``floor(cum·target/W) > floor((cum−w)·
    target/W)`` in 64-bit integers only (cum·target ≤ ~10¹⁰ at sf0.1)
    — no RNG, no float division, bit-identical in any engine and at
    any parallelism. The infamous alternative (exponential-race keys,
    u^(1/w)) needs ln() whose last ulp differs between engines.

    Scale: the corpus-sized cumulative weight is computed by the exact
    two-pass distributed ranking operator (operators/ranking.py —
    ordered range buckets over doc_id, driver-side prefix offsets,
    bucket-partitioned window), NOT a partitionless window: the r6
    verdict's worst-of-family fix. The grand total falls out of pass 1
    as an exact driver literal (no extra global aggregate, no
    crossJoin). Bit-identical to the windowed formulation at any
    parallelism — the mark-crossing rule sees the same exact integer
    cumsum, so the oracle is unchanged. Output: per-source counts of
    selected docs + their weight share (the sample-composition report).
    """
    from molgraphdb_spark.operators.ranking import with_order_stats

    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("w")
    )
    cum, totals = with_order_stats(docs, [F.asc("doc_id")], cumsum={"w": "cum"})
    tw = totals["w"] or 1  # empty-corpus guard; no rows evaluate it
    # integer DIV, not float floor(/): the quotient must be the exact
    # integer division DuckDB's // computes (a double division could
    # land on the wrong side of a mark boundary in the last ulp)
    marks = F.expr(
        f"(cum * {WSAMPLE_TARGET}) DIV {tw} - ((cum - w) * {WSAMPLE_TARGET}) DIV {tw}"
    )
    return (
        cum.select("doc_id", "source", "w", marks.cast("long").alias("n_marks"))
        .filter(F.col("n_marks") > 0)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("w").cast("long").alias("w_selected"),
            F.sum("n_marks").cast("long").alias("marks_hit"),
        )
        .orderBy("source")
    )


DOC_WSAMPLE_SQL = f"""
WITH t AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
         SUM(CAST(n_chars AS BIGINT)) OVER (ORDER BY doc_id) AS cum,
         SUM(CAST(n_chars AS BIGINT)) OVER () AS tw
  FROM documents
), sel AS (
  SELECT doc_id, source, w,
         (cum * {WSAMPLE_TARGET}) // tw - ((cum - w) * {WSAMPLE_TARGET}) // tw AS n_marks
  FROM t
)
SELECT source, COUNT(*) AS n_selected,
       CAST(SUM(w) AS BIGINT) AS w_selected,
       CAST(SUM(n_marks) AS BIGINT) AS marks_hit
FROM sel WHERE n_marks > 0
GROUP BY source
ORDER BY source
"""


# --------------------------------------------------------------------------
# Weighted priority sampling (A-Res): reproducible WOR sample.
# --------------------------------------------------------------------------
#: Sample size for the weighted without-replacement sample.
PRIORITY_SAMPLE_K = 100


def doc_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via A-Res priorities
    (Efraimidis & Spirakis 2006): each document draws a deterministic
    uniform u from md5(doc_id) and gets priority u^(1/w) with weight
    w = n_chars; the top-k priorities are the sample. Complements
    doc_weighted_sample (systematic/with-replacement marks): A-Res is
    the WOR variant a holdout-set builder needs (no doc twice).

    Determinism: priorities compare as ln(u)/w (monotone in u^(1/w)),
    floored to integer micro units with identical operand order in
    both engines; md5 replaces rand() as everywhere in this module.
    The micro floor makes the boundary-ulp risk of ln() negligible
    (~2.5e-9 per row) and ties break on doc_id.

    Scale: map-only priority computation (no shuffle), global top-k
    via orderBy+limit — TakeOrderedAndProject, k-bounded per task,
    never a partitionless window."""
    tune(spark)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.col("n_chars") > 0))
        .select("doc_id", "source", "n_chars")
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(4294967296.0)  # (0, 1]
    key = F.floor(F.log(u) / F.col("n_chars") * 1_000_000).cast("long")
    return (
        docs.withColumn("priority_micro", key)
        .orderBy(F.desc("priority_micro"), F.asc("doc_id"))
        .limit(PRIORITY_SAMPLE_K)
    )


DOC_PRIORITY_SAMPLE_SQL = f"""
SELECT doc_id, source, n_chars,
       CAST(floor(
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) + 1)
            / 4294967296.0)
         / n_chars * 1000000) AS BIGINT) AS priority_micro
FROM documents
WHERE text IS NOT NULL AND n_chars > 0
ORDER BY priority_micro DESC, doc_id ASC
LIMIT {PRIORITY_SAMPLE_K}
"""


# --------------------------------------------------------------------------
# Temperature-scaled mixture weights: the α-sampling rebalance.
# --------------------------------------------------------------------------
def source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights (α = 0.5): each
    source's sampling weight ∝ tokens^α — the multilingual/multi-corpus
    rebalance (mT5, XLM-R use exactly this) that upsamples small
    sources without letting a dominant one swamp the mixture. Output
    per source: docs, token mass, natural share and temperature share
    (basis points) — natural vs temperature is the upsampling report a
    mixture designer reads.

    Determinism: tokens^0.5 is floor(sqrt(tokens)) — IEEE sqrt is
    correctly rounded and floor is exact below 2^52, so both engines
    produce the same integer; shares are positive-operand integer DIV.

    Scale: ONE map-side-combinable groupBy over the corpus (the only
    corpus-width pass), then totals via a broadcast single-row cross
    join over the ≤|sources| aggregated rows — no window, no second
    scan. The aggregated relation is localCheckpoint-ed (≤|sources|
    rows) because Spark reuses no exchange across its two references
    (totals + output): without it the corpus would scan twice."""
    tune(spark)
    per_src = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).cast("long")).alias(
                "tokens"
            ),
        )
        .withColumn("isq", F.floor(F.sqrt(F.col("tokens").cast("double"))).cast("long"))
        .localCheckpoint(eager=True)
    )
    totals = per_src.agg(
        F.sum("tokens").alias("tot_tok"), F.sum("isq").alias("tot_isq")
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.expr("CAST(tokens * 10000 DIV tot_tok AS BIGINT)").alias("natural_bp"),
            F.expr("CAST(isq * 10000 DIV tot_isq AS BIGINT)").alias("temperature_bp"),
        )
        .orderBy("source")
    )


SOURCE_TEMP_SQL = """
WITH per_src AS (
  SELECT source, COUNT(*)::BIGINT AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\f]+'))) AS BIGINT) AS tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source
),
w AS (SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS isq FROM per_src),
tot AS (SELECT CAST(SUM(tokens) AS BIGINT) AS tot_tok,
               CAST(SUM(isq) AS BIGINT) AS tot_isq FROM w)
SELECT source, n_docs, tokens,
       CAST(tokens * 10000 // tot_tok AS BIGINT) AS natural_bp,
       CAST(isq * 10000 // tot_isq AS BIGINT) AS temperature_bp
FROM w CROSS JOIN tot
ORDER BY source
"""


QUERIES = {
    "doc_mixture_sample": doc_mixture_sample,
    "source_temperature_weights": source_temperature_weights,
    "doc_priority_sample": doc_priority_sample,
    "source_lang_entropy": source_lang_entropy,
    "doc_pack_offsets": doc_pack_offsets,
    "orders_retention_cohorts": orders_retention_cohorts,
    "doc_split_assign": doc_split_assign,
    "source_token_budget": source_token_budget,
    "doc_weighted_sample": doc_weighted_sample,
}

ORACLES = {
    "doc_mixture_sample": DOC_MIXTURE_SQL,
    "source_temperature_weights": SOURCE_TEMP_SQL,
    "doc_priority_sample": DOC_PRIORITY_SAMPLE_SQL,
    "source_lang_entropy": SOURCE_LANG_ENTROPY_SQL,
    "doc_pack_offsets": DOC_PACK_SQL,
    "orders_retention_cohorts": ORDERS_RETENTION_SQL,
    "doc_split_assign": DOC_SPLIT_SQL,
    "source_token_budget": SOURCE_TOKEN_BUDGET_SQL,
    "doc_weighted_sample": DOC_WSAMPLE_SQL,
}
