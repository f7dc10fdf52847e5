"""Fuzzy record linkage (entity resolution) over the ``part`` name
dictionary: block → verify → cluster, the canonical three-stage ER
pipeline a training-data curation stack needs for source/author/URL
canonicalization.

Same candidate-generation idea as the dedup family's shingle inverted
index (queries/dedup.py) and the reference's hash-set overlap join
(/root/reference/src/mcs.py:310-314), applied to *string identity*
instead of set similarity: the verifier is Levenshtein edit distance
(built-in ``F.levenshtein`` — JVM-side, whole-stage codegen; identical
unit-cost semantics to DuckDB's ``levenshtein``), and cluster
resolution reuses the min-label connected-components operator
(operators/graph.py) exactly as LSH dedup does.

Scale notes (100 TB):
- The match runs on the DISTINCT name dictionary, not the row stream.
  At corpus scale the dictionary is orders of magnitude smaller than
  the table (names follow a Zipf law); resolving the dictionary once
  and broadcast-joining the assignment back is the standard shape.
- Blocking is a token inverted index (names sharing >= 1 word become
  candidates), so the pair universe is Sigma(names-per-token^2), never
  |dict|^2. Hot tokens would inherit the same absolute posting-list
  cap as MAX_SHINGLE_DF if the dictionary vocabulary were open-ended;
  the part vocabulary is closed so the cap is not wired here.
  Token blocking is a RECALL HEURISTIC: a pair within edit distance 3
  that shares no whole word (both words mutated) is missed. The
  complete alternative for ED<=k is pigeonhole segment blocking
  (PassJoin: k+1 segments, one must match exactly) — same join shape,
  more candidate keys; dedup.py's SimHash pigeonhole family shows the
  pattern. Both engines apply the identical blocking, so oracles stay
  exact about the *defined* semantics.
- Verification (levenshtein) is O(len^2) per candidate pair but pairs
  are bounded by blocking; the filter runs inside codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from molgraphdb_spark.operators.graph import connected_components
from molgraphdb_spark.session import tune
from molgraphdb_spark.sources.tables import load_table

#: Verify threshold: candidate pairs within this edit distance match.
MAX_EDIT_DIST = 3


def _name_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct part-name dictionary."""
    tune(spark)
    return load_table(spark, sf_dir, "part").select(
        F.col("p_name").alias("name")
    ).filter(F.col("name").isNotNull()).distinct()


def _fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(name_a, name_b, edit_dist) for token-blocked pairs within
    MAX_EDIT_DIST, name_a < name_b. The token explode/distinct is the
    inverted index; the self-equi-join on token is candidate
    generation; levenshtein is the verifier."""
    names = _name_dict(spark, sf_dir)
    tok = names.select(
        "name", F.explode(F.split("name", " ")).alias("t")
    ).distinct()
    a = tok.select(F.col("name").alias("name_a"), "t")
    b = tok.select(F.col("name").alias("name_b"), "t")
    cand = (
        a.join(b, "t")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
    ).filter(F.col("edit_dist") <= MAX_EDIT_DIST)


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified fuzzy-match pairs over the part-name dictionary."""
    return _fuzzy_pairs(spark, sf_dir).orderBy("name_a", "name_b")


FUZZY_NAME_PAIRS_SQL = f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL),
tok AS (SELECT DISTINCT name, unnest(string_split(name, ' ')) AS t FROM names),
cand AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM tok a JOIN tok b ON a.t = b.t AND a.name < b.name
)
SELECT name_a, name_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
FROM cand
WHERE levenshtein(name_a, name_b) <= {MAX_EDIT_DIST}
ORDER BY name_a, name_b
"""


def fuzzy_name_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity clusters: connected components over the verified fuzzy
    match graph, labelled by the lexicographically smallest member
    (the canonical surface form), with member count and the number of
    ``part`` rows the cluster covers.

    The CC runs on the tiny dictionary-pair graph; the part rowcount
    comes from broadcast-joining the (name -> canonical) assignment
    back onto the full table — dictionary-resolve-then-broadcast, the
    only shape that survives when the base table is 100 TB."""
    pairs = _fuzzy_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("name_a").alias("src"), F.col("name_b").alias("dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    comp = connected_components(edges).select(
        F.col("id").alias("name"), F.col("component").alias("canonical_name")
    )
    parts = load_table(spark, sf_dir, "part").select(F.col("p_name").alias("name"))
    per_part = parts.join(F.broadcast(comp), "name", "inner")
    n_parts = per_part.groupBy("canonical_name").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    n_names = comp.groupBy("canonical_name").agg(
        F.count(F.lit(1)).alias("n_names")
    )
    return (
        n_names.join(n_parts, "canonical_name")
        .select("canonical_name", "n_names", "n_parts")
        .orderBy("canonical_name")
    )


FUZZY_NAME_CLUSTERS_SQL = f"""
WITH RECURSIVE
names AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL),
tok AS (SELECT DISTINCT name, unnest(string_split(name, ' ')) AS t FROM names),
pairs AS (
  SELECT DISTINCT a.name AS name_a, b.name AS name_b
  FROM tok a JOIN tok b ON a.t = b.t AND a.name < b.name
),
matched AS (
  SELECT name_a, name_b FROM pairs
  WHERE levenshtein(name_a, name_b) <= {MAX_EDIT_DIST}
),
edges AS (
  SELECT name_a AS src, name_b AS dst FROM matched
  UNION
  SELECT name_b, name_a FROM matched
),
verts AS (SELECT DISTINCT src AS id FROM edges),
reach(a, b) AS (
  SELECT id, id FROM verts
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
comp AS (SELECT a AS name, MIN(b) AS canonical_name FROM reach GROUP BY a),
nn AS (SELECT canonical_name, COUNT(*) AS n_names FROM comp GROUP BY canonical_name),
np AS (
  SELECT c.canonical_name, COUNT(*) AS n_parts
  FROM part p JOIN comp c ON p.p_name = c.name
  GROUP BY c.canonical_name
)
SELECT nn.canonical_name, nn.n_names, np.n_parts
FROM nn JOIN np ON nn.canonical_name = np.canonical_name
ORDER BY nn.canonical_name
"""


#: Sorted-neighborhood sliding-window size: pairs within this many
#: rank positions of each other become candidates.
SN_WINDOW = 8


def _sn_candidates(names: DataFrame, key, w: int) -> DataFrame:
    """Sorted-neighborhood candidate pairs for ONE blocking key: rank
    the dictionary by ``key`` (name as tiebreak), block b = rank div w
    with each row copied into block b+1 as context, pair only rows
    within (0 < Δrank < w). Returns (name_a, name_b) in rank order of
    ``key``. The segmented-scan idiom — per-block work ≤ 2w², one
    equi-join on the block key, NO partitionless window (the global
    rank is the exact two-pass distributed rank)."""
    from molgraphdb_spark.operators.ranking import exact_div, with_order_stats

    keyed = names.withColumn("_k", key)
    ranked, _tot = with_order_stats(
        keyed, [F.asc("_k"), F.asc("name")], rank_col="i"
    )
    pos = F.col("i") - 1
    blk = exact_div(pos, w)
    rows = ranked.withColumn("_b", F.explode(F.array(blk, blk + 1))).withColumn(
        "_own", (F.col("_b") == blk).cast("int")
    )
    x = rows.select(
        F.col("_b").alias("b"), F.col("name").alias("name_a"), F.col("i").alias("ia")
    )
    y = rows.filter(F.col("_own") == 1).select(
        F.col("_b").alias("b"), F.col("name").alias("name_b"), F.col("i").alias("ib")
    )
    return (
        x.join(y, "b")
        .filter((F.col("ib") > F.col("ia")) & (F.col("ib") - F.col("ia") < F.lit(w)))
        .select("name_a", "name_b")
    )


def fuzzy_name_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND standard ER blocking strategy (Hernández & Stolfo
    1995, "The merge/purge problem for large databases"): sort the
    dictionary by the blocking key (the name itself) and compare only
    records within a sliding window of SN_WINDOW positions — the
    complement of token blocking (which misses pairs sharing no whole
    word; sorted-neighborhood instead misses pairs differing in their
    PREFIX, catching typo tails token blocking drops). Production ER
    runs both and unions the candidates (multi-pass SN).

    Scale shape: the global rank is the exact two-pass distributed
    rank (operators/ranking.py — NO partitionless window over the
    dictionary); the window pairing is the segmented-scan idiom
    (with_group_rows_frame's): block b = rank div W, each row also
    copied into block b+1 as context, pairs generated ONLY against a
    block's own rows under (0 < Δrank < W) — every qualifying pair
    found exactly once (same block, or across the boundary via the
    context copy), per-block work ≤ 2W², and the whole pairing is one
    equi-join on the block key. Verification (levenshtein ≤ 3) stays
    in codegen."""
    names = _name_dict(spark, sf_dir)
    return (
        _sn_candidates(names, F.col("name"), SN_WINDOW)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= MAX_EDIT_DIST)
        .orderBy("name_a", "name_b")
    )


FUZZY_SN_SQL = f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL),
r AS (SELECT name, ROW_NUMBER() OVER (ORDER BY name) AS i FROM names)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist
FROM r a JOIN r b ON b.i > a.i AND b.i - a.i < {SN_WINDOW}
WHERE levenshtein(a.name, b.name) <= {MAX_EDIT_DIST}
ORDER BY name_a, name_b
"""


def fuzzy_name_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-pass sorted neighborhood — the form whose recall
    Hernández & Stolfo actually published: several passes with
    DIFFERENT sort keys, candidate sets unioned BEFORE one shared
    verification. Pass 1 sorts by the name itself (misses pairs whose
    PREFIX differs — they land far apart); pass 2 sorts by the
    REVERSED name (prefix-differing, suffix-sharing pairs become
    neighbors; misses suffix-differing ones) — each key's blind spot
    is the other's sweet spot. Emits per-pass provenance flags
    (in_forward / in_reverse) so the recall contribution of each pass
    is visible in the result itself; pairs are normalized
    least/greatest since the two passes rank in different orders.

    Scale shape: two independent segmented-scan pairings (each the
    single-pass shape: exact two-pass rank + one block equi-join, no
    partitionless window), a pair-key groupBy for the union, one
    codegen levenshtein verify — pass count multiplies candidate
    volume linearly, never quadratically."""
    names = _name_dict(spark, sf_dir)
    fwd = _sn_candidates(names, F.col("name"), SN_WINDOW).select(
        F.least("name_a", "name_b").alias("name_a"),
        F.greatest("name_a", "name_b").alias("name_b"),
        F.lit(1).alias("in_forward"),
        F.lit(0).alias("in_reverse"),
    )
    rev = _sn_candidates(names, F.reverse(F.col("name")), SN_WINDOW).select(
        F.least("name_a", "name_b").alias("name_a"),
        F.greatest("name_a", "name_b").alias("name_b"),
        F.lit(0).alias("in_forward"),
        F.lit(1).alias("in_reverse"),
    )
    cand = (
        fwd.unionByName(rev)
        .groupBy("name_a", "name_b")
        .agg(
            F.max("in_forward").alias("in_forward"),
            F.max("in_reverse").alias("in_reverse"),
        )
    )
    return (
        cand.select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
            "in_forward",
            "in_reverse",
        )
        .filter(F.col("edit_dist") <= MAX_EDIT_DIST)
        .orderBy("name_a", "name_b")
    )


FUZZY_MULTIPASS_SQL = f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL),
rf AS (SELECT name, ROW_NUMBER() OVER (ORDER BY name) AS i FROM names),
cf AS (
  SELECT least(a.name, b.name) AS name_a, greatest(a.name, b.name) AS name_b,
         1 AS in_forward, 0 AS in_reverse
  FROM rf a JOIN rf b ON b.i > a.i AND b.i - a.i < {SN_WINDOW}
),
rr AS (SELECT name, ROW_NUMBER() OVER (ORDER BY reverse(name), name) AS i FROM names),
cr AS (
  SELECT least(a.name, b.name) AS name_a, greatest(a.name, b.name) AS name_b,
         0 AS in_forward, 1 AS in_reverse
  FROM rr a JOIN rr b ON b.i > a.i AND b.i - a.i < {SN_WINDOW}
),
cand AS (
  SELECT name_a, name_b,
         CAST(MAX(in_forward) AS INT) AS in_forward,
         CAST(MAX(in_reverse) AS INT) AS in_reverse
  FROM (SELECT * FROM cf UNION ALL SELECT * FROM cr)
  GROUP BY name_a, name_b
)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist,
       in_forward, in_reverse
FROM cand
WHERE levenshtein(name_a, name_b) <= {MAX_EDIT_DIST}
ORDER BY name_a, name_b
"""


QUERIES = {
    "fuzzy_name_pairs": fuzzy_name_pairs,
    "fuzzy_name_multipass": fuzzy_name_multipass,
    "fuzzy_name_sorted_neighborhood": fuzzy_name_sorted_neighborhood,
    "fuzzy_name_clusters": fuzzy_name_clusters,
}

ORACLES = {
    "fuzzy_name_pairs": FUZZY_NAME_PAIRS_SQL,
    "fuzzy_name_multipass": FUZZY_MULTIPASS_SQL,
    "fuzzy_name_sorted_neighborhood": FUZZY_SN_SQL,
    "fuzzy_name_clusters": FUZZY_NAME_CLUSTERS_SQL,
}
