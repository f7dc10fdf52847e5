"""Similarity search over the ``embeddings`` table (SURVEY.md §7 M4:
brute-force cosine top-k baseline + LSH-bucketed scale path).

All vector math is built-in higher-order functions (``zip_with`` +
``aggregate`` left-fold) on ``array<float>`` cast to double — JVM-side,
no Python UDF. The left-fold matches DuckDB's sequential
``list_dot_product`` bit-for-bit (verified empirically), so oracles can
hash-compare; outputs are still emitted as basis-point integers
(floor(x·1e6+0.5)) for belt-and-braces determinism.

Scale notes (100 TB):
- Brute force is the CORRECTNESS baseline: a broadcast of the (small)
  query set against the full corpus — linear scan, no shuffle of the
  big side, top-k via per-partition window. Right answer, O(Q·N·d).
- The LSH path buckets vectors by the sign pattern of leading
  dimensions (random-hyperplane LSH specialized to axis-aligned
  planes: the sign bit of a stored float is exact, so bucketing costs
  zero arithmetic and is engine-portable). Candidates are an equi-join
  on the bucket key — N² never materializes. Real deployments would
  use learned/IVF centroids for the coarse quantizer; the join shape
  is identical (assignment → equi-join → rerank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from molgraphdb_spark.session import tune
from molgraphdb_spark.sources.tables import load_table

#: Leading dimensions whose sign bits form the LSH bucket key.
LSH_SIGN_DIMS = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same accumulation order as
    DuckDB's list_dot_product, hence bit-identical results."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _sign_bucket(v: Column, dims: int = LSH_SIGN_DIMS) -> Column:
    """Bucket id: concatenated sign bits of the first ``dims`` entries."""
    return F.concat(
        *[(F.element_at(v, i + 1) >= 0).cast("int").cast("string") for i in range(dims)]
    )


_COS_SQL = (
    "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)
_EMB_CTE = "e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)"
_SIGN_SQL = " || ".join(
    f"CAST(CAST(v[{i + 1}] >= 0 AS INT) AS VARCHAR)" for i in range(LSH_SIGN_DIMS)
)


# --------------------------------------------------------------------------
# Brute-force cosine top-k: the exact baseline.
# --------------------------------------------------------------------------
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nearest neighbors (cosine) for query vectors vec_id < 5
    against the whole corpus. The query side is broadcast; the corpus
    is scanned once; ranking is a window over the query id."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = F.broadcast(queries).crossJoin(emb).filter(F.col("vec_id") != F.col("query_id"))
    cos = _cosine(F.col("qv"), F.col("v"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.floor(cos * 1_000_000 + 0.5).alias("cosine_ubp"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_ubp"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "cosine_ubp", "rk")
        .orderBy("query_id", "rk")
    )


SIM_TOPK_SQL = f"""
WITH {_EMB_CTE},
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(floor(({_COS_SQL}) * 1000000 + 0.5) AS BIGINT) AS cosine_ubp
  FROM e a JOIN e b ON b.vec_id != a.vec_id
  WHERE a.vec_id < 5
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_ubp DESC, neighbor_id ASC) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, cosine_ubp, rk
FROM ranked WHERE rk <= 3
ORDER BY query_id, rk
"""


# --------------------------------------------------------------------------
# LSH-bucketed ANN: the scale path.
# --------------------------------------------------------------------------
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-1 neighbor per query (vec_id < 50), restricted
    to candidates sharing the 8-bit sign bucket (≈N/256 of the corpus).
    Join on the bucket key replaces the cross join — this is the shape
    that survives 100 TB. Recall is partial by design (ANN)."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _sign_bucket(F.col("v")))
    queries = emb.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    cands = emb.select(F.col("vec_id").alias("neighbor_id"), "v", "bucket")
    pairs = queries.join(cands, "bucket").filter(F.col("neighbor_id") != F.col("query_id"))
    cos = _cosine(F.col("qv"), F.col("v"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.floor(cos * 1_000_000 + 0.5).alias("cosine_ubp"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_ubp"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", "neighbor_id", "cosine_ubp")
        .orderBy("query_id")
    )


SIM_LSH_SQL = f"""
WITH {_EMB_CTE},
bucketed AS (SELECT vec_id, v, {_SIGN_SQL} AS bucket FROM e),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(floor(({_COS_SQL}) * 1000000 + 0.5) AS BIGINT) AS cosine_ubp
  FROM bucketed a JOIN bucketed b ON a.bucket = b.bucket AND b.vec_id != a.vec_id
  WHERE a.vec_id < 50
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine_ubp DESC, neighbor_id ASC) AS rk
  FROM pairs
)
SELECT query_id, neighbor_id, cosine_ubp
FROM ranked WHERE rk = 1
ORDER BY query_id
"""


# --------------------------------------------------------------------------
# Similarity histogram: same-label vs cross-label pair counts by band.
# --------------------------------------------------------------------------
def similarity_label_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributional check on a vec_id<150 sample: pair counts per
    0.1-cosine band, split by same/different label. Integer counting
    over deterministic per-pair values — engine-portable aggregation."""
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 150)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"), F.col("label").alias("la"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"), F.col("label").alias("lb"))
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
    cos = _cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select(
            (F.col("la") == F.col("lb")).cast("int").alias("same_label"),
            F.floor(cos * 10).cast("long").alias("cos_band"),
        )
        .groupBy("same_label", "cos_band")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("same_label", "cos_band")
    )


SIM_BANDS_SQL = f"""
WITH {_EMB_CTE},
pairs AS (
  SELECT CAST(a.label = b.label AS INT) AS same_label,
         CAST(floor(({_COS_SQL}) * 10) AS BIGINT) AS cos_band
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE a.vec_id < 150 AND b.vec_id < 150
)
SELECT same_label, cos_band, COUNT(*) AS n_pairs
FROM pairs GROUP BY same_label, cos_band
ORDER BY same_label, cos_band
"""


QUERIES = {
    "similarity_cosine_topk": similarity_cosine_topk,
    "similarity_lsh_topk": similarity_lsh_topk,
    "similarity_label_bands": similarity_label_bands,
}

ORACLES = {
    "similarity_cosine_topk": SIM_TOPK_SQL,
    "similarity_lsh_topk": SIM_LSH_SQL,
    "similarity_label_bands": SIM_BANDS_SQL,
}
