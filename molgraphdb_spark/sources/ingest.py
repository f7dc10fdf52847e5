"""Raw-file ingestion: JSONL and CSV readers with corrupt-record
quarantine — the landing-zone boundary of a training-data pipeline
(raw crawls/exports arrive as JSON lines or CSV long before they are
parquet).

Design (100 TB):
- Explicit schema always — schema inference is a full extra pass over
  the data and non-deterministic under sampling; the landing schema is
  part of the pipeline contract.
- PERMISSIVE mode with ``columnNameOfCorruptRecord``: malformed rows
  are captured, not dropped (DROPMALFORMED silently loses data) and
  not fatal (FAILFAST kills a 100 TB job for one bad line). The
  good/bad split is two filters over ONE scan lineage — Catalyst
  prunes the corrupt column from the good branch.
- Both formats are splittable line-oriented text: parallelism is
  byte-range splits, no coordination. (Gzipped inputs are NOT
  splittable — a real deployment recompresses to zstd-framed or
  splits upstream; documented, not handled here.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines reader: declared schema + captured corrupt records."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True, sep: str = ","
) -> DataFrame:
    """CSV reader: declared schema + captured corrupt records."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): good rows with the corrupt column pruned,
    bad rows as (raw_record) for repair/audit.

    The DataFrame is lazily cached first: Spark (since 2.3) rejects
    queries that reference ONLY the internal corrupt-record column of
    a raw JSON/CSV scan ([UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    RECORD_COLUMN]) — caching materializes the parsed+raw pair once,
    which is also what you want operationally: one pass over the
    landing files serves both branches."""
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad


def read_binary_files(
    spark: SparkSession, path: str, pattern: str = "*"
) -> DataFrame:
    """Raw binary landing reader (images/audio/video files as they
    arrive from a crawl or vendor drop): Spark's built-in
    ``binaryFile`` source, projected to the manifest shape the
    multimodal family consumes (queries/multimodal_queries.py) —
    (uri, n_bytes, modified_at, content binary).

    Scale notes (100 TB of binaries):
    - binaryFile is NOT splittable: one file never spans tasks, and
      small files are grouped per task up to
      ``spark.sql.files.maxPartitionBytes`` — the small-file problem
      is absorbed by task grouping, huge single files are the
      anti-pattern (shard upstream).
    - Metadata-only queries (counts, size histograms, pathGlob
      audits) prune ``content``: the source reads file STATUS, not
      bytes, when the column isn't referenced — same
      metadata-never-touches-payload property the manifest queries
      are plan-tested for.
    - ``spark.sql.binaryFile.maxLength`` guards against a single
      multi-GB object blowing task memory; oversized payloads belong
      in object storage with (uri, byte_range) rows instead.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select(
            F.col("path").alias("uri"),
            F.col("length").alias("n_bytes"),
            F.col("modificationTime").alias("modified_at"),
            F.col("content"),
        )
    )
