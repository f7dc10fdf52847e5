"""End-to-end pipeline integration: the components composed the way a
real corpus build runs them —

    JSONL landing → quarantine → stage as documents → exact-dedup
    keep-best → duplicated-span scrub → hive-partitioned write →
    SQLite summary export

Each stage is tested elsewhere in isolation; this test pins that they
compose (schemas line up, accounting is loss-free across stages, and
the final artifacts are readable by both Spark and sqlite3)."""

from __future__ import annotations

import os
import sqlite3

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from molgraphdb_spark.queries.dedup import dedup_exact, dedup_keep_best
from molgraphdb_spark.queries.spans import doc_dup_span_removal
from molgraphdb_spark.sources.ingest import read_jsonl, split_quarantine
from molgraphdb_spark.sources.sqlite_ingest import export_sqlite
from molgraphdb_spark.sources.writers import write_partitioned

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)

#: 8-token boilerplate shared by two otherwise-unique docs.
BOILER = "b1 b2 b3 b4 b5 b6 b7 b8"


@pytest.fixture(scope="module")
def landing_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    lines = [
        '{"doc_id": 0, "text": "u1 u2 u3 u4 u5 u6 u7 u8 u9", "lang": "en", "source": "srcA"}',
        '{"doc_id": 1, "text": "u1 u2 u3 u4 u5 u6 u7 u8 u9", "lang": "en", "source": "srcA"}',  # exact dup of 0
        f'{{"doc_id": 2, "text": "x1 x2 {BOILER} x3", "lang": "en", "source": "srcB"}}',
        f'{{"doc_id": 3, "text": "y1 {BOILER} y2 y3", "lang": "es", "source": "srcB"}}',
        '{"doc_id": 4, "text": "solo clean doc nothing shared", "lang": "es", "source": "srcA"}',
        "this line is not json {{{",  # -> quarantine
        '{"doc_id": oops}',  # -> quarantine
    ]
    (d / "part-000.jsonl").write_text("\n".join(lines))
    return str(d)


@pytest.fixture(scope="module")
def staged_sf_dir(spark, sf_dir, landing_dir, tmp_path_factory):
    """Landing → quarantine → documents.parquet staging."""
    raw = read_jsonl(spark, landing_dir, DOC_SCHEMA)
    good, bad = split_quarantine(raw)
    assert bad.count() == 2  # loss-free: both corrupt lines captured
    assert good.count() == 5
    d = tmp_path_factory.mktemp("staged_sf")
    good.withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    for t in (
        "region nation customer supplier part orders lineitem events embeddings".split()
    ):
        os.symlink(os.path.join(sf_dir, f"{t}.parquet"), str(d / f"{t}.parquet"))
    return str(d)


def test_dedup_then_scrub_accounting(spark, staged_sf_dir):
    # exact dedup: docs 0 and 1 form the only duplicate group; keeper
    # is the smallest doc_id
    groups = dedup_exact(spark, staged_sf_dir).filter(F.col("is_dup_group") == 1)
    assert groups.count() == 2  # two members of one group
    best = {r["keep_doc_id"]: r.asDict() for r in dedup_keep_best(spark, staged_sf_dir).collect()}
    # the exact-dup cluster {0, 1} keeps the smaller id (equal length)
    assert best[0]["n_docs"] == 2 and best[0]["dropped_chars"] > 0

    # span scrub: the shared boilerplate vanishes from docs 2 and 3,
    # unique docs pass through untouched
    scrubbed = {
        r["doc_id"]: r.asDict()
        for r in doc_dup_span_removal(spark, staged_sf_dir).collect()
    }
    assert scrubbed[2]["text_clean"] == "x1 x2 x3"
    assert scrubbed[3]["text_clean"] == "y1 y2 y3"
    assert scrubbed[2]["n_removed"] == 8 and scrubbed[3]["n_removed"] == 8
    assert scrubbed[4]["n_removed"] == 0
    # (docs 0/1 are exact duplicates of each other, so their whole text
    # is cross-doc duplicated — span scrub flags all 9 tokens; a real
    # pipeline runs keep-best FIRST so only one survives to this stage)
    assert scrubbed[0]["n_removed"] == 9


def test_partitioned_write_and_sqlite_export(spark, staged_sf_dir, tmp_path):
    scrubbed = doc_dup_span_removal(spark, staged_sf_dir)
    docs = spark.read.parquet(os.path.join(staged_sf_dir, "documents.parquet"))
    final = docs.join(
        scrubbed.select("doc_id", "n_removed", "text_clean"), "doc_id"
    ).select("doc_id", F.col("text_clean").alias("text"), "lang", "source", "n_removed")

    out = str(tmp_path / "corpus")
    write_partitioned(final, out, ["lang"])
    assert sorted(
        e for e in os.listdir(out) if e.startswith("lang=")
    ) == ["lang=en", "lang=es"]
    back = spark.read.parquet(out)
    assert back.count() == 5
    # partition pruning survives the pipeline's write
    plan = back.filter(F.col("lang") == "es")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    # summary flows back to single-file tooling
    db = str(tmp_path / "report.db")
    n = export_sqlite(
        final.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_removed").alias("tokens_scrubbed"),
        ),
        db,
        "corpus_report",
    )
    assert n == 2
    rows = sqlite3.connect(db).execute(
        "SELECT lang, n_docs, tokens_scrubbed FROM corpus_report ORDER BY lang"
    ).fetchall()
    assert rows == [("en", 3, 9 + 9 + 8), ("es", 2, 8 + 0)]
