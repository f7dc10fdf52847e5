"""JSONL/CSV landing-zone ingestion: corrupt rows are quarantined, not
dropped or fatal; good rows parse to the declared schema."""

from __future__ import annotations

from pyspark.sql.types import LongType, StringType, StructField, StructType

from molgraphdb_spark.sources.ingest import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_quarantine,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

JSONL = """\
{"doc_id": 1, "text": "hello world", "lang": "en"}
{"doc_id": 2, "text": "bonjour", "lang": "fr"}
this is not json at all
{"doc_id": 3, "text": "ok", "lang": "en"
{"doc_id": 4, "text": "fine", "lang": "de"}
"""

CSV = """\
doc_id,text,lang
1,hello world,en
2,bonjour,fr
not_a_number,broken,xx
4,fine,de
"""


def test_jsonl_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(JSONL)
    df = read_jsonl(spark, str(p), SCHEMA)
    good, bad = split_quarantine(df)
    rows = {r.doc_id: r.text for r in good.collect()}
    assert rows == {1: "hello world", 2: "bonjour", 4: "fine"}
    assert CORRUPT_COL not in good.columns
    raw = [r.raw_record for r in bad.collect()]
    assert len(raw) == 2
    assert any("not json" in r for r in raw)
    # nothing silently lost: good + bad == input lines
    assert good.count() + bad.count() == 5


def test_csv_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(CSV)
    df = read_csv(spark, str(p), SCHEMA)
    good, bad = split_quarantine(df)
    rows = {r.doc_id: r.lang for r in good.collect()}
    assert rows == {1: "en", 2: "fr", 4: "de"}
    assert bad.count() == 1
    assert "not_a_number" in bad.first().raw_record


def test_good_rows_roundtrip_to_parquet(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(JSONL)
    good, _ = split_quarantine(read_jsonl(spark, str(p), SCHEMA))
    out = tmp_path / "out.parquet"
    good.write.mode("overwrite").parquet(str(out))
    back = spark.read.parquet(str(out))
    assert back.count() == 3
    assert [f.name for f in back.schema.fields] == ["doc_id", "text", "lang"]


def test_binary_file_landing(spark, tmp_path):
    from molgraphdb_spark.sources.ingest import read_binary_files

    blobs = {"a.img": b"\x89PNGfake", "b.img": b"\x00\x01\x02", "c.txt": b"notes"}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)
    df = read_binary_files(spark, str(tmp_path), "*.img")
    rows = {r.uri.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}  # glob filter applied
    for name, r in rows.items():
        assert bytes(r.content) == blobs[name]
        assert r.n_bytes == len(blobs[name])


def test_binary_file_metadata_only_prunes_content(spark, tmp_path):
    from molgraphdb_spark.sources.ingest import read_binary_files

    (tmp_path / "x.img").write_bytes(b"12345")
    df = read_binary_files(spark, str(tmp_path), "*.img").select("uri", "n_bytes")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan  # payload bytes pruned from the scan
    assert df.collect()[0].n_bytes == 5
