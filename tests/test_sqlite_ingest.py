"""SQLite → Spark migration bridge (reference artifact parity:
molecular_relations/metadata per main.py:144–169, subgraphs per
mcs.py:81–97)."""

import sqlite3

import pytest

from molgraphdb_spark.sources.sqlite_ingest import (
    ingest_sqlite,
    list_tables,
    stage_table,
)


@pytest.fixture()
def ref_db(tmp_path):
    """A database with the reference's exact DDL and a few rows."""
    db = str(tmp_path / "molecular_subgraphs.db")
    conn = sqlite3.connect(db)
    conn.executescript(
        """
        CREATE TABLE molecular_relations (
            id INTEGER PRIMARY KEY AUTOINCREMENT,
            smiles TEXT NOT NULL,
            target_smiles TEXT NOT NULL,
            diff_atom INTEGER NOT NULL,
            diff_bond INTEGER NOT NULL,
            subs INTEGER NOT NULL DEFAULT 0,
            UNIQUE(smiles, target_smiles)
        );
        CREATE TABLE metadata (key TEXT PRIMARY KEY, value TEXT);
        CREATE TABLE subgraphs (
            id INTEGER PRIMARY KEY AUTOINCREMENT,
            subgraph_hash TEXT UNIQUE,
            size INTEGER,
            adjacency_matrix TEXT,
            parent_molecules TEXT,
            frequency INTEGER DEFAULT 1
        );
        """
    )
    conn.executemany(
        "INSERT INTO molecular_relations(smiles, target_smiles, diff_atom, diff_bond, subs)"
        " VALUES (?,?,?,?,?)",
        [("CCO", "CC", 1, 1, 0), ("CC", "C", 1, 1, 0), ("CCO", "CCN", 0, 0, 1)],
    )
    conn.execute("INSERT INTO metadata VALUES ('version', '1')")
    conn.commit()
    conn.close()
    return db


def test_list_tables(ref_db):
    assert list_tables(ref_db) == ["metadata", "molecular_relations", "subgraphs"]


def test_ingest_reference_db(spark, tmp_path, ref_db):
    dfs = ingest_sqlite(spark, ref_db, str(tmp_path / "staged"))
    rel = dfs["molecular_relations"]
    assert [f.name for f in rel.schema.fields] == [
        "id", "smiles", "target_smiles", "diff_atom", "diff_bond", "subs",
    ]
    rows = {(r.smiles, r.target_smiles, r.diff_atom, r.diff_bond, r.subs)
            for r in rel.collect()}
    assert rows == {("CCO", "CC", 1, 1, 0), ("CC", "C", 1, 1, 0), ("CCO", "CCN", 0, 0, 1)}
    # empty table keeps its schema
    assert dfs["subgraphs"].count() == 0
    assert "subgraph_hash" in dfs["subgraphs"].columns
    # and the result is an ordinary parquet scan usable in joins
    joined = rel.join(dfs["metadata"], rel.subs == 1, "left")
    assert joined.count() == 3


def test_stage_table_batching_and_atomicity(spark, tmp_path, ref_db):
    # batch_rows=2 over 3 rows -> 2 parquet parts, values intact
    import os

    path = stage_table(ref_db, "molecular_relations", str(tmp_path / "b"), batch_rows=2)
    parts = [p for p in os.listdir(path) if p.endswith(".parquet")]
    assert len(parts) == 2
    assert spark.read.parquet(path).count() == 3
    # refuses to clobber an existing dataset
    with pytest.raises(FileExistsError):
        stage_table(ref_db, "molecular_relations", str(tmp_path / "b"))
    # unknown table is a clear error
    with pytest.raises(ValueError, match="no such table"):
        stage_table(ref_db, "nope", str(tmp_path / "c"))


def test_export_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from molgraphdb_spark.sources.sqlite_ingest import export_sqlite

    df = spark.range(10).select(
        F.col("id"),
        F.concat(F.lit("s"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
        (F.col("id") % 2 == 0).alias("flag"),
    )
    db = str(tmp_path / "export.db")
    n = export_sqlite(df, db, "results")
    assert n == 10
    # round-trip back through the ingest leg: identical content
    back = ingest_sqlite(spark, db, str(tmp_path / "staged"))["results"]
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(
        (r["id"], r["name"], r["score"], int(r["flag"])) for r in df.collect()
    )
    assert got == want


def test_export_modes(spark, tmp_path):
    from molgraphdb_spark.sources.sqlite_ingest import export_sqlite

    df = spark.range(3).select("id")
    db = str(tmp_path / "modes.db")
    export_sqlite(df, db, "t")
    with pytest.raises(FileExistsError):
        export_sqlite(df, db, "t")  # mode='error' default
    assert export_sqlite(df, db, "t", mode="append") == 3
    assert sqlite3.connect(db).execute("SELECT COUNT(*) FROM t").fetchone()[0] == 6
    assert export_sqlite(df, db, "t", mode="overwrite") == 3
    assert sqlite3.connect(db).execute("SELECT COUNT(*) FROM t").fetchone()[0] == 3


def test_export_rejects_unmappable_types(spark, tmp_path):
    from pyspark.sql import functions as F

    from molgraphdb_spark.sources.sqlite_ingest import export_sqlite

    df = spark.range(2).select(F.array("id").alias("a"))
    with pytest.raises(ValueError, match="no SQLite mapping"):
        export_sqlite(df, str(tmp_path / "x.db"), "t")
