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
