"""SQLite → Spark ingest bridge for the reference's native artifacts.

The reference persists everything in single-file SQLite databases:
``molecular_relations`` + ``metadata`` (main.py:144–169) and the
subgraph catalog ``subgraphs`` (mcs.py:81–97,
``molecular_subgraphs.db`` at mcs.py:429/693). A user migrating from
the reference brings exactly these files, so parity needs an ingest
path even though parquet is this engine's canonical format.

No JDBC driver jar ships in this environment, so the bridge uses
stdlib ``sqlite3`` → Arrow → parquet staging → ``spark.read.parquet``:

- Extraction is inherently single-node: SQLite is one file with one
  writer lock — there is no distributed read of a .db file, with or
  without JDBC. What matters at scale is that extraction is a ONE-TIME
  O(file) pass that lands splittable parquet; every downstream query
  is then fully distributed. (With a driver jar on a real cluster,
  ``spark.read.format("jdbc")`` with rowid-range partitioning is the
  drop-in alternative; the staged-parquet shape downstream is
  identical.)
- Rows are streamed in ``batch_rows`` chunks, each chunk one parquet
  row-group — the bridge never holds the full table in memory, and a
  multi-GB relations table lands as a multi-file dataset Spark splits
  across executors.
- Written through an atomic tmp→rename so a crashed ingest never
  leaves a half-staged dataset where a reader expects one.
"""

from __future__ import annotations

import os
import sqlite3
import tempfile
from contextlib import closing

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

#: Rows per staged Arrow batch / parquet row-group.
DEFAULT_BATCH_ROWS = 250_000

_SQLITE_TO_ARROW = {
    "INTEGER": pa.int64(),
    "TEXT": pa.string(),
    "REAL": pa.float64(),
    "BLOB": pa.binary(),
    # SQLite "NUMERIC" affinity can hold anything; stage as string and
    # let the caller cast — lossless, never a silent truncation.
    "NUMERIC": pa.string(),
}


def list_tables(db_path: str) -> list[str]:
    """User tables in the database (sqlite internal tables excluded)."""
    with sqlite3.connect(db_path) as conn:
        rows = conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table' "
            "AND name NOT LIKE 'sqlite_%' ORDER BY name"
        ).fetchall()
    return [r[0] for r in rows]


def _arrow_schema(conn: sqlite3.Connection, table: str) -> pa.Schema:
    cols = conn.execute(f"PRAGMA table_info({_qident(table)})").fetchall()
    if not cols:
        raise ValueError(f"no such table in SQLite db: {table!r}")
    fields = []
    for _, name, decl, *_ in cols:
        base = (decl or "").split("(")[0].strip().upper()
        fields.append(pa.field(name, _SQLITE_TO_ARROW.get(base, pa.string())))
    return pa.schema(fields)


def _qident(name: str) -> str:
    """Quote an identifier; reject names that could escape the quoting
    (table names come from sqlite_master, but be strict anyway)."""
    if '"' in name or "\x00" in name:
        raise ValueError(f"bad identifier: {name!r}")
    return f'"{name}"'


def stage_table(
    db_path: str,
    table: str,
    out_dir: str,
    batch_rows: int = DEFAULT_BATCH_ROWS,
) -> str:
    """Extract one SQLite table to a parquet dataset directory
    (``out_dir/<table>.parquet/part-*.parquet``); returns the dataset
    path. Streams in batches — O(batch) memory regardless of table
    size. Atomic: stages into a tmp dir and renames into place."""
    dest = os.path.join(out_dir, f"{table}.parquet")
    os.makedirs(out_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{table}-ingest-", dir=out_dir)
    try:
        with sqlite3.connect(db_path) as conn:
            schema = _arrow_schema(conn, table)
            cur = conn.execute(f"SELECT * FROM {_qident(table)}")
            part = 0
            while True:
                rows = cur.fetchmany(batch_rows)
                if not rows and part > 0:
                    break
                cols = list(zip(*rows)) if rows else [[] for _ in schema]
                batch = pa.table(
                    {
                        f.name: pa.array(list(c), type=f.type)
                        for f, c in zip(schema, cols)
                    }
                )
                pq.write_table(batch, os.path.join(tmp, f"part-{part:05d}.parquet"))
                part += 1
                if len(rows) < batch_rows:
                    break
        if os.path.isdir(dest):
            raise FileExistsError(f"refusing to overwrite existing dataset {dest}")
        os.rename(tmp, dest)
    finally:
        if os.path.isdir(tmp):
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return dest


def ingest_sqlite(
    spark: SparkSession,
    db_path: str,
    out_dir: str,
    tables: list[str] | None = None,
    batch_rows: int = DEFAULT_BATCH_ROWS,
) -> dict[str, DataFrame]:
    """Migrate a reference SQLite database into Spark: stage every
    (or the named) table as parquet under ``out_dir`` and return
    {table: DataFrame}. The returned frames are ordinary parquet scans
    — column-pruned, predicate-pushed, splittable."""
    out: dict[str, DataFrame] = {}
    for table in tables if tables is not None else list_tables(db_path):
        path = stage_table(db_path, table, out_dir, batch_rows=batch_rows)
        out[table] = spark.read.parquet(path)
    return out


# --- export direction: Spark → SQLite -------------------------------

_SPARK_TO_SQLITE = {
    "tinyint": "INTEGER",
    "smallint": "INTEGER",
    "int": "INTEGER",
    "bigint": "INTEGER",
    "boolean": "INTEGER",
    "float": "REAL",
    "double": "REAL",
    "string": "TEXT",
    "binary": "BLOB",
    "date": "TEXT",
    "timestamp": "TEXT",
    "timestamp_ntz": "TEXT",
}


def export_sqlite(
    df: DataFrame,
    db_path: str,
    table: str,
    batch_rows: int = DEFAULT_BATCH_ROWS,
    mode: str = "error",
) -> int:
    """Export a DataFrame into a SQLite table — the return leg of the
    migration bridge, so results computed here flow back into the
    reference's single-file tooling (main.py:144–169 consumes exactly
    such .db files). Returns the row count written.

    Egress is inherently single-writer (one SQLite file, one write
    lock) — the same boundary as ``stage_table``'s extraction, in
    reverse. The stream is ``toLocalIterator`` over the computed
    partitions, inserted in ``batch_rows`` chunks: O(batch) driver
    memory regardless of result size. This is an EGRESS sink for
    result-sized relations (catalogs, cluster maps, metrics) — parquet
    remains the canonical format for corpus-sized data. ``mode``:
    ``error`` (default, refuse existing table), ``overwrite`` (drop +
    recreate), ``append``. Atomicity: rows land in one transaction —
    a crashed export leaves the previous table state, never half."""
    dtypes = dict(df.dtypes)
    unsupported = {c: t for c, t in dtypes.items() if t not in _SPARK_TO_SQLITE}
    if unsupported:
        raise ValueError(
            f"no SQLite mapping for columns {unsupported}; cast arrays/"
            "structs/decimals to a scalar type before export"
        )
    cols = df.columns
    ddl_cols = ", ".join(f"{_qident(c)} {_SPARK_TO_SQLITE[dtypes[c]]}" for c in cols)
    placeholders = ", ".join("?" for _ in cols)
    norm = {
        "date": lambda v: v.isoformat() if v is not None else None,
        "timestamp": lambda v: v.isoformat(sep=" ") if v is not None else None,
        "timestamp_ntz": lambda v: v.isoformat(sep=" ") if v is not None else None,
        "boolean": lambda v: int(v) if v is not None else None,
    }
    casts = [norm.get(dtypes[c]) for c in cols]
    n = 0
    # contextlib.closing: sqlite3's own context manager only commits /
    # rolls back — it leaves the file handle open after return
    with closing(sqlite3.connect(db_path)) as conn:
        exists = conn.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (table,)
        ).fetchone()
        if exists and mode == "error":
            raise FileExistsError(f"table {table!r} already exists in {db_path}")
        if exists and mode == "overwrite":
            conn.execute(f"DROP TABLE {_qident(table)}")
        conn.execute(f"CREATE TABLE IF NOT EXISTS {_qident(table)} ({ddl_cols})")
        buf: list[tuple] = []

        def _flush():
            nonlocal n
            if buf:
                conn.executemany(
                    f"INSERT INTO {_qident(table)} VALUES ({placeholders})", buf
                )
                n += len(buf)
                buf.clear()

        for row in df.toLocalIterator(prefetchPartitions=True):
            buf.append(
                tuple(f(v) if f else v for f, v in zip(casts, row))
            )
            if len(buf) >= batch_rows:
                _flush()
        _flush()
        conn.commit()
    return n
