"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet dir, then compares row count, sorted-column
schema, and an order-insensitive value hash. Use while iterating:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from molgraphdb_spark.session import get_spark
from molgraphdb_spark.sources.tables import TABLE_NAMES


def _norm_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


#: Spark dtype strings that are plain integers (no int128 counterpart exists).
_INTEGRAL_SPARK = {"tinyint", "smallint", "int", "bigint"}


def lint_oracle_types(spark_dtypes: dict[str, str], duck_desc: list[tuple]) -> list[str]:
    """Flag DuckDB output types the driver's hash renders differently than Spark's.

    The twice-shipped bug class (r2 commit 748f6bb, r4 verdict item 1): a bare
    DuckDB ``SUM(BIGINT)`` is typed HUGEINT (int128), which survives a
    ``fetchall()``-based comparison but fails the driver's type-faithful hash.
    Rules: HUGEINT/UHUGEINT is always an error (Spark has no int128 — the
    oracle must CAST), and DECIMAL paired with an integral Spark column is an
    error (the renderings diverge: '5.00' vs 5).
    """
    problems = []
    for row in duck_desc:
        dname, dtype = row[0], str(row[1]).upper()
        s = spark_dtypes.get(dname)
        if s is None:
            continue  # column-set mismatch is reported by the schema check
        if dtype in ("HUGEINT", "UHUGEINT"):
            problems.append(f"{dname}: DuckDB {dtype} vs Spark {s} — CAST the oracle expression to BIGINT")
        elif dtype.startswith("DECIMAL") and s in _INTEGRAL_SPARK:
            problems.append(f"{dname}: DuckDB {dtype} vs Spark {s} — cast one side so renderings agree")
    return problems


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else (set(sys.argv[1:]) if sys.argv[1:] and not os.path.isdir(sys.argv[1]) else set())

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    spark = get_spark("parity")

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_desc = con.execute("DESCRIBE " + oracles[name]).fetchall()
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        lint = lint_oracle_types(dict(sdf.dtypes), duck_desc)
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        sh, dh = value_hash(scols, srows), value_hash(dcols, drows)
        ok_hash = sh == dh
        status = "OK  " if (ok_count and ok_schema and ok_hash and not lint) else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} schema={ok_schema} hash={ok_hash}"
            f" typelint={'clean' if not lint else 'DIRTY'} ({time.time()-t0:.1f}s)"
        )
        for p in lint:
            print(f"   typelint: {p}")
        if status == "FAIL":
            failures.append(name)
            if not ok_schema:
                print(f"   spark cols: {sorted(scols)}\n   duck  cols: {sorted(dcols)}")
            elif not ok_hash and srows and drows:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ss = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in srows)
                ds = sorted("|".join(_norm_cell(r[i]) for i in order_d) for r in drows)
                diff = [(a, b) for a, b in zip(ss, ds) if a != b][:3]
                for a, b in diff:
                    print(f"   spark: {a}\n   duck : {b}")
                if len(ss) != len(ds):
                    print(f"   (row counts differ: {len(ss)} vs {len(ds)})")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
