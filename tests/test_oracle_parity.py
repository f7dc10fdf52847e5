"""Every queries() entry with an oracle must hash-match DuckDB at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from parity import value_hash  # noqa: E402

from molgraphdb_spark.registry import all_oracles, all_queries  # noqa: E402
from molgraphdb_spark.sources.tables import TABLE_NAMES  # noqa: E402

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    from molgraphdb_spark.queries.graph_queries import GATE_SCALE_ONLY

    sdf = QUERIES[name](spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"row count {len(srows)} != {len(drows)}"
    assert sorted(scols) == sorted(dcols)
    if name in GATE_SCALE_ONLY and "sf0.01" not in sf_dir.rstrip("/"):
        return  # VALUES literal encodes the sf0.01 result; hash checked there
    assert value_hash(scols, srows) == value_hash(dcols, drows)


def test_no_rows_only_queries_remain():
    # r9: every registry query has a value-hash oracle (the k-core
    # peel was the last rows-only entry; it gained a recursive-CTE
    # oracle). This replaces the old parametrized rows-only smoke
    # test, whose parameter set is now empty — a NEW oracle-less query
    # fails test_registry_smoke's missing-oracle gate, not this one.
    assert sorted(set(QUERIES) - set(ORACLES)) == []


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
