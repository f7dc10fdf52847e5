"""Oracle type lint: every DuckDB oracle's declared output types must map
cleanly onto the Spark result's dtypes.

Round 4's lesson (second shipment of the same class — r2 commit 748f6bb
was the first): a bare DuckDB ``SUM(BIGINT)`` is typed HUGEINT (int128),
which a ``fetchall()``-based local comparison renders identically to a
Python int, but the driver's type-faithful hash does not. Three queries
shipped green locally and red remotely. This gate makes the class
unshippable: DuckDB ``DESCRIBE SELECT ...`` yields the declared types
without executing the query, and the Spark side needs only plan-build
(``df.dtypes``), so the full-registry sweep costs seconds.
"""

from __future__ import annotations

import duckdb
import pytest

from molgraphdb_spark.registry import all_oracles, all_queries
from molgraphdb_spark.sources.tables import TABLE_NAMES

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from parity import lint_oracle_types  # noqa: E402

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_types_map_to_spark(name, spark, sf_dir, duck):
    desc = duck.execute("DESCRIBE " + ORACLES[name]).fetchall()
    spark_dtypes = dict(QUERIES[name](spark, sf_dir).dtypes)
    problems = lint_oracle_types(spark_dtypes, desc)
    assert problems == [], f"{name}: " + "; ".join(problems)
