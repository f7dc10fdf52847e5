"""QUERIES.md must stay in sync with the live registry — the index is
generated, and a stale index misleads exactly the reader it exists
for. Regenerating is one command: python tools/gen_query_index.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_query_index_in_sync():
    import gen_query_index as g
    from molgraphdb_spark.registry import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    path = os.path.join(os.path.dirname(__file__), "..", "QUERIES.md")
    text = open(path).read()
    assert f"**{len(queries)} queries, {len(oracles)} oracle-checked," in text
    for name in queries:
        assert f"`{name}`" in text, f"{name} missing from QUERIES.md — regenerate"
