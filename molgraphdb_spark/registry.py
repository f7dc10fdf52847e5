"""Central registry assembling queries() / oracle_sql() for the driver.

Each query module exposes ``QUERIES: dict[str, callable]`` and
``ORACLES: dict[str, str]`` (oracle omitted → driver runs a weaker
rows-only check). Modules are imported defensively so one broken
optional dependency never takes down the whole surface.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Order matters: the round-1 driver verified only the first 50 registry
# entries, leaving the similarity/graph/chem/multimodal surface without a
# hard CORRECTNESS row. Those modules now lead so every previously
# unchecked query lands inside any driver cap; the long relational tail
# (fully driver-green in CORRECTNESS_r01.json) sits last, where losing a
# re-check costs nothing.
_QUERY_MODULES = [
    "molgraphdb_spark.queries.similarity",
    "molgraphdb_spark.queries.graph_queries",
    "molgraphdb_spark.queries.chem_queries",
    "molgraphdb_spark.queries.multimodal_queries",
    "molgraphdb_spark.queries.dedup",
    "molgraphdb_spark.queries.events",
    "molgraphdb_spark.queries.temporal",
    "molgraphdb_spark.queries.text",
    "molgraphdb_spark.queries.setops",
    "molgraphdb_spark.queries.reshape",
    "molgraphdb_spark.queries.relational",
]


def _collect() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _QUERY_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ModuleNotFoundError:
            continue  # module not built yet
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} from {modname}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    queries, oracles = _collect()
    return {k: v for k, v in oracles.items() if k in queries}
