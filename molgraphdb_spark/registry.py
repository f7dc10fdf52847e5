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

# Order matters: the driver verifies only the first 50 registry entries
# per round. _PRIORITY rotates the verification window each round so the
# oldest/weakest rows get re-checked first; _QUERY_MODULES supplies the
# remainder in module order.
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

# Round-4 verification window (first 50). Round 3 proved that
# "green last round + code untouched" does not imply "still runs" —
# the driver regenerated events.parquet with a new timestamp encoding
# and three rotated-out temporal queries broke silently. So r4 leads
# with the four NTZ-broken-now-fixed queries, then re-verifies ALL 31
# entries rotated out of r3 (staleness reset to 0 across the board),
# then new/changed code this round. Everything past the cap was green
# in r3 itself (1-round staleness), and a full-registry plan-build
# smoke (tests/test_registry_smoke.py) now guards the rotated-out tail
# against environment drift between rounds.
_PRIORITY = [
    # NTZ-broken in r3 (sessionize red in-window; asof/range/ohlc broken
    # out-of-window) — fixed this round, must re-verify first
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
    "events_ohlc_resample",
    # remaining events family (same _events reader path, rotated out of r3)
    "events_hourly_counts",
    "events_tumbling_window",
    "events_json_extract",
    "events_lag_lead_delta",
    "events_gap_fill",
    # rest of the 31 rotated-out-of-r3 entries
    "similarity_lsh_topk",
    "similarity_label_bands",
    "graph_triangle_count",
    "graph_bfs_path_lengths",
    "graph_degree_histogram",
    "graph_common_suppliers",
    "chem_pharma_profile",
    "chem_pharma_overlap",
    "chem_subgraph_display",
    "chem_subgraph_counts",
    "chem_tanimoto_pairs",
    "chem_subgraph_catalog_hist",
    "mm_feature_extract",
    "mm_frame_sample",
    "doc_token_stats",
    "doc_quality_scores",
    "doc_language_id",
    "doc_fingerprint",
    "doc_ngram_topk",
    # code changed this round (dedup_clusters perf dispatch)
    "dedup_clusters",
    # new queries this round debut here
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_revenue",
    "doc_tfidf_top_terms",
    "doc_content_filter",
    "doc_decontaminate_overlap",
    "dedup_keep_best",
    "q7_volume_shipping",
    "q13_customer_distribution",
    "q18_large_orders",
    "q19_discounted_revenue",
    "q22_sales_opportunity",
    "events_sliding_window",
    "events_rolling_hour_avg",
    "embedding_norm_stats",
    "profile_lineitem",
    "events_funnel",
    "neardup_containment_pairs",
    "doc_unigram_logprob",
    "mm_chunk_windows",
    "events_twap",
    # The three setop_* queries and ntile_customer_value yield their
    # slots to the newest debuts: they are the lowest-risk rotated-out
    # entries (trivial ops on tiny/stable inputs, r2-green, untouched
    # since r1, plan-smoke-guarded, and still value-hash-checked every
    # session by tests/test_oracle_parity.py at sf0.001); they
    # re-enter the r5 window first.
]


def _reorder(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


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
    return _reorder(queries), oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    queries, oracles = _collect()
    return {k: v for k, v in oracles.items() if k in queries}
