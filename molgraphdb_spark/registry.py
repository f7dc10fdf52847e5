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

# Round-3 verification window (first 50): the 7 rows red in
# CORRECTNESS_r02 (3 oracle-type hash fails, now cast; 4 newly-oracled
# no_oracle queries), then every query whose code or oracle changed this
# round, then the 28 relational-tail queries last verified in round 1,
# then the heaviest round-2-green algorithmic queries. The 28 entries
# past the cap are all round-2-green and untouched, so their staleness
# is exactly one round.
_PRIORITY = [
    # red in r02 — fixed this round
    "events_sessionize",
    "mm_metadata_summary",
    "similarity_ivf_recall",
    "graph_pagerank_top",
    "approx_distinct_parts",
    "chem_edit_expansion",
    "chem_exact_ged_pairs",
    # code/oracle touched this round
    "neardup_jaccard_pairs",
    "dedup_lsh_verified",
    "dedup_embedding_cosine",
    "graph_connected_components_summary",
    # new this round (must be verified on debut)
    "sample_stratified_docs",
    "doc_line_dedup_ratio",
    "doc_rare_token_ratio",
    # r1-only relational tail (verified r1, outside r2's window)
    "full_outer_nation_profile",
    "sample_systematic_orders",
    "pivot_status_by_priority",
    "unpivot_lineitem_measures",
    "grouping_sets_revenue",
    "quantiles_price_by_flag",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "filter_project_pushdown",
    "distinct_count_customers",
    "group_count_orderstatus",
    "topk_orders_per_customer",
    "multikey_sort_parts",
    "cross_pairs_nations",
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    "agg_stats_lineitem",
    "window_running_total",
    "rollup_region_nation",
    "case_bucket_orders",
    "string_funcs_customers",
    "orders_above_customer_avg",
    "orders_monthly_revenue",
    "ship_delay_stats",
    "supplier_part_sets",
    "cube_status_priority",
    "null_handling_discounts",
    # heaviest r2-green algorithmic queries fill the window
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "similarity_cosine_topk",
    "similarity_ivf_topk",
    # graph_triangle_count / graph_bfs_path_lengths / similarity_lsh_topk
    # rotated out to keep 50 entries: all r2-green and untouched this
    # round (1-round staleness, like the rest of the post-window tail)
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
