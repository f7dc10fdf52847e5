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
    "molgraphdb_spark.queries.tpch_rest",
    "molgraphdb_spark.queries.mixing",
    "molgraphdb_spark.queries.linkage",
    "molgraphdb_spark.queries.spans",
]

# Round-9 verification window (first 50), per the r8 verdict item 1.
# Assembled from the computed staleness ledger (tools/
# gen_query_index.py over all CORRECTNESS_r*.json). Composition:
# - The 3 never-driver-checked post-window r8 debuts LEAD (the r7/r8
#   precedent): graph_adamic_adar (also changed-code this round — the
#   pairing join now attaches the weight dictionary pre-pairing for
#   the hot-key cap), doc_priority_sample, dedup_cross_source_matrix.
# - The 8 r8 funnel-sweep rewrites (changed code, parity-green but
#   never driver-gated post-rewrite): dedup_embedding_cosine,
#   dedup_simhash_pairs, approx_distinct_parts, doc_repetition_suite,
#   quantiles_price_by_flag, approx_quantiles_price, profile_lineitem
#   (also the last r4-stale row), graph_triangle_count (re-changed in
#   r9: dispatch via operators/graph.triangle_count).
# - graph_kcore_summary: first round with a value-hash oracle (the
#   recursive-CTE peel) — must enter the window to flip its driver
#   row from rows-only to hash-checked.
# - Changed-code r9 re-gates: ALL nine chem queries (chem/mol.py
#   gained Hückel 4n+2 perception + the E/Z reference-uniqueness fix;
#   chem_pharma_profile's golden was re-derived) and events_ewma (its
#   with_group_rows_frame operator gained the last-segment context
#   cap).
# - The fourteen r9/r9b debuts (doc_collocation_pmi — Church & Hanks PMI
#   collocations; fuzzy_name_sorted_neighborhood — Hernández–Stolfo
#   merge/purge blocking; chem_substructure_search — WL-catalog
#   substructure screen; doc_dsir_selection — DSIR importance
#   resampling; doc_perplexity_buckets — CCNet head/middle/tail;
#   graph_label_propagation — sync LPA communities; doc_chunk_spans —
#   RAG token-window chunking; doc_cdc_chunks — content-defined
#   chunking; events_cusum_alarms — Page CUSUM via grouped
#   cumsum + grouped running min; source_chunk_dup_rate — the
#   shifted-boilerplate diagnostic over CDC chunks;
#   embedding_hard_negatives — FaceNet triplet mining;
#   lang_token_fertility — mT5/XGLM subword fertility;
#   similarity_lsh_recall — multi-probe vs single-probe recall@1;
#   pipeline_curation_funnel — the composed end-to-end curation run)
#   enter through the window.
# - Then the OLDEST r5-stale entries (last driver-green r5), 14 of 39.
#   25 defer to the r10 window lead (incl. doc_dup_span_stats /
#   doc_dup_span_removal / fuzzy_name_clusters / fuzzy_name_pairs /
#   doc_split_assign / orders_retention_cohorts / doc_mixture_sample /
#   q21_waiting_suppliers / doc_pii_redact / doc_gopher_repetition /
#   source_token_divergence, displaced by the eleven late debuts; all
#   suite-covered + property-tested) — chosen lowest-risk: the three
#   setops + skew_salted_status_counts (trivial, suite-covered) and
#   q2/q4/q8/q9/q11/q12/q15/q16/q17 (TPC-H mainline, in-suite
#   full-registry sweep + untouched since r5): setop_intersect_nations,
#   setop_union_nations, setop_except_nations,
#   skew_salted_status_counts, q2_min_cost_supplier, q4_order_priority,
#   q8_market_share, q9_product_profit, q11_important_parts,
#   q12_ship_priority, q15_top_supplier, q16_part_supplier_counts,
#   q17_small_qty_revenue, q20_excess_suppliers.
# Rotated out: the 50 r8-green window rows (all untouched this round
# except the chem/ewma re-gates above, which stay in).
_PRIORITY = [
    # ---- never driver-checked (post-window r8 debuts) ----
    "graph_adamic_adar",
    "doc_priority_sample",
    "dedup_cross_source_matrix",
    # ---- r8 funnel-sweep rewrites: first driver gate post-rewrite ----
    "dedup_embedding_cosine",
    "dedup_simhash_pairs",
    "approx_distinct_parts",
    "doc_repetition_suite",     # also r5-stale
    "quantiles_price_by_flag",
    "approx_quantiles_price",   # also r5-stale
    "profile_lineitem",         # last r4-stale row
    "graph_triangle_count",     # re-changed r9: size dispatch
    # ---- first round with a value-hash oracle ----
    "graph_kcore_summary",
    # ---- chem/mol.py changed (Hückel + E/Z uniqueness) ----
    "chem_nearest_molecule",
    "chem_pharma_profile",
    "chem_edit_expansion",
    "chem_exact_ged_pairs",
    "chem_pharma_overlap",
    "chem_subgraph_display",
    "chem_subgraph_counts",
    "chem_tanimoto_pairs",
    "chem_subgraph_catalog_hist",
    # ---- ranking frame operator changed (context cap) ----
    "events_ewma",
    # ---- r9 debuts (new queries enter through the window) ----
    "doc_collocation_pmi",
    "fuzzy_name_sorted_neighborhood",
    "chem_substructure_search",
    "doc_dsir_selection",
    "doc_perplexity_buckets",
    "graph_label_propagation",
    "doc_chunk_spans",
    "doc_cdc_chunks",
    "events_cusum_alarms",
    "source_chunk_dup_rate",
    "embedding_hard_negatives",
    "lang_token_fertility",
    "similarity_lsh_recall",
    "pipeline_curation_funnel",
    # ---- oldest r5-stale tail (25 of 39; 14 defer to r10) ----
    "graph_pagerank_top",
    "dedup_exact",
    "dedup_incremental_flags",
    "neardup_jaccard_pairs",
    "dedup_lsh_verified",
    "dedup_keep_best",
    "neardup_containment_pairs",
    "events_funnel",
    "events_twap",
    "events_anomaly_outliers",
    "events_winsorized_stats",
    "vocab_bpe_merge_pairs",
    "doc_unigram_logprob",
    "doc_bigram_logprob",
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
