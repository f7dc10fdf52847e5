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

# ---------------------------------------------------------------
# HISTORICAL RECORD, r10 window composition: 6 r10 debuts
# (mm_decoded_features, mm_decoded_phash, embedding_hard_negatives_ann,
# fuzzy_name_multipass, chem_render_raster, chem_render_subgraphs) +
# 3 changed-code re-gates (events_cusum_alarms, lang_token_fertility,
# fuzzy_name_sorted_neighborhood) + all 25 r5-stale rows + 16 r6-stale
# fills. CORRECTNESS_r10.json: 50/50 green, 0 errors; ledger floor
# moved to r6 (27 rows), exactly the stale block below.
#
# Round-11 verification window (first 50), per the r10 verdict item 1.
# Composition (staleness ledger = tools/gen_query_index
# .last_driver_green over all ten CORRECTNESS_r*.json):
# - The 2 r11 debuts LEAD (never driver-checked):
#   mm_decoded_jpeg — the HARDEST compressed-image leg (pure-Python
#   baseline JPEG, functions/jpeg.py: marker walk + file-carried
#   DQT/DHT + canonical Huffman entropy decode + IDCT; the synthesized
#   even-constant-block class is provably bit-exact, so the oracle is
#   closed-form). Pre-verified hash-green at sf0.01 this session.
#   mm_decoded_png — the stdlib-zlib PNG leg (CRC-verified chunk walk
#   + inflate + five-filter unfiltering).
#   With both, the documented codec boundary shrinks to MP3/H.264.
# - 21 changed-code re-gates (mm_chunk_windows rotates to lead r12:
#   the window holds 50 and its change is the identical one-line
#   terminal-sort drop as its three in-window multimodal_queries.py
#   siblings (mm_decoded_features/mm_decoded_phash/mm_resize_grid),
#   pre-verified hash-green at sf0.01 and swept by the suite's
#   full-registry sf0.001 oracle run):
#   embedding_hard_negatives_ann (r10 ADVICE: loud rejection replaces
#   the empty-centroid sentinel when the corpus is non-empty), and the
#   21 queries whose terminal presentation sorts were dropped this
#   round (r10 verdict item 3 — outputs hash-unchanged, the driver
#   hash is order-insensitive, but the code changed so they re-gate):
#   text ×10 (line_dedup/rare_token/tfidf/content_filter/pii/
#   unigram/bigram/gopher/chunk_spans/cdc), dedup ×4 (minhash_
#   signatures/simhash/incremental_flags/ngram_novelty), mm ×3
#   (decoded_features/decoded_phash/resize_grid; the decoded pair also
#   re-gates the r11 WAV header-validation fix),
#   spans ×3 (dup_span_stats/dup_span_removal/repetition_suite).
# - ALL 27 r6-stale rows (the entire remaining staleness tail; 14 of
#   them were judge-parity-green at sf0.01 in the r10 verdict session).
# 2 + 21 + 27 = 50. Rotated out: every r10-green window row not
# re-gated above, plus mm_chunk_windows (leads r12). After this window
# the ledger floor is r10.
#
# r12 window MUST lead with: mm_chunk_windows (displaced re-gate, see
# above) and the r11 post-window debuts — doc_html_extract (the
# HTML→text extraction pass; html.parser third implementation in
# tests/test_thirdimpl.py) and mm_decoded_flac (the compressed-audio
# leg: pure-Python FLAC, functions/flac.py — Rice residuals, CRC-8/16
# framing, STREAMINFO MD5; lossless, so the oracle is closed-form for
# every input). Both hash-green at sf0.01 this session and swept by
# the suite's full-registry sf0.001 oracle run until then.
_PRIORITY = [
    # ---- r11 debuts (never driver-checked) ----
    "mm_decoded_jpeg",
    "mm_decoded_png",
    # ---- changed-code re-gates (ADVICE fix + presentation-sort drop) ----
    "embedding_hard_negatives_ann",
    "doc_line_dedup_ratio",
    "doc_rare_token_ratio",
    "doc_tfidf_top_terms",
    "doc_content_filter",
    "doc_pii_redact",
    "doc_unigram_logprob",
    "doc_bigram_logprob",
    "doc_gopher_repetition",
    "doc_chunk_spans",
    "doc_cdc_chunks",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "dedup_incremental_flags",
    "doc_ngram_novelty",
    "mm_decoded_features",
    "mm_decoded_phash",
    "mm_resize_grid",
    "doc_dup_span_stats",
    "doc_dup_span_removal",
    "doc_repetition_suite",
    # ---- the 27 r6-stale rows (the full remaining staleness tail) ----
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "agg_stats_lineitem",
    "anti_join_customers_without_orders",
    "case_bucket_orders",
    "cross_pairs_nations",
    "cube_status_priority",
    "distinct_count_customers",
    "filter_project_pushdown",
    "full_outer_nation_profile",
    "group_count_orderstatus",
    "grouping_sets_revenue",
    "multikey_sort_parts",
    "null_handling_discounts",
    "orders_above_customer_avg",
    "orders_monthly_revenue",
    "pivot_status_by_priority",
    "rollup_region_nation",
    "sample_systematic_orders",
    "semi_join_customers_with_orders",
    "ship_delay_stats",
    "string_funcs_customers",
    "supplier_part_sets",
    "topk_orders_per_customer",
    "unpivot_lineitem_measures",
    "window_running_total",
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
