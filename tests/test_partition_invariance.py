"""Partition-count invariance: query results must be identical under
different shuffle parallelism — the property that makes local[4]
correctness evidence transfer to a 1000-executor cluster, and the one
float-order-dependent or hash()-dependent code silently breaks.

Exercises the algorithmic families most at risk: iterative CC
(dedup_clusters), map-fold signatures (minhash), corpus-frequency
joins (tfidf), and window sequencing (funnel, sessionize)."""

from __future__ import annotations

import pytest

from molgraphdb_spark.registry import all_queries

QUERIES = all_queries()

AT_RISK = [
    "dedup_clusters",
    "dedup_minhash_signatures",
    "doc_tfidf_top_terms",
    "events_funnel",
    "events_sessionize",
    "embedding_norm_stats",
    "doc_unigram_logprob",  # integer-milli log sums — the order-free-sum case
    "events_twap",          # decimal product sums — exact order-free arithmetic
    "doc_mixture_sample",   # hash-threshold sampling must not depend on layout
    "doc_pack_offsets",     # per-source cumsum windows — sequencing case
    "embedding_quantize_stats",  # integer pico-unit error sums
    "events_anomaly_outliers",   # decimal window sums — order-free exactness
    "fuzzy_name_clusters",       # iterative CC over the fuzzy-match graph
    "dedup_semantic_clusters",   # iterative CC over the cosine graph
    "similarity_knn_graph",      # bucket-join + rank — tie-break determinism
    "doc_dup_span_stats",        # groupBy+semi-join+lag coverage — join/window case
    "doc_bigram_logprob",        # integer milli-nat sums, two model joins
    "source_token_divergence",   # integer micro-nat KL terms
    "mm_phash_neardup",          # mapInPandas signatures + band self-join
    "vocab_bpe_merge_pairs",     # global top-k — tie-break determinism
    "events_winsorized_stats",   # exact-percentile clamp + micro-int sums
    "vocab_bpe_merge_table",     # iterative argmax loop — per-step tie determinism
    "pq_code_stats",             # micro-unit-floored argmin — code assignment stability
    "similarity_pq_topk",        # integer ADC sums + top-k tie determinism
    "similarity_pq_recall",      # shortlist boundary + rerank tie determinism
    "similarity_ivfpq_topk",     # cell assignment + probe + shortlist ties
    "events_ewma",               # frame-ordered fold — sequencing case
    "graph_supplier_jaccard",    # inverted-index pair counts + bp-ranked top-k
    "dedup_rate_by_source",      # hash-group rollup incl. null-side union
    "neardup_prefix_pairs",      # rank-window prefix index — order determinism
    "doc_weighted_sample",       # global cumsum mark crossings — integer exact
    "events_value_trend",        # decimal moment sums — order-free OLS
    "vocab_zipf_slope",          # rank-window + decimal OLS — full-order ties
    "doc_ngram_novelty",         # min-attribution join — integer bp division
    "events_bot_regularity",     # decimal gap moments — order-free CV²
    "events_markov_transitions", # lag sequencing + integer bp rows
    "customer_rfm_segments",     # ntile total-order ties across 3 windows
    "parts_basket_rules",        # basket pair counts + integer rule metrics
    "events_dau_wau",            # band-join distinct counts — layout-free
    "doc_lang_confusion",        # label-partition window + integer shares
    "dedup_threshold_curve",     # checkpointed pair scores + ladder rollups
    "embedding_covariance_stats", # d² integer moment cells — order-free
    "graph_assortativity",       # decimal Pearson moments — order-free
    "customer_spend_gini",       # rank-window decimal sums — order-free
    "supplier_concentration_hhi", # integer share-bp squares — order-free
    "customer_lorenz_deciles",   # ntile total-order + cumulative shares
    "parts_skyline",             # strictly-before running max — bucket-boundary ties
    "parts_abc_analysis",        # two-pass cumsum — bucket prefix exactness
    "ntile_customer_value",      # two-pass rank + reconstructed ntile/pct_rank
    "customer_spend_exact_percentiles",  # nearest-rank targets at bucket seams
    "source_length_deciles",     # grouped two-pass rank + per-group ntile
    "source_token_budget",       # grouped two-pass cumsum — budget boundary
    "events_latency_percentiles",  # grouped nearest-rank targets at seams
    "priority_ship_delay_percentiles",  # fact-scale grouped rank targets
    "orders_bloom_prefilter",    # literal-bitmap pruning must be layout-free
    "embedding_label_outliers",  # integer centroid sums — order-free means
    "doc_bm25_topk",             # integer milli scores + top-k tie determinism
    "retrieval_rrf_hybrid",      # two integer legs + fused rank ties
    "doc_quality_classifier",    # integer weight sums — order-free
    "source_temperature_weights",  # floor-sqrt integers + positive DIV
    "graph_adamic_adar",         # integer micro-weight sums + pair ties
    "doc_priority_sample",       # micro-floored priorities + id ties
    "dedup_cross_source_matrix", # verified-pair rollup — integer bp sums
    "doc_collocation_pmi",       # vocab-keyed counts + milli-floored ln ties
    "fuzzy_name_sorted_neighborhood",  # rank blocks at bucket seams
    "graph_kcore_summary",       # H-operator fixpoint — layout-free peel
    "doc_dsir_selection",        # integer milli-nat sums + global rank ties
    "doc_perplexity_buckets",    # per-lang milli means + grouped rank thirds
    "graph_label_propagation",   # argmax votes — integer counts + min ties
    "doc_cdc_chunks",            # doc-keyed window + ordered fold
    "events_cusum_alarms",       # grouped cumsum + running min seams
    "embedding_hard_negatives",  # argmax struct ties — layout-free
    "similarity_lsh_recall",     # probe joins + top-1 ties — layout-free
    "pipeline_curation_funnel",  # stage windows + joins — layout-free
    "mm_decoded_features",       # Arrow decode pass — layout-free features
    "mm_decoded_phash",          # decoded-luminance dHash — layout-free bits
    "embedding_hard_negatives_ann",  # cell assign + probe + argmax ties
    "fuzzy_name_multipass",      # two rank-block pairings at bucket seams
    "chem_render_raster",        # integer layout + raster digests
    "chem_render_subgraphs",     # display-representative renders
    "mm_decoded_png",            # PNG inflate+unfilter — layout-free features
    "mm_decoded_jpeg",           # Huffman+IDCT decode — layout-free features
    "doc_html_extract",          # per-row regex pipeline — layout-free
    "mm_decoded_flac",           # Rice decode + MD5 — layout-free features
]


def _rows(spark, name, sf_dir, partitions):
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = QUERIES[name](spark, sf_dir)
        return sorted(tuple(r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "4")


@pytest.mark.parametrize("name", AT_RISK)
def test_result_invariant_under_shuffle_partitions(name, spark, sf_dir):
    a = _rows(spark, name, sf_dir, 2)
    b = _rows(spark, name, sf_dir, 17)  # odd, non-divisor parallelism
    assert a == b and len(a) > 0
