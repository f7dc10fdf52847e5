"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Results are sunk through the "noop" datasource so timings measure the
full distributed plan (scan → shuffle → agg) without driver collect
overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from molgraphdb_spark.session import get_spark, tune
from molgraphdb_spark.registry import all_queries

# Curated warm-up-ordered head (families interleave so one slow family
# doesn't monopolize the first minutes); the FULL registry follows —
# since r8 every registered query is benchmarked each round (r7 verdict
# item 6: no more solo-baseline-only tail invisible to the per-round
# bench diff).
_CURATED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "filter_project_pushdown",
    "topk_orders_per_customer",
    "orders_above_customer_avg",
    "events_sessionize",
    "events_tumbling_window",
    "events_asof_join",
    "similarity_ivf_topk",
    "dedup_minhash_signatures",
    "neardup_jaccard_pairs",
    "dedup_lsh_verified",
    "dedup_clusters",
    "similarity_cosine_topk",
    "similarity_ivf_recall",
    "doc_quality_scores",
    "graph_bfs_path_lengths",
    "chem_tanimoto_pairs",
    "chem_pharma_profile",
    "mm_feature_extract",
    # added round 4 (new-query coverage; absent from r2/r3 baselines)
    "q10_returned_items",
    "doc_tfidf_top_terms",
    "doc_decontaminate_overlap",
    "dedup_keep_best",
    # added round 5 (TPC-H completion showcase; absent from r2-r4 baselines)
    "q8_market_share",
    "q21_waiting_suppliers",
    # added round 5 session 2 (new families; absent from prior baselines)
    "fuzzy_name_clusters",
    "doc_gopher_repetition",
    "events_anomaly_outliers",
    "dedup_embedding_lsh",
    # added round 5 session 3 (span-dedup family; absent from prior baselines)
    "doc_dup_span_stats",
    "doc_dup_span_removal",
    "doc_repetition_suite",
    # added round 5 session 3b (monitoring/tokenizer/modality-dedup shapes)
    "source_token_divergence",
    "vocab_bpe_merge_pairs",
    "mm_phash_neardup",
    # added round 6 (iterative BPE loop, PQ contract leg, dedup-graph
    # and mixture diagnostics; absent from prior baselines)
    "vocab_bpe_merge_table",
    "pq_code_stats",
    "neardup_degree_hist",
    "source_lang_entropy",
    # added round 6 session 2 (ADC search leg, node similarity,
    # per-source dup diagnostics; absent from prior baselines)
    "similarity_pq_topk",
    "graph_supplier_jaccard",
    "dedup_rate_by_source",
    "similarity_pq_recall",
    "events_ewma",
    # added round 6 session 3 (runtime-filter join, windowed skyline,
    # centroid outliers, budget selection, multi-source-BFS closeness)
    "orders_bloom_prefilter",
    "parts_skyline",
    "embedding_label_outliers",
    "source_token_budget",
    "graph_closeness_sample",
    "neardup_prefix_pairs",
    "doc_weighted_sample",
    "events_value_trend",
    "graph_supplier_pmi",
    "similarity_ivfpq_topk",
    "vocab_zipf_slope",
    "doc_ngram_novelty",
    "events_bot_regularity",
    "events_markov_transitions",
    "customer_rfm_segments",
    "doc_lang_confusion",
    "parts_basket_rules",
    "events_dau_wau",
    "dedup_threshold_curve",
    "events_variant_stats",
    "embedding_covariance_stats",
    "chem_nearest_molecule",
    "graph_assortativity",
    "supplier_concentration_hhi",
    "customer_spend_gini",
    "customer_lorenz_deciles",
    "parts_abc_analysis",
    "ntile_customer_value",
    "customer_spend_exact_percentiles",
    "source_length_deciles",
    "events_latency_percentiles",
    "priority_ship_delay_percentiles",
    "events_error_rate_windows",
]

HEADLINE = _CURATED + [q for q in all_queries() if q not in set(_CURATED)]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("molgraphdb-bench")
    tune(spark)  # ships the package zip to workers before the warmup uses it
    queries = all_queries()

    # Steady-state warmup so the first measured query isn't charged
    # for one-time session costs: JVM/codegen, the Python-UDF worker
    # pool (mapInPandas spin-up is ~2s), and parquet footer reads.
    spark.range(1000).selectExpr("sum(id)").collect()

    def _boot(it):
        # Import the engine inside the worker so the pool both spins up
        # AND pays the py-files zip import here, not in the first
        # measured chem/mm query (~3 s first-touch otherwise).
        import molgraphdb_spark.chem.mol  # noqa: F401

        yield from it

    spark.range(32).repartition(32).mapInPandas(_boot, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events: ns timestamps
    for tbl in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{tbl}.parquet").limit(1).write.format("noop").mode(
            "overwrite"
        ).save()

    # Median of N_RUNS per query so one co-tenant noise spike (the
    # round-1 51.7s MinHash outlier re-ran at 2-6s) cannot masquerade
    # as a plan regression; min is reported too as the contention-free
    # floor. "queries" stays name → seconds (median) for the driver.
    # Host-drift canary: a fixed, data-independent DuckDB aggregation
    # timed before the measured queries. Cross-round bench ratios have
    # been dominated by co-tenant host noise (the r3/r4 judges measured
    # 2-3x drift on identical code); recording one constant-work number
    # per BENCH file lets bench_compare normalize instead of argue.
    # ~2.5 s on an idle host; scales with CPU contention like the
    # Spark queries do.
    import duckdb as _duck

    _t0 = time.time()
    _duck.connect().execute("SELECT SUM(i*i % 97) FROM range(200000000) t(i)").fetchall()
    canary_sec = round(time.time() - _t0, 3)

    # 5 runs (was 3): same-plan single-run spikes of 3-4x occur ~1 in 7
    # runs on this host REGARDLESS of heap size (measured 8g vs 16g,
    # identical 2.88 s medians, both with one outlier) — a median of 5
    # survives two spiked runs, a median of 3 only one.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    # Per-query wall budget: since r8 the headline is the FULL registry
    # (181 queries), so the handful of 25–30 s members (triangle count,
    # simhash pairs, embedding cosine) get ≥2 runs but stop once their
    # accumulated wall passes the budget — a 2-run median still beats a
    # solo number, and the cheap majority keeps its full median-of-5.
    run_budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "30"))
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    # Per-query start offset (seconds since the bench loop began):
    # r12 forensics showed the host suffers multi-minute slow EPISODES
    # (two same-tree solo runs flagged disjoint 5-7x "regressions";
    # every one re-timed at baseline individually) — offsets let
    # bench_compare correlate movers with wall-clock stretches instead
    # of blaming the queries.
    offsets: dict[str, float] = {}
    _loop_t0 = time.time()
    # Per-query run counts: the wall budget truncates expensive queries
    # to 2 runs, so a BENCH file silently mixes 2-run and 5-run medians.
    # Recording n_runs per query lets cross-round diffs (tools/
    # bench_compare.py) distinguish a 2-run median from a 5-run one
    # (r8 ADVICE item, bench.py:206).
    nruns: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        runs = []
        offsets[name] = round(time.time() - _loop_t0, 1)
        # Fault isolation: one failing query must cost exactly one
        # "errors" entry, never the whole round's record (round 3's
        # BENCH file was a traceback because query 7 of 21 threw).
        try:
            for _ in range(n_runs):
                # Cold-cache per run: queries that .cache() a multiply-
                # referenced relation (neardup/LSH shingle index) would
                # otherwise hit run 1's materialized cache via Spark's
                # logical-plan cache matching, making the median a warm
                # number that hides the materialization cost the headline
                # claims to measure. JVM/codegen warmth is intended and
                # stays (see the warmup block above).
                spark.catalog.clearCache()
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(time.time() - t0)
                if len(runs) >= 2 and sum(runs) > run_budget_s:
                    break
        except Exception as exc:  # noqa: BLE001 — record and move on
            errors[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}"
            continue
        nruns[name] = len(runs)
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        mins[name] = round(runs[0], 3)

    total = round(sum(timings.values()), 3)
    # Truncation hardening (r14 verdict item 2): the driver's output
    # capture keeps only a bounded stdout TAIL, and the r13 round lost
    # its whole baseline because the single JSON line (3 per-query
    # dicts, ~30 KB) was cut mid-object. The per-query diagnostics
    # (min / n_runs / t_offset) therefore move to a PRECEDING sidecar
    # line, and the contract line — printed LAST so a tail capture
    # always ends with it — carries only the driver contract
    # (metric/value/unit/queries/sf) plus the small scalars. Nothing is
    # removed or renamed in "queries"; the same numbers are measured by
    # the same methodology. tools/bench_compare.py reads both lines.
    print(
        json.dumps(
            {
                "metric": "headline_queries_sidecar",
                "queries_min": mins,
                "queries_n_runs": nruns,
                "queries_t_offset": offsets,
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "errors": errors,
                "canary_duckdb_sec": canary_sec,
                "runs_per_query": n_runs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
