"""Scale probe: one decade beyond bench scale for the dedup/similarity
family (r4 verdict item 6 — turn the 100 TB design claims into at
least one measured scale-up).

Builds synthetic corpora from sf0.1 documents (replicate×K with
per-replica token perturbation → planted near-dup clusters of size K,
plus a boilerplate phrase on 30% of docs → genuinely hot shingles that
MUST be capped), then measures:

probe A — stop-shingle cap at 10× (50k docs):
  * capped posting lists are bounded (max df ≤ MAX_SHINGLE_DF);
  * the planted hot shingles are excluded, rare shingles survive;
  * neardup pairs == the planted expectation: every within-cluster
    pair (K·C(K,2) per original... exactly C(K,2)·n_orig) and zero
    cross-cluster pairs — i.e. the cap changed COST, not RESULTS.
    (An uncapped run is intractable by construction: the boilerplate
    shingle alone would contribute C(15000,2) ≈ 112M candidate pairs.)

probe B — connected-components dispatch at 225k and 1.5M edges:
  * below the 1M-edge threshold the size dispatch picks min-label,
    above it large-star/small-star; both return the planted
    componentization (n_orig components of size K).

probe C — wall-times for the headline dedup pipeline at 10×
  (neardup pairs, MinHash+LSH, LSH-verified) — recorded in
  BASELINE.md §scale-probe.

Usage: python tools/scale_probe.py [K] (default 10; 25 → 1.5M edges)
Writes parquet under /tmp/molgraphdb_scale_probe/ and prints one JSON
line per probe.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from molgraphdb_spark.session import get_spark, tune

BASE = "/tmp/molgraphdb_scale_probe"
BOILER = "standard legal disclaimer applies to this document body"


def build_corpus(spark, k: int) -> str:
    """Replicate sf0.1 documents k× with per-replica perturbation.

    Replica 0 keeps the original text; replicas 1..k-1 append a
    replica-specific token pair, so each original forms a near-dup
    cluster of size k (3-shingle Jaccard ≈ 0.9 within the cluster,
    ≈ 0 across clusters). Docs with doc_id % 10 < 3 additionally get
    the shared boilerplate sentence — at 50k docs those 3-shingles
    reach df ≈ 15k, far past MAX_SHINGLE_DF (1024)."""
    out = f"{BASE}/k{k}"
    if os.path.exists(out):
        shutil.rmtree(out)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    boiler = F.when(F.col("doc_id") % 10 < 3, F.lit(" " + BOILER)).otherwise(F.lit(""))
    reps = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep"),
        "text", "lang", "source",
    ).select(
        (F.col("doc_id") * 1000 + F.col("rep")).alias("doc_id"),
        F.concat(
            F.col("text"),
            F.when(F.col("rep") == 0, F.lit("")).otherwise(
                F.concat(F.lit(" replica"), F.col("rep"), F.lit(" variant"), F.col("rep"))
            ),
            boiler,
        ).alias("text"),
        "lang", "source",
    ).withColumn("n_chars", F.length("text"))
    reps.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def probe_cap(spark, sf_dir: str, k: int, n_orig: int) -> dict:
    from molgraphdb_spark.queries.dedup import MAX_SHINGLE_DF, _shingle_rows, neardup_jaccard_pairs

    t0 = time.time()
    sh = _shingle_rows(spark, sf_dir)
    stats = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).agg(
        F.max("df").alias("max_df"), F.count(F.lit(1)).alias("n_shingles")
    ).first()
    boiler_present = sh.filter(F.col("shingle").startswith("standard legal disclaimer")).count()
    t_index = time.time() - t0

    # One pass: total pairs + the split into within-replica-cluster vs
    # cross-cluster. Cross-cluster pairs are EXPECTED: sf0.1 itself
    # plants near-identical document pairs, and each such original
    # pair (a, b) yields up to k×k cross-cluster replica pairs. And
    # not every within-cluster pair survives: a short doc (few
    # shingles) drops below 0.8 Jaccard once the replica tokens are
    # appended. The load-bearing assertions are boundedness + hot-
    # shingle exclusion + pair volume in the modeled range — the cap
    # changes cost, never which pairs qualify (that invariance is
    # pinned exactly by tests/test_dedup.py on a planted fixture).
    t0 = time.time()
    pairs = neardup_jaccard_pairs(spark, sf_dir)
    cross = (F.col("id_a") / 1000).cast("long") != (F.col("id_b") / 1000).cast("long")
    row = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(cross.cast("long")).alias("cross_cluster"),
    ).first()
    t_pairs = time.time() - t0
    spark.catalog.clearCache()

    upper_within = n_orig * (k * (k - 1) // 2)
    return {
        "probe": "cap", "k": k,
        "max_posting_list": stats["max_df"], "cap": MAX_SHINGLE_DF,
        "bounded": bool(stats["max_df"] <= MAX_SHINGLE_DF),
        "n_shingles": stats["n_shingles"],
        "hot_shingles_in_index": boiler_present,
        "pairs": row["n_pairs"],
        "within_cluster_pairs": row["n_pairs"] - (row["cross_cluster"] or 0),
        "upper_bound_within": upper_within,
        "cross_cluster_pairs": row["cross_cluster"],
        "t_index_s": round(t_index, 1), "t_pairs_s": round(t_pairs, 1),
    }


def probe_cc(spark, k: int, n_orig: int) -> dict:
    """Planted clique components of size k over n_orig clusters —
    generated directly (no text pipeline) so the edge count is exact:
    n_orig × C(k,2)."""
    from molgraphdb_spark.operators.graph import connected_components_auto

    base = spark.range(n_orig).select((F.col("id") * 1000).alias("root"))
    edges = (
        base.select(
            "root",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        )
        .select("root", "i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"))
        .filter(F.col("i") < F.col("j"))
        .select((F.col("root") + F.col("i")).alias("src"), (F.col("root") + F.col("j")).alias("dst"))
    )
    n_edges = edges.count()
    t0 = time.time()
    comp = connected_components_auto(edges)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    n_comp = sizes.count()
    bad = sizes.filter(F.col("n") != k).count()
    t_cc = time.time() - t0
    return {
        "probe": "cc", "k": k, "edges": n_edges,
        "strategy": connected_components_auto.last_strategy,
        "components": n_comp, "expected_components": n_orig,
        "wrong_size_components": bad,
        "correct": bool(n_comp == n_orig and bad == 0),
        "t_cc_s": round(t_cc, 1),
    }


def probe_lsh(spark, sf_dir: str) -> dict:
    from molgraphdb_spark.queries.dedup import dedup_minhash_lsh_pairs, dedup_lsh_verified

    t0 = time.time()
    n_cand = dedup_minhash_lsh_pairs(spark, sf_dir).count()
    t_cand = time.time() - t0
    spark.catalog.clearCache()
    t0 = time.time()
    n_ver = dedup_lsh_verified(spark, sf_dir).filter(F.col("verified") == 1).count()
    t_ver = time.time() - t0
    spark.catalog.clearCache()
    return {
        "probe": "lsh", "candidates": n_cand, "verified": n_ver,
        "t_candidates_s": round(t_cand, 1), "t_verified_s": round(t_ver, 1),
    }


def probe_prefix(spark, sf_dir: str) -> dict:
    """Prefix filtering (neardup_prefix_pairs) vs the plain inverted-
    index join at k× docs: candidate volumes ΣC(df,2) for the full vs
    prefix index, both walls, and result-set equality (count + integer
    checksum) — the crossover evidence for the AllPairs variant."""
    from pyspark.sql.window import Window

    from molgraphdb_spark.queries.dedup import (
        _shingle_rows,
        neardup_jaccard_pairs,
        neardup_prefix_pairs,
    )

    def checksum(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("id_a") + F.col("id_b") * 7 + F.col("jaccard_bp")).alias("s"),
        ).first()
        return int(r.n), int(r.s or 0)

    spark.catalog.clearCache()
    t0 = time.time()
    plain = checksum(neardup_jaccard_pairs(spark, sf_dir))
    t_plain = time.time() - t0
    spark.catalog.clearCache()
    t0 = time.time()
    pref = checksum(neardup_prefix_pairs(spark, sf_dir))
    t_pref = time.time() - t0

    spark.catalog.clearCache()
    sh = _shingle_rows(spark, sf_dir)
    vol_full = (
        sh.groupBy("shingle").agg(F.count("*").alias("d"))
        .agg(F.sum(F.expr("d*(d-1) DIV 2"))).first()[0]
    )
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("doc_id").orderBy("_df", "shingle")
    ranked = sh.join(dfreq, "shingle").select(
        "doc_id", "shingle",
        F.row_number().over(w).alias("_pos"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("_n"),
    )
    p = F.col("_n") - F.floor((8 * F.col("_n") + 9) / 10) + 1
    vol_pref = (
        ranked.filter(F.col("_pos") <= p)
        .groupBy("shingle").agg(F.count("*").alias("d"))
        .agg(F.sum(F.expr("d*(d-1) DIV 2"))).first()[0]
    )
    return {
        "probe": "prefix_filter",
        "results_equal": plain == pref,
        "n_pairs": plain[0],
        "wall_plain_s": round(t_plain, 2),
        "wall_prefix_s": round(t_pref, 2),
        "cand_full": int(vol_full),
        "cand_prefix": int(vol_pref),
        "cand_ratio": round(vol_full / max(vol_pref, 1), 1),
    }


def probe_spans(spark, sf_dir: str) -> dict:
    """Span-dedup at 10×: every replica shares its original's full
    token prefix, so a replica-0 document WITHOUT the boilerplate
    suffix (text identical to the original, present in all k replicas)
    must come out 100% covered by duplicated windows and scrub to
    empty — a planted exact invariant, plus wall-times showing the
    linear formulation's cost tracks corpus size, not pairs."""
    from molgraphdb_spark.queries.spans import (
        SPAN_W,
        doc_dup_span_removal,
        doc_dup_span_stats,
    )

    rep0_clean = (
        (F.col("doc_id") % 1000 == 0)
        & ((F.col("doc_id") / 1000).cast("long") % 10 >= 3)
        & (F.col("n_tokens") >= SPAN_W)
    )
    t0 = time.time()
    stats = doc_dup_span_stats(spark, sf_dir)
    agg = stats.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_dup_windows").alias("dup_windows"),
        F.sum(rep0_clean.cast("long")).alias("rep0_clean_docs"),
        F.sum((rep0_clean & (F.col("dup_token_bp") != 10000)).cast("long")).alias(
            "full_cover_violations"
        ),
    ).collect()[0]
    t_stats = time.time() - t0
    spark.catalog.clearCache()
    t0 = time.time()
    removal = doc_dup_span_removal(spark, sf_dir)
    rem = removal.agg(
        F.sum((rep0_clean & (F.col("text_clean") != "")).cast("long")).alias(
            "unscrubbed_violations"
        ),
        F.sum("n_removed").alias("tokens_removed"),
    ).collect()[0]
    t_removal = time.time() - t0
    spark.catalog.clearCache()
    return {
        "probe": "spans",
        "rows": agg["rows"],
        "dup_windows": int(agg["dup_windows"]),
        "rep0_clean_docs": int(agg["rep0_clean_docs"]),
        "full_cover_violations": int(agg["full_cover_violations"]),
        "unscrubbed_violations": int(rem["unscrubbed_violations"]),
        "tokens_removed": int(rem["tokens_removed"]),
        "t_stats_s": round(t_stats, 1),
        "t_removal_s": round(t_removal, 1),
    }


def build_embeddings(spark, k: int) -> str:
    """Replicate sf0.1 embeddings k× with a deterministic per-(replica,
    dim) perturbation of ±8e-3. Replica 0 keeps the ORIGINAL vec_id
    (so the IVF centroid ids < 8 and the query id range [100, 120)
    stay meaningful); replicas get vec_id + rep·1e6 — near-duplicate
    vectors that realistically land in the same coarse cell as their
    original."""
    out = f"{BASE}/emb_k{k}"
    if os.path.exists(out):
        shutil.rmtree(out)
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    reps = emb.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep"),
        "embedding", "label",
    ).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x.cast("double")
                + F.col("rep") * ((i + 1) % 17 - 8).cast("double") * 1e-3
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    reps.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def probe_ann(spark, k: int) -> dict:
    from molgraphdb_spark.queries.similarity import (
        similarity_cosine_topk,
        similarity_ivf_topk,
        similarity_ivf_recall,
    )

    emb_dir = build_embeddings(spark, k)
    n_vecs = spark.read.parquet(f"{emb_dir}/embeddings.parquet").count()

    t0 = time.time()
    n_exact_rows = similarity_cosine_topk(spark, emb_dir).count()
    t_exact = time.time() - t0
    t0 = time.time()
    n_ivf_rows = similarity_ivf_topk(spark, emb_dir).count()
    t_ivf = time.time() - t0
    t0 = time.time()
    rec = similarity_ivf_recall(spark, emb_dir).agg(
        F.sum("n_exact").alias("e"), F.sum("n_hit").alias("h")
    ).first()
    t_recall = time.time() - t0
    spark.catalog.clearCache()
    return {
        "probe": "ann", "k": k, "vectors": n_vecs,
        "exact_rows": n_exact_rows, "t_exact_s": round(t_exact, 1),
        "ivf_rows": n_ivf_rows, "t_ivf_s": round(t_ivf, 1),
        "recall_at3": round((rec["h"] or 0) / (rec["e"] or 1), 4),
        "t_recall_s": round(t_recall, 1),
    }


def probe_decode(spark, sf_dir: str) -> dict:
    """Real-codec decode leg at 10× (r10; r11 adds the baseline-JPEG
    pass): run mm_decoded_features + mm_decoded_phash + mm_decoded_jpeg
    over the 50k-doc corpus and verify sampled docs' features against a
    plain-Python recompute straight from the text bytes (independent of
    the codec modules) — the decode is exercised at volume, correctness
    stays pinned per sample, and the Arrow-pass throughput is
    recorded."""
    import math

    from molgraphdb_spark.queries.multimodal_queries import (
        mm_decoded_features,
        mm_decoded_jpeg,
        mm_decoded_phash,
    )

    t0 = time.time()
    feats = mm_decoded_features(spark, sf_dir)
    n_rows = feats.count()
    t_feat = time.time() - t0
    t0 = time.time()
    n_ph = mm_decoded_phash(spark, sf_dir).count()
    t_ph = time.time() - t0
    # r11: the Huffman+IDCT leg at volume, with 3 sampled docs checked
    # against the closed-form even-constant-block expectation.
    t0 = time.time()
    jp = mm_decoded_jpeg(spark, sf_dir)
    n_jp = jp.count()
    t_jp = time.time() - t0
    # r11: the Rice+MD5 FLAC leg at volume (lossless — count is the
    # volume fact; per-sample correctness is the sf-gate oracle's job)
    from molgraphdb_spark.queries.multimodal_queries import mm_decoded_flac

    t0 = time.time()
    n_fl = mm_decoded_flac(spark, sf_dir).count()
    t_fl = time.time() - t0
    jp_ids = [
        int(r["doc_id"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter((F.col("doc_id") % 3 == 0) & F.col("text").isNotNull()
                & (F.length("text") > 0))
        .limit(3).collect()
    ]
    jp_text = {
        int(r["doc_id"]): r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id").isin(jp_ids)).collect()
    }
    jp_ok = 0
    for r in jp.filter(F.col("doc_id").isin(jp_ids)).collect():
        b = jp_text[int(r["doc_id"])].encode()
        n = len(b)
        bw, bh = n % 8 + 1, n % 6 + 1
        v = [(b[k % n] // 2) * 2 for k in range(bw * bh)]
        jp_ok += int(
            r["width"] == bw * 8 and r["height"] == bh * 8
            and r["luma_milli"] == sum(v) * 1000 // (bw * bh)
            and r["peak"] == max(v)
        )

    docs = {
        int(r["doc_id"]): r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter((F.col("doc_id") % 3 != 2) & F.col("text").isNotNull())
        .limit(2000)
        .collect()
    }
    sample_ids = sorted(docs)[:3] + sorted(docs)[-3:]
    got = {
        r["doc_id"]: r.asDict()
        for r in feats.filter(F.col("doc_id").isin(sample_ids)).collect()
    }
    ok = 0
    for did in sample_ids:
        b = docs[did].encode()
        n = len(b)
        if n == 0 or did not in got:
            continue
        g = got[did]
        if did % 3 == 0:
            w, h = n % 64 + 1, n % 48 + 1
            npix = w * h
            lum_sum = sum(
                (2126 * b[(3 * k) % n] + 7152 * b[(3 * k + 1) % n]
                 + 722 * b[(3 * k + 2) % n]) // 10000
                for k in range(npix)
            )
            ok += int(
                g["width"] == w and g["height"] == h
                and g["luma_milli"] == lum_sum * 1000 // npix
            )
        else:
            samples = [(c - 128) * 256 for c in b]
            ok += int(
                g["sample_rate"] == 8000
                and g["energy"] == sum(s * s for s in samples)
                and g["peak"] == max(abs(s) for s in samples)
                and g["duration_ms"] == n * 1000 // 8000
            )
    assert math.isfinite(t_feat)
    return {
        "probe": "decode",
        "rows_features": n_rows,
        "rows_phash": n_ph,
        "rows_jpeg": n_jp,
        "rows_flac": n_fl,
        "sampled_exact": ok,
        "sampled_total": len(sample_ids),
        "jpeg_sampled_exact": jp_ok,
        "jpeg_sampled_total": len(jp_ids),
        "t_features_s": round(t_feat, 1),
        "t_phash_s": round(t_ph, 1),
        "t_jpeg_s": round(t_jp, 1),
        "t_flac_s": round(t_fl, 1),
        "docs_per_s": int(n_rows / max(t_feat, 1e-9)),
        "jpeg_docs_per_s": int(n_jp / max(t_jp, 1e-9)),
    }


def probe_extract(spark, sf_dir: str) -> dict:
    """HTML-extraction leg at 10× (r11): run doc_html_extract over the
    50k-doc corpus and verify SIX sampled docs column-for-column
    against a stdlib html.parser recompute (the same third
    implementation tests/test_thirdimpl.py uses at gate scale) —
    volume plus per-sample correctness, throughput recorded."""
    import re as _re
    from html.parser import HTMLParser

    from molgraphdb_spark.queries.text import (
        _HTML_HEAD,
        _HTML_MID1,
        _HTML_MID2,
        _HTML_TAIL,
        doc_html_extract,
    )

    t0 = time.time()
    ex = doc_html_extract(spark, sf_dir)
    n_rows = ex.count()
    t_ex = time.time() - t0

    docs = {
        int(r["doc_id"]): r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .limit(2000)
        .collect()
    }
    sample_ids = sorted(docs)[:3] + sorted(docs)[-3:]

    class _Extract(HTMLParser):
        def __init__(self):
            super().__init__()
            self.chunks, self.main, self.links = [], [], []
            self.skip = self.in_p = self.in_a = self.n_links = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1
            if tag == "p":
                self.in_p += 1
            if tag == "a":
                self.in_a += 1
                self.n_links += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style"):
                self.skip -= 1
            if tag == "p":
                self.in_p -= 1
            if tag == "a":
                self.in_a -= 1

        def handle_data(self, data):
            if self.skip:
                return
            self.chunks.append(data)
            if self.in_p:
                self.main.append(data)
            if self.in_a:
                self.links.append(data)

    got = {
        r["doc_id"]: r
        for r in ex.filter(F.col("doc_id").isin(sample_ids)).collect()
    }
    ok = 0
    for did in sample_ids:
        text = docs[did]
        esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        page = f"{_HTML_HEAD}{did}{_HTML_MID1}{did}{_HTML_MID2}{esc}{_HTML_TAIL}"
        p = _Extract()
        p.feed(page)
        p.close()
        # same explicit five-char class as the engine/oracle (ADVICE r11)
        full = _re.sub(r"[ \t\n\r\f]+", " ", " ".join(p.chunks)).strip(" ")
        main = _re.sub(r"[ \t\n\r\f]+", " ", " ".join(p.main)).strip(" ")
        lc = sum(len(x) for x in p.links)
        g = got.get(did)
        ok += int(
            g is not None
            and g["n_links"] == p.n_links
            and g["full_len"] == len(full)
            and g["main_len"] == len(main)
            and g["link_density_milli"] == lc * 1000 // max(len(full), 1)
            and g["main_ratio_milli"] == len(main) * 1000 // max(len(full), 1)
            and g["main_text"] == main
        )
    return {
        "probe": "extract",
        "rows": n_rows,
        "sampled_exact": ok,
        "sampled_total": len(sample_ids),
        "t_extract_s": round(t_ex, 1),
        "docs_per_s": int(n_rows / max(t_ex, 1e-9)),
    }


def probe_render(spark, n_mols: int = 20_000) -> dict:
    """Raster leg at volume (r10): render ``n_mols`` deterministic
    branched alkanes (sizes 2–12, LCG-driven attachment points — pure
    Python, no Date/random state) through the same mapInPandas body
    the registry query uses, TWICE, and require the (smiles, md5)
    result sets to be IDENTICAL — bit-determinism of the integer
    layout/rasterizer at volume, across executor processes and
    partition layouts (run 2 uses a different partition count).
    Throughput recorded; 3 sampled molecules re-rendered driver-side
    and checked field-for-field."""
    import pandas as pd

    # deterministic branched-alkane corpus: attach each new carbon to
    # an LCG-chosen existing position
    smiles_list = []
    state = 123456789
    for i in range(n_mols):
        size = 2 + (i % 11)
        # build as nested parentheses over a parent array
        parents = [0] * size
        degree = [0] * size
        for j in range(1, size):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            # carbon valence: only attach to nodes with < 4 bonds
            open_slots = [p for p in range(j) if degree[p] < 4]
            parents[j] = open_slots[state % len(open_slots)]
            degree[parents[j]] += 1
            degree[j] += 1
        children: dict[int, list[int]] = {}
        for j in range(1, size):
            children.setdefault(parents[j], []).append(j)

        def emit(u: int) -> str:
            parts = ["C"]
            kids = children.get(u, [])
            for k, v in enumerate(kids):
                sub = emit(v)
                parts.append(f"({sub})" if k < len(kids) - 1 else sub)
            return "".join(parts)

        smiles_list.append(emit(0))

    def gen(batches):
        from molgraphdb_spark.chem.render import render_ppm

        for pdf in batches:
            rows = []
            for idx, smi in zip(pdf["idx"], pdf["smiles"]):
                _na, _nb, ink, _nc, md5, _data = render_ppm(str(smi))
                rows.append((int(idx), str(smi), ink, md5))
            yield pd.DataFrame(rows, columns=["idx", "smiles", "ink_px", "md5"])

    rows = [(i, s) for i, s in enumerate(smiles_list)]

    def run(n_part):
        df = spark.createDataFrame(rows, "idx long, smiles string").repartition(n_part)
        out = df.mapInPandas(
            gen, schema="idx long, smiles string, ink_px int, md5 string"
        )
        t0 = time.time()
        got = {r["idx"]: (r["smiles"], r["ink_px"], r["md5"]) for r in out.collect()}
        return got, time.time() - t0

    got1, t1 = run(32)
    got2, t2 = run(17)
    identical = got1 == got2 and len(got1) == n_mols

    from molgraphdb_spark.chem.render import render_ppm as rp
    sampled_ok = 0
    for i in (0, n_mols // 2, n_mols - 1):
        smi = smiles_list[i]
        _na, _nb, ink, _nc, md5, _d = rp(smi)
        sampled_ok += int(got1[i] == (smi, ink, md5))

    return {
        "probe": "render",
        "mols": n_mols,
        "bit_identical_across_runs_and_layouts": bool(identical),
        "distinct_digests": len({v[2] for v in got1.values()}),
        "sampled_exact": sampled_ok,
        "t_run1_s": round(t1, 1),
        "t_run2_s": round(t2, 1),
        "mols_per_s": int(n_mols / max(min(t1, t2), 1e-9)),
    }


def probe_hard_negatives(spark, n_plant: int = 20, k_scale: int = 10) -> dict:
    """Exact vs ANN-shortlist triplet mining (r9 verdict item 3).

    Plants ``n_plant`` DIFFERENT-label near-twins (per-dim +(i%7−3)·1e−5
    on anchors vec_id 200..) into the sf0.1 embeddings — each planted
    anchor's true hard negative is its twin at cosine ≈ 1, and since
    the corpus has no natural pair above cosine 0.999 the expectation
    is unambiguous. Invariants: BOTH twins report the planted twin as
    hard_neg_id with a NEGATIVE margin for every planted anchor (the
    perturbation is tiny, so anchor and twin share a coarse cell and
    the rk=1 self-probe always sees it). Measurements: hard-negative
    agreement (ANN hard_neg_id == exact hard_neg_id over all anchors —
    the shortlist recall of the true hard negative), both wall-times,
    and the ANN leg's wall at ``k_scale``× vectors where the exact
    twin is out of its comfort zone."""
    from molgraphdb_spark.queries.similarity import (
        embedding_hard_negatives,
        embedding_hard_negatives_ann,
    )

    out = f"{BASE}/emb_hardneg"
    if os.path.exists(out):
        shutil.rmtree(out)
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    planted = emb.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 200 + n_plant)
    ).select(
        (F.col("vec_id") + 900_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x.cast("double") + ((i % 7) - 3).cast("double") * 1e-5).cast("float"),
        ).alias("embedding"),
        (F.col("label") + 100).alias("label"),  # guaranteed different label
    )
    emb.unionByName(planted).repartition(8).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    t0 = time.time()
    exact = {r.vec_id: r for r in embedding_hard_negatives(spark, out).collect()}
    t_exact = time.time() - t0
    t0 = time.time()
    ann = {r.vec_id: r for r in embedding_hard_negatives_ann(spark, out).collect()}
    t_ann = time.time() - t0

    plant_ok_exact = sum(
        1
        for a in range(200, 200 + n_plant)
        if exact[a].hard_neg_id == a + 900_000 and exact[a].margin_ubp < 0
    )
    plant_ok_ann = sum(
        1
        for a in range(200, 200 + n_plant)
        if ann[a].hard_neg_id == a + 900_000 and ann[a].margin_ubp < 0
    )
    common = [v for v in exact if v in ann]
    agree = sum(1 for v in common if ann[v].hard_neg_id == exact[v].hard_neg_id)

    # scale leg: ANN alone at k_scale× (the exact twin's guard regime)
    emb_dir = build_embeddings(spark, k_scale)
    t0 = time.time()
    n_rows_10x = embedding_hard_negatives_ann(spark, emb_dir).count()
    t_ann_10x = time.time() - t0

    return {
        "probe": "hard_negatives",
        "vectors": 2000 + n_plant,
        "planted": n_plant,
        "plant_ok_exact": plant_ok_exact,
        "plant_ok_ann": plant_ok_ann,
        "anchors": len(common),
        "hard_neg_agreement": round(agree / len(common), 4),
        "t_exact_s": round(t_exact, 1),
        "t_ann_s": round(t_ann, 1),
        "vectors_10x": 2000 * k_scale,
        "ann_rows_10x": n_rows_10x,
        "t_ann_10x_s": round(t_ann_10x, 1),
    }


def probe_ann_production(
    spark,
    n_target: int = 2_000_000,
    nprobe: int = 8,
    n_anchor_base: int = 5,
    n_plant: int = 20,
) -> dict:
    """The ANN shortlist at PRODUCTION shape (r10 verdict item 4):
    every earlier probe ran the query's test-scale K=8; the
    O(√n)-per-anchor claim in embedding_hard_negatives_ann's docstring
    needs K ~ √n measured. This probe runs IVF assign → probe →
    cell equi-join → argmax tail at n = 2M vectors with
    K = ⌊√n⌋ = 1414 centroids and ``nprobe`` = 8.

    Production-kernel note: at K in the thousands the literal-array
    fold the query uses for K=8 is the wrong assignment kernel — the
    real one is a BLAS matmul (what FAISS does). Since r12 that kernel
    LIVES IN THE ENGINE (operators/ivf.assign_cells_cos_ubp dispatches
    on K > ASSIGN_LITERAL_MAX_K to one Arrow mapInPandas pass computing
    (batch × dim) @ (dim × K) + per-row top-nprobe, norms computed in
    the same pass), and this probe calls that helper — so the probe
    measures the exact code path the registry queries take at
    production K. The rest of the pipeline — explode, cid equi-join,
    JVM cosine fold, max_by — is exactly the query's JVM-side plan
    shape, and the cell histogram check is the engine's
    require_balanced_cells gate (SCALE.md §12), not probe-local code.

    Measured: per-stage walls (assign+probe materialized via eager
    localCheckpoint, then join+argmax), cell-balance stats (mean/max
    cell size — the equi-join skew check), candidate volume vs the
    exact twin's all-pairs volume, and recall: ``n_plant`` planted
    different-label near-twins (the probe_hard_negatives plant) must
    each be recovered as their anchor's hard negative."""
    from molgraphdb_spark.operators import ivf

    def _mark(msg):
        print(f"[ann_production +{time.time() - _t_start:.0f}s] {msg}", file=sys.stderr)

    _t_start = time.time()
    k_scale = max(n_target // 2000, 1)
    # Probe-local corpus: build_embeddings' ±rep·8e-3 drift is fine at
    # k=10 but at k=1000 the drift term (up to ±8/dim vs unit-norm base
    # vectors) dominates, and assignment collapses into ONE cell
    # holding 86% of the corpus (measured: max cell 1.73M of 2M — the
    # exact equi-join skew failure the r10 verdict told this probe to
    # look for). Use a BOUNDED per-(rep, dim) perturbation (±0.022)
    # instead: 2000 near-dup clusters of k replicas, measured cell
    # balance max ≈ 3.9× mean — a realistic near-dup-heavy corpus.
    out = f"{BASE}/emb_prod"
    if os.path.exists(out):
        shutil.rmtree(out)
    src = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    src.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(k_scale - 1))).alias("rep"),
        "embedding", "label",
    ).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x.cast("double")
                + (((F.col("rep") * 31 + (i + 1) * 17) % 23) - 11).cast("double")
                * 2e-3
            ).cast("float"),
        ).alias("embedding"),
        "label",
    ).repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    emb_dir = out
    _mark("corpus built")
    # plant different-label near-twins for anchors = base ids 200..:
    # ids far above any replica id (replicas top out at 999·1e6+1999)
    emb0 = spark.read.parquet(f"{emb_dir}/embeddings.parquet")
    planted = (
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        .filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 200 + n_plant))
        .select(
            (F.col("vec_id") + 1_500_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x.cast("double") + ((i % 7) - 3).cast("double") * 1e-5
                ).cast("float"),
            ).alias("embedding"),
            (F.col("label") + 100).alias("label"),
        )
    )
    planted.write.mode("append").parquet(f"{emb_dir}/embeddings.parquet")
    emb = (
        spark.read.parquet(f"{emb_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"), "label")
    )
    n = emb.count()
    _mark(f"n={n}")
    K = int(n ** 0.5)
    # deterministic centroids: the replica-0 originals vec_id < K
    cents_rows = sorted(
        emb.filter(F.col("vec_id") < K).select("vec_id", "v").collect(),
        key=lambda r: r.vec_id,
    )
    cents = [(int(r.vec_id), [float(x) for x in r.v]) for r in cents_rows]
    assert len(cents) > ivf.ASSIGN_LITERAL_MAX_K  # the K-dispatch MUST take BLAS

    t0 = time.time()
    # THE ENGINE's K-dispatched kernel (one Arrow/BLAS pass: cid +
    # top-nprobe probes + per-vector norm, v and label pass straight
    # through so NO post-hoc join re-attaches columns the pass held).
    ap = ivf.assign_cells_cos_ubp(
        emb.repartition(64), "v", cents, nprobe=nprobe, with_norm=True
    ).localCheckpoint(eager=True)
    t_assign = time.time() - t0
    _mark(f"assign done ({t_assign:.0f}s)")

    # The SCALE.md §12 gate as shipped: raises on cell_max > 10× mean
    # (this corpus is the bounded-perturbation one, measured ~3.9×).
    cell = ivf.require_balanced_cells(ap)

    # anchors: base ids < n_anchor_base across ALL replicas (k_scale ×
    # n_anchor_base anchors) + the planted-pair base anchors 200..220
    anchor_pred = (F.col("vec_id") % 1_000_000 < n_anchor_base) | (
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 200 + n_plant)
    )
    anchors = ap.filter(anchor_pred).select(
        F.col("vec_id").alias("ia"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        F.col("label").alias("la"),
        F.explode("probes").alias("cid"),
    )
    n_anchors = k_scale * n_anchor_base + n_plant

    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("na") * F.col("nb"))
    t0 = time.time()
    # broadcast the (k_scale·n_anchor_base + n_plant)-row probe side:
    # the mine is then MAP-side over the corpus scan, and the 226M-row
    # candidate stream collapses into the partial aggregate without
    # ever shuffling wide vector rows (on a cluster the same plan
    # shape holds with the probes broadcast to every executor).
    mined = (
        F.broadcast(anchors).join(
            ap.select(
                F.col("vec_id").alias("ib"),
                F.col("v").alias("vb"),
                F.col("nrm").alias("nb"),
                F.col("label").alias("lb"),
                "cid",
            ),
            "cid",
        )
        .filter(F.col("ia") != F.col("ib"))
        .filter(F.col("la") != F.col("lb"))
        .withColumn("s", cos)
        .groupBy("ia")
        .agg(F.max_by("ib", F.struct(F.col("s"), -F.col("ib"))).alias("hard_neg_id"),
             F.max("s").alias("hard_neg_cos"))
    )
    hard = {r.ia: r for r in mined.collect()}
    t_mine = time.time() - t0
    _mark(f"mine done ({t_mine:.0f}s)")

    plant_ok = sum(
        1
        for a in range(200, 200 + n_plant)
        if a in hard and hard[a].hard_neg_id == a + 1_500_000_000
    )
    spark.catalog.clearCache()
    candidates = n_anchors * nprobe * float(cell["mean_sz"])
    return {
        "probe": "ann_production",
        "vectors": n,
        "K": K,
        "nprobe": nprobe,
        "n_cells_used": int(cell["n_cells"]),
        "cell_mean": round(float(cell["mean_sz"]), 1),
        "cell_max": int(cell["max_sz"]),
        "anchors": n_anchors,
        "cand_per_anchor": int(candidates / n_anchors),
        "cand_frac_of_allpairs": round(candidates / (n_anchors * float(n)), 5),
        "plant_recall": round(plant_ok / n_plant, 4),
        "t_assign_s": round(t_assign, 1),
        "t_mine_s": round(t_mine, 1),
    }


def _build_drift_corpus(spark, n_target: int, n_plant: int, mark=None):
    """The r11 collapse corpus: rep-scaled drift (every replica drifts
    further along one shared pseudo-direction, so high-rep vectors all
    argmax to the same centroid — 86% of the corpus in ONE cell) plus
    planted different-label near-twins of base anchors 200..200+n_plant.
    Shared by probe_ann_hot_cell and probe_ann_spill. Returns
    (emb, cents, n, K)."""
    from molgraphdb_spark.operators import ivf

    k_scale = max(n_target // 2000, 1)
    out = f"{BASE}/emb_hot"
    if os.path.exists(out):
        shutil.rmtree(out)
    src = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    # THE collapse drift: per-dim step from a fixed pseudo-direction u,
    # magnitude proportional to rep (up to ±k_scale·8e-3·5 per dim —
    # dwarfs the unit-norm base for high rep, exactly the r11 failure).
    src.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(k_scale - 1))).alias("rep"),
        "embedding", "label",
    ).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x.cast("double")
                + F.col("rep").cast("double")
                * ((((i * 29 + 7) % 11) - 5)).cast("double")
                * 8e-3
            ).cast("float"),
        ).alias("embedding"),
        "label",
    ).repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    # planted different-label near-twins of base anchors 200..219
    spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 200 + n_plant)
    ).select(
        (F.col("vec_id") + 1_500_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x.cast("double") + ((i % 7) - 3).cast("double") * 1e-5).cast(
                "float"
            ),
        ).alias("embedding"),
        (F.col("label") + 100).alias("label"),
    ).write.mode("append").parquet(f"{out}/embeddings.parquet")
    emb = (
        spark.read.parquet(f"{out}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"), "label")
    )
    n = emb.count()
    K = int(n ** 0.5)
    cents = [
        (int(r.vec_id), [float(x) for x in r.v])
        for r in sorted(
            emb.filter(F.col("vec_id") < K).select("vec_id", "v").collect(),
            key=lambda r: r.vec_id,
        )
    ]
    assert len(cents) > ivf.ASSIGN_LITERAL_MAX_K
    if mark is not None:
        mark(f"corpus built n={n} K={K}")
    return emb, cents, n, K


def probe_ann_hot_cell(
    spark,
    n_target: int = 200_000,
    nprobe: int = 8,
    n_plant: int = 20,
) -> dict:
    """The hot-centroid REMEDIATION at the r11 collapse shape (r12
    verdict item 3): rebuild the corpus class that collapsed 86% of a
    2M-vector corpus into ONE cell (unbounded rep-scaled drift — every
    replica drifts further along one shared direction, so high-rep
    vectors all argmax to the same centroid), then drive it through
    operators/ivf.assign_cells_balanced instead of the raising gate.

    Asserts and records:
    * the plain gate DOES raise on this corpus (pre_ratio > 10 — the
      probe exists because the failure is real, not hypothetical);
    * assign_cells_balanced splits the hot centroid(s) by local
      hash-seeded k-means re-train (fan-out ∝ overload) and the
      post-split histogram bounds the equi-join (post_max_cell ≪
      pre_max_cell; post_ratio recorded, spill cells if any);
    * RECALL IS PRESERVED EXACTLY: the planted different-label
      near-twins mined through the split index (expand_probes parent→
      leaves) equal the twins mined through the UNSPLIT index — same
      candidate set by construction, verified empirically end-to-end.
    """
    from molgraphdb_spark.operators import ivf

    def _mark(msg):
        print(f"[ann_hot_cell +{time.time() - _t0:.0f}s] {msg}", file=sys.stderr)

    _t0 = time.time()
    emb, cents, n, K = _build_drift_corpus(spark, n_target, n_plant, mark=_mark)

    # 1) the shipped gate must RAISE here (this is the planted failure)
    t0 = time.time()
    plain = ivf.assign_cells_cos_ubp(
        emb.repartition(64), "v", cents, nprobe=nprobe, with_norm=True
    ).localCheckpoint(eager=True)
    t_assign = time.time() - t0
    pre = ivf.cell_balance(plain)
    gate_raised = False
    try:
        ivf.require_balanced_cells(plain)
    except ValueError:
        gate_raised = True
    assert gate_raised and pre["ratio"] > ivf.CELL_BALANCE_MAX_RATIO
    _mark(
        f"plain assign {t_assign:.0f}s; pre ratio {pre['ratio']:.0f} "
        f"(max {pre['max_sz']} of {n})"
    )

    def _mine(ap) -> dict:
        anchors = ap.filter(
            (F.col("vec_id") >= 200) & (F.col("vec_id") < 200 + n_plant)
        ).select(
            F.col("vec_id").alias("ia"),
            F.col("v").alias("va"),
            F.col("nrm").alias("na"),
            F.col("label").alias("la"),
            F.explode("probes").alias("cid"),
        )
        dot = F.aggregate(
            F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        mined = (
            F.broadcast(anchors)
            .join(
                ap.select(
                    F.col("vec_id").alias("ib"),
                    F.col("v").alias("vb"),
                    F.col("nrm").alias("nb"),
                    F.col("label").alias("lb"),
                    "cid",
                ),
                "cid",
            )
            .filter((F.col("ia") != F.col("ib")) & (F.col("la") != F.col("lb")))
            .withColumn("s", dot / (F.col("na") * F.col("nb")))
            .groupBy("ia")
            .agg(F.max_by("ib", F.struct(F.col("s"), -F.col("ib"))).alias("hn"))
        )
        return {r.ia: r.hn for r in mined.collect()}

    t0 = time.time()
    base_mine = _mine(plain)
    t_mine_unsplit = time.time() - t0
    _mark(f"unsplit mine {t_mine_unsplit:.0f}s")

    # 2) the remediation: split instead of raise, then the same mine
    t0 = time.time()
    bal, cents_out, stats = ivf.assign_cells_balanced(
        emb.repartition(64), "v", cents, id_col="vec_id",
        nprobe=nprobe, with_norm=True,
    )
    bal = ivf.expand_probes(bal, stats["split_map"]).localCheckpoint(eager=True)
    t_rebalance = time.time() - t0
    _mark(
        f"rebalance {t_rebalance:.0f}s: rounds={stats['rounds']} "
        f"splits={len(stats['split_map'])} ratio {pre['ratio']:.0f}->"
        f"{stats['ratio']:.1f} spill={stats['spill_cids']}"
    )
    t0 = time.time()
    split_mine = _mine(bal)
    t_mine_split = time.time() - t0

    plant_ids = set(range(200, 200 + n_plant))
    recall_unsplit = sum(
        1 for a in plant_ids if base_mine.get(a) == a + 1_500_000_000
    ) / n_plant
    recall_split = sum(
        1 for a in plant_ids if split_mine.get(a) == a + 1_500_000_000
    ) / n_plant
    # the headline invariant: the split index mines the SAME hard
    # negative for every planted anchor — recall preserved exactly
    assert split_mine == base_mine, "split index changed the mined set"
    spark.catalog.clearCache()
    return {
        "probe": "ann_hot_cell",
        "vectors": n,
        "K": K,
        "gate_raised_unsplit": gate_raised,
        "pre_ratio": round(float(pre["ratio"]), 1),
        "pre_max_cell": int(pre["max_sz"]),
        "post_ratio": round(float(stats["ratio"]), 2),
        "post_max_cell": int(stats["max_sz"]),
        "split_rounds": stats["rounds"],
        "cells_split": len(stats["split_map"]),
        "n_cells_after": int(stats["n_cells"]),
        "spill_cids": len(stats["spill_cids"]),
        "recall_unsplit": round(recall_unsplit, 4),
        "recall_split": round(recall_split, 4),
        "mined_sets_identical": split_mine == base_mine,
        "t_assign_s": round(t_assign, 1),
        "t_rebalance_s": round(t_rebalance, 1),
        "t_mine_unsplit_s": round(t_mine_unsplit, 1),
        "t_mine_split_s": round(t_mine_split, 1),
    }


def probe_ann_spill(
    spark,
    n_target: int = 200_000,
    nprobe: int = 8,
    n_plant: int = 20,
) -> dict:
    """The spill_cids CONSUMER end-to-end (r13 verdict item 3's probe
    row): the ann_hot_cell collapse corpus rerun with splits DISABLED
    (``max_rounds=0``), so the hot cells come back as
    ``stats["spill_cids"]`` instead of being re-trained away — the
    degradation case assign_cells_balanced documents. The planted
    near-twins are then mined through
    ``ivf.shortlist_with_spill`` (cold cells: plain equi-join; spilled
    cells: salted exact channel — members salted by xxhash64(id),
    anchors replicated across the buckets) and the probe asserts the
    mined set is IDENTICAL to the plain unsalted equi-join's — recall
    1.0 on the spilled cells by construction, now measured at the
    collapse shape, not just the unit fixture."""
    from molgraphdb_spark.operators import ivf

    def _mark(msg):
        print(f"[ann_spill +{time.time() - _t0:.0f}s] {msg}", file=sys.stderr)

    _t0 = time.time()
    emb, cents, n, K = _build_drift_corpus(spark, n_target, n_plant, mark=_mark)

    t0 = time.time()
    bal, _, stats = ivf.assign_cells_balanced(
        emb.repartition(64), "v", cents, id_col="vec_id",
        nprobe=nprobe, with_norm=True, max_rounds=0,
    )
    bal = bal.localCheckpoint(eager=True)
    t_assign = time.time() - t0
    assert stats["split_map"] == {} and stats["spill_cids"], (
        "splits disabled: the collapse corpus must SPILL its hot cells"
    )
    spill = stats["spill_cids"]
    _mark(
        f"assign {t_assign:.0f}s: ratio {stats['ratio']:.0f}, "
        f"{len(spill)} spill cell(s), max cell {stats['max_sz']} of {n}"
    )

    anchors = bal.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 200 + n_plant)
    ).select(
        F.col("vec_id").alias("ia"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
        F.col("label").alias("la"),
        F.explode("probes").alias("cid"),
    )
    members = bal.select(
        F.col("vec_id").alias("ib"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
        F.col("label").alias("lb"),
        "cid",
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _mine(joined) -> dict:
        mined = (
            joined.filter((F.col("ia") != F.col("ib")) & (F.col("la") != F.col("lb")))
            .withColumn("s", dot / (F.col("na") * F.col("nb")))
            .groupBy("ia")
            .agg(F.max_by("ib", F.struct(F.col("s"), -F.col("ib"))).alias("hn"))
        )
        return {r.ia: r.hn for r in mined.collect()}

    t0 = time.time()
    plain_mine = _mine(F.broadcast(anchors).join(members, "cid"))
    t_mine_plain = time.time() - t0
    _mark(f"plain mine {t_mine_plain:.0f}s")

    t0 = time.time()
    spill_mine = _mine(
        ivf.shortlist_with_spill(anchors, members, spill, member_id_col="ib")
    )
    t_mine_spill = time.time() - t0
    _mark(f"spill-channel mine {t_mine_spill:.0f}s")

    plant_ids = set(range(200, 200 + n_plant))
    recall_plain = sum(
        1 for a in plant_ids if plain_mine.get(a) == a + 1_500_000_000
    ) / n_plant
    recall_spill = sum(
        1 for a in plant_ids if spill_mine.get(a) == a + 1_500_000_000
    ) / n_plant
    assert spill_mine == plain_mine, "spill channel changed the mined set"
    spark.catalog.clearCache()
    return {
        "probe": "ann_spill",
        "vectors": n,
        "K": K,
        "ratio_unsplit": round(float(stats["ratio"]), 1),
        "max_cell": int(stats["max_sz"]),
        "spill_cells": len(spill),
        "n_salt": int(spark.conf.get("spark.sql.shuffle.partitions")),
        "recall_plain": round(recall_plain, 4),
        "recall_spill": round(recall_spill, 4),
        "mined_sets_identical": spill_mine == plain_mine,
        "t_assign_s": round(t_assign, 1),
        "t_mine_plain_s": round(t_mine_plain, 1),
        "t_mine_spill_s": round(t_mine_spill, 1),
    }


def probe_decode_adversarial(spark, n_rows: int = 40_000) -> dict:
    """Per-row ValueError isolation at VOLUME (r12 verdict item 6):
    the codec hardening (allocation caps, CRC checks, truncation
    guards) is unit-tested row-at-a-time; this probe proves the
    quarantine contract holds inside mapInPandas under load — one
    ingest pass over an interleaved corpus of valid FLAC/JPEG payloads
    and five malformed classes (truncation, empty, the ~512 GB FLAC
    declared-size bomb, CRC corruption, the ~34 GB JPEG SOF bomb)
    finishes with ZERO task retries, every valid row decoded, every
    malformed row quarantined, and every quarantine error a
    ValueError (never struct.error/IndexError/MemoryError — the
    documented codec contract)."""
    import pandas as pd

    out_dir = f"{BASE}/adversarial"
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    def synth(batches):
        import numpy as np

        from molgraphdb_spark.functions.flac import encode_flac
        from molgraphdb_spark.functions.jpeg import encode_jpeg

        for pdf in batches:
            rows = []
            for rid in pdf["id"]:
                rid = int(rid)
                cls = rid % 8
                if cls in (0, 1, 2):  # valid FLAC
                    n = 160 + rid % 80
                    samples = ((np.arange(n) * 13 + rid * 7) % 251 - 125) * 64
                    rows.append((rid, cls, "flac", encode_flac(8000, samples)))
                elif cls == 3:  # valid JPEG (16x16 gray)
                    px = bytes([64 + (rid % 32) * 2]) * 256
                    rows.append((rid, cls, "jpeg", encode_jpeg(16, 16, px)))
                elif cls == 4:  # truncated FLAC / empty payload
                    good = encode_flac(8000, ((np.arange(200) * 11) % 200 - 100) * 50)
                    rows.append(
                        (rid, cls, "flac", b"" if rid % 3 == 0 else good[: len(good) // 2])
                    )
                elif cls == 5:  # FLAC declared-size bomb (2^36 samples)
                    good = bytearray(encode_flac(8000, ((np.arange(150) * 3) % 99) * 64))
                    off = 4 + 4 + 10
                    packed = int.from_bytes(good[off : off + 8], "big")
                    packed |= (1 << 36) - 1
                    good[off : off + 8] = packed.to_bytes(8, "big")
                    rows.append((rid, cls, "flac", bytes(good)))
                elif cls == 6:  # CRC corruption mid-frame
                    good = bytearray(encode_flac(8000, ((np.arange(180) * 5) % 151 - 75) * 32))
                    good[3 * len(good) // 4] ^= 0x5A
                    rows.append((rid, cls, "flac", bytes(good)))
                else:  # cls == 7: JPEG SOF bomb (65500x65500 declared)
                    good = bytearray(encode_jpeg(16, 16, bytes([128]) * 256))
                    sof = good.find(b"\xff\xc0")
                    assert sof >= 0
                    good[sof + 5 : sof + 9] = (65500).to_bytes(2, "big") * 2
                    rows.append((rid, cls, "jpeg", bytes(good)))
            yield pd.DataFrame(rows, columns=["doc_id", "cls", "fmt", "payload"])

    t0 = time.time()
    spark.range(n_rows).repartition(32).mapInPandas(
        synth, schema="doc_id long, cls int, fmt string, payload binary"
    ).write.mode("overwrite").parquet(out_dir)
    t_synth = time.time() - t0

    def ingest(batches):
        from molgraphdb_spark.functions.flac import flac_signal_features
        from molgraphdb_spark.functions.jpeg import jpeg_luminance_features

        for pdf in batches:
            rows = []
            for rid, cls, fmt, payload in zip(
                pdf["doc_id"], pdf["cls"], pdf["fmt"], pdf["payload"]
            ):
                b = bytes(payload)
                try:
                    if fmt == "flac":
                        flac_signal_features(b)
                    else:
                        jpeg_luminance_features(b)
                    rows.append((int(rid), int(cls), 1, None))
                except Exception as e:  # noqa: BLE001 — the probe RECORDS the type
                    rows.append((int(rid), int(cls), 0, type(e).__name__))
            yield pd.DataFrame(rows, columns=["doc_id", "cls", "ok", "err"])

    t0 = time.time()
    agg = (
        spark.read.parquet(out_dir)
        .mapInPandas(ingest, schema="doc_id long, cls int, ok int, err string")
        .groupBy("cls", "ok", "err")
        .count()
        .collect()
    )
    t_ingest = time.time() - t0
    by_cls: dict = {}
    err_types = set()
    for r in agg:
        by_cls.setdefault(int(r.cls), []).append((int(r.ok), r.err, int(r["count"])))
        if r.err is not None:
            err_types.add(r.err)
    total = sum(c for v in by_cls.values() for _, _, c in v)
    assert total == n_rows  # nothing lost, no task kill
    for cls in (0, 1, 2, 3):  # valid classes decode, all of them
        assert by_cls[cls] == [(1, None, n_rows // 8 + (1 if cls < n_rows % 8 else 0))]
    for cls in (4, 5, 6, 7):  # malformed classes quarantine, all of them
        assert all(ok == 0 for ok, _, _ in by_cls[cls]), by_cls[cls]
    assert err_types == {"ValueError"}, err_types  # the codec contract
    shutil.rmtree(out_dir)
    return {
        "probe": "decode_adversarial",
        "rows": n_rows,
        "valid_decoded": sum(
            c for cls in (0, 1, 2, 3) for ok, _, c in by_cls[cls] if ok
        ),
        "quarantined": sum(
            c for cls in (4, 5, 6, 7) for ok, _, c in by_cls[cls] if not ok
        ),
        "quarantine_error_types": sorted(err_types),
        "t_synth_s": round(t_synth, 1),
        "t_ingest_s": round(t_ingest, 1),
        "ingest_docs_per_s": int(n_rows / t_ingest),
    }


def probe_pq_production(spark, k: int = 1000, n_queries: int = 5) -> dict:
    """IVF-PQ at PRODUCTION geometry (r11 verdict item 6): the earlier
    pq probe ran the toy 8×16 codebook; FAISS's default is M=16
    subspaces × K=256 codes. At K=256 the literal-fold encoder would
    be ~16k expression nodes (past the 64 KB codegen method limit,
    interpreted) — the engine's pq_encode now K-dispatches to the
    Arrow/BLAS kernel (operators/pq._pq_encode_blas), and this probe
    measures THAT code path end to end on a 2M-vector corpus:

    - t_train: 16 per-subspace Lloyd's fits at K=256 on the base rows
      (training never needs the replicated corpus); the per-iteration
      assignment also rides the BLAS dispatch (K=256 > 32).
    - t_index: the ONE-TIME 2M-row assign+encode pass
      (operators/pq.ivfpq_index), materialized — production builds the
      index once and persists it; charging it to every query batch is
      how the first version of this probe made IVF-PQ look 11x SLOWER
      than brute force at Q=5.
    - t_lut_ms_per_query: the driver-side ADC LUT build constant
      (M·K·dsub = 16·256·4 = 16,384 squared diffs per query — the
      cost every query pays before touching the corpus).
    - t_ivfpq_search_s: the QUERY-SIDE wall over the reused index
      (probe join → ADC fold → shortlist → exact rerank).
    - recall@3 of shortlist+rerank IVF-PQ vs the exact L2 scan."""
    from molgraphdb_spark.operators.ivf import ASSIGN_LITERAL_MAX_K
    from molgraphdb_spark.operators.kmeans import kmeans_fit
    from molgraphdb_spark.operators.pq import (
        ivfpq_index,
        ivfpq_search,
        pq_train,
    )

    M, K, COARSE_K = 16, 256, 64
    assert K > ASSIGN_LITERAL_MAX_K  # the dispatch MUST take BLAS

    emb_dir = f"{BASE}/emb_k{k}"
    if not os.path.exists(emb_dir):
        emb_dir = build_embeddings(spark, k)
    emb = (
        spark.read.parquet(f"{emb_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )
    n_vecs = emb.count()
    base = emb.filter(F.col("vec_id") < 1_000_000)

    t0 = time.time()
    coarse = kmeans_fit(base, "v", "vec_id", k=COARSE_K, n_iter=2)
    books = pq_train(base, "v", "vec_id", m=M, k=K, n_iter=2)
    t_train = time.time() - t0

    t0 = time.time()
    indexed = ivfpq_index(emb, "v", coarse, books).localCheckpoint(eager=True)
    n_encoded = indexed.count()
    t_index = time.time() - t0

    qrows = base.filter(F.col("vec_id") < n_queries).collect()
    queries = [(r["vec_id"], list(r["v"])) for r in qrows]

    # the ADC LUT-build constant, measured standalone (same loop
    # pq_adc_topk/ivfpq_search run driver-side per query batch)
    dsub = 64 // M
    t0 = time.time()
    for _, qv in queries:
        q = [float(x) for x in qv]
        [
            [
                sum((q[s * dsub + j] - cb[c][1][j]) ** 2 for j in range(dsub))
                for c in range(len(cb))
            ]
            for s, cb in enumerate(books)
        ]
    t_lut = (time.time() - t0) / max(len(queries), 1)

    t0 = time.time()
    got = {}
    res = ivfpq_search(
        emb, "v", "vec_id", queries, coarse, books,
        k=3, nprobe=8, shortlist=50, indexed=indexed,
    )
    for r in res.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    t_search = time.time() - t0

    qdf = spark.createDataFrame(
        [(int(q), v) for q, v in queries], "query_id long, qv array<double>"
    )
    diff = F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x - y)
    d2 = F.aggregate(
        F.zip_with(diff, diff, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    t0 = time.time()
    exact = (
        F.broadcast(qdf)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    )
    t_exact = time.time() - t0
    hits = sum(1 for r in exact if r["vec_id"] in got.get(r["query_id"], set()))
    spark.catalog.clearCache()
    return {
        "probe": "pq_production",
        "vectors": n_vecs,
        "m": M,
        "k_per_subspace": K,
        "coarse_k": COARSE_K,
        "n_encoded": n_encoded,
        "t_train_s": round(t_train, 1),
        "t_index_s": round(t_index, 1),
        "t_lut_ms_per_query": round(t_lut * 1000, 2),
        "t_ivfpq_search_s": round(t_search, 1),
        "t_exact_s": round(t_exact, 1),
        "recall_at3": round(hits / max(len(exact), 1), 4),
    }


def probe_pq_persisted(
    spark, k: int = 1000, n_queries: int = 5, nprobe: int = 8
) -> dict:
    """The persisted IVF-PQ index at PRODUCTION geometry (r13 verdict
    item 6): the r13 partition-pruning pin ran at toy scale only — this
    probe writes ``write_ivfpq_index`` on the pq_production corpus
    (2M vectors, M=16, K=256, 64 coarse cells) and MEASURES the
    build-once / prune-per-batch story:

    - t_write_s: the one-time partitioned-parquet index write;
    - files/bytes on disk, total vs the probed cells' directories —
      the ground-truth ceiling on what a statically-pruned query batch
      can touch (expect cells_probed ≤ Q·nprobe of 64 directories; the
      probed cids are recomputed driver-side with the SAME ubp+lexsort
      rule ivfpq_search uses);
    - the production-geometry plan pin: every parquet scan in the
      search plan carries the static ``cid IN`` PartitionFilters (the
      post-r14 shape: ADC scan AND exact rerank both read the pruned
      index, the base table appears nowhere);
    - t_search_s: query-batch wall against the reloaded index.

    PQ codebooks train on a 250k sample — code quality is irrelevant
    to the I/O claim; recall at this geometry is probe_pq_production's
    job."""
    import re as _re

    from molgraphdb_spark.operators.kmeans import kmeans_fit
    from molgraphdb_spark.operators.pq import (
        ivfpq_index,
        ivfpq_search,
        pq_train,
        read_ivfpq_index,
        write_ivfpq_index,
    )

    def _mark(msg):
        print(f"[pq_persisted +{time.time() - _t0:.0f}s] {msg}", file=sys.stderr)

    _t0 = time.time()
    M, KSUB, COARSE_K = 16, 256, 64
    emb_dir = f"{BASE}/emb_k{k}"
    if not os.path.exists(emb_dir):
        emb_dir = build_embeddings(spark, k)
    emb = (
        spark.read.parquet(f"{emb_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )
    n_vecs = emb.count()
    base = emb.filter(F.col("vec_id") < 1_000_000)
    sample = emb.filter(F.col("vec_id") < 250_000)
    coarse = kmeans_fit(base, "v", "vec_id", k=COARSE_K, n_iter=2)
    books = pq_train(sample, "v", "vec_id", m=M, k=KSUB, n_iter=2)
    _mark(f"trained coarse K={COARSE_K}, books M={M}xK={KSUB} on n={n_vecs}")

    path = f"{BASE}/ivfpq_index_k{k}"
    if os.path.exists(path):
        shutil.rmtree(path)
    t0 = time.time()
    write_ivfpq_index(ivfpq_index(emb, "v", coarse, books), path)
    t_write = time.time() - t0
    _mark(f"index written {t_write:.0f}s")

    # filesystem ground truth: bytes/files per coarse-cell directory
    per_cell: dict[int, tuple[int, int]] = {}
    for d in os.listdir(path):
        if not d.startswith("cid="):
            continue
        cid = int(d.split("=")[1])
        fs = [
            os.path.getsize(os.path.join(path, d, f))
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        per_cell[cid] = (len(fs), sum(fs))
    files_total = sum(a for a, _ in per_cell.values())
    bytes_total = sum(b for _, b in per_cell.values())

    qrows = base.filter(F.col("vec_id") < n_queries).collect()
    queries = [(r["vec_id"], list(r["v"])) for r in qrows]
    # the probed cells, recomputed with ivfpq_search's own driver-side
    # rule (ubp-floored L2, lexsort ties to lowest cid)
    import numpy as np

    cmat = np.array([cv for _, cv in coarse], dtype=np.float64)
    cids = np.array([int(c) for c, _ in coarse], dtype=np.int64)
    Q = np.array([[float(x) for x in qv] for _, qv in queries], dtype=np.float64)
    d2 = (
        (Q * Q).sum(axis=1)[:, None]
        + (cmat * cmat).sum(axis=1)[None, :]
        - 2.0 * (Q @ cmat.T)
    )
    np.maximum(d2, 0.0, out=d2)
    d2 = np.floor(d2 * 1_000_000.0 + 0.5)
    probed = set()
    for qi in range(len(queries)):
        for c in np.lexsort((cids, d2[qi]))[:nprobe]:
            probed.add(int(cids[c]))
    assert len(probed) <= n_queries * nprobe
    files_probed = sum(per_cell[c][0] for c in probed if c in per_cell)
    bytes_probed = sum(per_cell[c][1] for c in probed if c in per_cell)

    loaded = read_ivfpq_index(spark, path)
    res = ivfpq_search(
        emb, "v", "vec_id", queries, coarse, books,
        k=3, nprobe=nprobe, shortlist=50, indexed=loaded,
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan parquet")
    # above the InSet conversion threshold (10 values) the static
    # pruning literal prints as `cid INSET ...`, not `cid IN (...)`
    n_pruned = len(
        _re.findall(r"PartitionFilters: \[[^\]]*cid[^\]]* (?:IN \(|INSET )", plan)
    )
    assert n_scans >= 2 and n_pruned == n_scans, plan[:2000]
    t0 = time.time()
    rows = res.collect()
    t_search = time.time() - t0
    assert len(rows) == 3 * len(queries)
    _mark(f"pruned search {t_search:.1f}s over {len(probed)} cells")
    spark.catalog.clearCache()
    return {
        "probe": "pq_persisted",
        "vectors": n_vecs,
        "m": M,
        "k_per_subspace": KSUB,
        "coarse_k": COARSE_K,
        "t_write_s": round(t_write, 1),
        "cells_total": len(per_cell),
        "cells_probed": len(probed),
        "files_total": files_total,
        "files_probed": files_probed,
        "bytes_total": bytes_total,
        "bytes_probed": bytes_probed,
        "bytes_probed_frac": round(bytes_probed / max(bytes_total, 1), 4),
        "plan_scans": n_scans,
        "plan_scans_pruned": n_pruned,
        "t_search_s": round(t_search, 1),
    }


def probe_pq(spark, k: int, n_queries: int = 5) -> dict:
    """IVF-PQ at k× vectors: train coarse (k=8) + PQ (8×16) on the
    BASE vectors only (replica-0 rows — training never needs the full
    corpus), index everything, then measure shortlist+rerank recall@3
    vs the exact L2 scan for ``n_queries`` base queries."""
    from molgraphdb_spark.operators.kmeans import kmeans_fit
    from molgraphdb_spark.operators.pq import ivfpq_search, pq_train

    emb_dir = f"{BASE}/emb_k{k}"
    if not os.path.exists(emb_dir):
        emb_dir = build_embeddings(spark, k)
    emb = (
        spark.read.parquet(f"{emb_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )
    n_vecs = emb.count()
    base = emb.filter(F.col("vec_id") < 1_000_000)

    t0 = time.time()
    coarse = kmeans_fit(base, "v", "vec_id", k=8, n_iter=3)
    books = pq_train(base, "v", "vec_id", m=8, k=16, n_iter=3)
    t_train = time.time() - t0

    qrows = base.filter(F.col("vec_id") < n_queries).collect()
    queries = [(r["vec_id"], list(r["v"])) for r in qrows]
    t0 = time.time()
    got = {}
    res = ivfpq_search(
        emb, "v", "vec_id", queries, coarse, books, k=3, nprobe=4, shortlist=50
    )
    for r in res.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    t_search = time.time() - t0

    # exact top-3 via one broadcast scan (the correctness baseline)
    qdf = spark.createDataFrame(
        [(int(q), v) for q, v in queries], "query_id long, qv array<double>"
    )
    diff = F.zip_with(F.col("v"), F.col("qv"), lambda x, y: x - y)
    d2 = F.aggregate(
        F.zip_with(diff, diff, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    t0 = time.time()
    exact = (
        F.broadcast(qdf)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    )
    t_exact = time.time() - t0
    hits = sum(1 for r in exact if r["vec_id"] in got.get(r["query_id"], set()))
    spark.catalog.clearCache()
    return {
        "probe": "pq",
        "k": k,
        "vectors": n_vecs,
        "t_train_s": round(t_train, 1),
        "t_ivfpq_search_s": round(t_search, 1),
        "t_exact_s": round(t_exact, 1),
        "recall_at3": round(hits / max(len(exact), 1), 4),
    }


def probe_phash(spark, sf_dir: str) -> dict:
    """Perceptual-hash dedup at 10× documents: replicas make payloads
    near-identical, so band buckets blow past MAX_BAND_BUCKET — the
    probe verifies the skew cap BITES (hot buckets excluded, candidate
    pairs bounded) while the query still completes in linear time;
    without the cap the hottest bucket alone would contribute
    C(bucket,2) pairs."""
    from molgraphdb_spark.queries.multimodal_queries import (
        MAX_BAND_BUCKET,
        _PHASH_BANDS,
        PHASH_BITS,
        _phash_rows,
        mm_phash_neardup,
        multimodal_manifest,
    )

    m = multimodal_manifest(spark, sf_dir)
    sig = m.select("doc_id", "payload").mapInPandas(
        _phash_rows, schema="doc_id long, phash string"
    )
    width = PHASH_BITS // _PHASH_BANDS
    bs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring("phash", b * width + 1, width).alias("content"),
            )
            for b in range(_PHASH_BANDS)
        ]
    )
    counts = (
        sig.select(F.explode(bs).alias("bb"))
        .select(F.col("bb.band").alias("band"), F.col("bb.content").alias("content"))
        .groupBy("band", "content")
        .count()
    )
    stats = counts.agg(
        F.max("count").alias("max_bucket"),
        F.sum((F.col("count") > MAX_BAND_BUCKET).cast("long")).alias("hot_buckets"),
        F.sum(
            F.when(F.col("count") > MAX_BAND_BUCKET, F.lit(0)).otherwise(
                F.col("count") * (F.col("count") - 1) / 2
            )
        ).alias("bounded_pairs"),
    ).collect()[0]
    t0 = time.time()
    n_pairs = mm_phash_neardup(spark, sf_dir).count()
    t = time.time() - t0
    spark.catalog.clearCache()
    return {
        "probe": "phash",
        "max_bucket": int(stats["max_bucket"]),
        "hot_buckets_skipped": int(stats["hot_buckets"]),
        "candidate_pairs_bounded": int(stats["bounded_pairs"]),
        "verified_pairs": n_pairs,
        "t_query_s": round(t, 1),
    }


def probe_bfs(spark, m: int = 40, depth: int = 4) -> dict:
    """BFS on a planted m-ary broom tree (layer d has m^d vertices,
    edges point down): dist(v) == its layer EXACTLY, the frontier loop
    runs exactly ``depth`` productive waves + 1 empty wave, and the
    per-dist histogram must be [1, m, m², …]. At m=40, depth=4 the
    edge table is ~2.6M rows — ~10× the sf0.1 graph family."""
    from molgraphdb_spark.operators.graph import bfs_distances

    offs = [0]
    for d in range(depth + 1):
        offs.append(offs[-1] + m**d)
    parts = []
    for d in range(depth):
        parts.append(
            spark.range(m**d)
            .select("id", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"))
            .select(
                (F.lit(offs[d]) + F.col("id")).alias("src"),
                (F.lit(offs[d + 1]) + F.col("id") * m + F.col("j")).alias("dst"),
            )
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    n_edges = edges.count()
    t0 = time.time()
    dist = bfs_distances(edges, source=0, max_depth=depth + 5)
    hist = {int(r["dist"]): int(r["n"]) for r in
            dist.groupBy("dist").agg(F.count(F.lit(1)).alias("n")).collect()}
    t = time.time() - t0
    expected = {d: m**d for d in range(depth + 1)}
    return {
        "probe": "graph_bfs", "m": m, "depth": depth, "edges": n_edges,
        "per_dist_counts_exact": bool(hist == expected),
        "waves": depth + 1,  # depth productive + 1 empty (loop exit)
        "t_total_s": round(t, 1),
        "t_per_wave_s": round(t / (depth + 1), 2),
    }


def probe_multi_bfs(spark, m: int = 40, depth: int = 4, n_seeds: int = 8) -> dict:
    """Multi-source BFS batching claim, measured: on the same m-ary
    broom tree as probe_bfs, BFS from n_seeds first-layer vertices via
    (a) ONE multi_bfs_distances wave loop vs (b) n_seeds independent
    single-source loops. Results must agree pairwise exactly (each
    seed sees its own m-ary subtree: dist histogram [1, m, m², …] one
    layer shallower); the batched wall should grow FAR slower than
    seeds× the single wall — the reason sampled closeness is routine
    and not K BFS jobs."""
    from molgraphdb_spark.operators.graph import bfs_distances, multi_bfs_distances

    offs = [0]
    for d in range(depth + 1):
        offs.append(offs[-1] + m**d)
    parts = []
    for d in range(depth):
        parts.append(
            spark.range(m**d)
            .select("id", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"))
            .select(
                (F.lit(offs[d]) + F.col("id")).alias("src"),
                (F.lit(offs[d + 1]) + F.col("id") * m + F.col("j")).alias("dst"),
            )
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    edges = edges.localCheckpoint()
    seeds = [offs[1] + i for i in range(n_seeds)]  # first-layer roots

    t0 = time.time()
    multi = multi_bfs_distances(edges, seeds, max_depth=depth + 5)
    m_hist = {
        (int(r["seed"]), int(r["dist"])): int(r["n"])
        for r in multi.groupBy("seed", "dist").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    t_multi = time.time() - t0

    t0 = time.time()
    s_hist = {}
    for s in seeds:
        for r in (
            bfs_distances(edges, s, max_depth=depth + 5)
            .groupBy("dist").agg(F.count(F.lit(1)).alias("n")).collect()
        ):
            s_hist[(s, int(r["dist"]))] = int(r["n"])
    t_single = time.time() - t0

    expected = {(s, d): m**d for s in seeds for d in range(depth)}
    return {
        "probe": "graph_multi_bfs", "m": m, "depth": depth, "n_seeds": n_seeds,
        "hist_exact": bool(m_hist == expected and s_hist == expected),
        "t_multi_s": round(t_multi, 1),
        "t_singles_total_s": round(t_single, 1),
        "speedup": round(t_single / max(t_multi, 1e-9), 1),
    }


def probe_pagerank(spark, n: int = 1_000_000, n_iter: int = 10) -> dict:
    """PageRank on a planted directed ring (1-regular both ways): the
    uniform distribution rank≡1.0 is the exact fixed point AND the
    exact trajectory from the uniform init — after any number of
    iterations every rank must still be 1.0 to float precision. 1M
    edges, 10 power iterations; wall per iteration recorded."""
    from molgraphdb_spark.operators.graph import pagerank

    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    t0 = time.time()
    ranks = pagerank(edges, n_iter=n_iter)
    stats = ranks.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.abs(F.col("rank") - 1.0)).alias("dev"),
    ).first()
    t = time.time() - t0
    return {
        "probe": "graph_pagerank", "vertices": n, "iters": n_iter,
        "n_ranked": int(stats["n"]),
        "max_abs_dev_from_uniform": float(stats["dev"]),
        "uniform_exact": bool(stats["n"] == n and stats["dev"] < 1e-9),
        "t_total_s": round(t, 1),
        "t_per_iter_s": round(t / n_iter, 2),
    }


def probe_graph_skew(spark, n: int = 2_000_000, n_iter: int = 10) -> dict:
    """PageRank + LPA under planted POWER-LAW-grade degree skew (r9
    verdict item 5 — the 1M-vertex pagerank probe is a uniform ring;
    real graphs have hot vertices). Hub-and-fans star: vertex 0 ↔ each
    of n/10 fans (hot degree = 2·n/10 ≈ |edges|/3), remaining vertices
    as isolated mutual pairs. Invariants are EXACT closed forms:

    - PageRank: by symmetry the graph has three rank values — hub,
      fan, pair — and the power-iteration trajectory from the uniform
      init is a 2-variable Python recurrence (pairs stay at 1.0
      exactly, the ring argument). Spark must match it per class to
      1e-9 relative after n_iter rounds; the hot groupBy(dst=hub)
      aggregates n/10 equal contributions via map-side combine — the
      thing this probe measures.
    - LPA (4 rounds, the registered default): bipartite period-2
      oscillation is DETERMINISTIC and pinned (the probe_curation
      precedent): after an even round the hub holds its own label 0
      (bounced hub→fans→hub), every fan holds 1 (the min fan label
      the hub adopted in round 1, re-adopted from the hub in even
      rounds... traced: r1 hub=1/fans=0, r2 hub=0/fans=1, r3
      hub=1/fans=0, r4 hub=0/fans=1), and each pair vertex holds its
      own id (period-2 identity)."""
    from molgraphdb_spark.operators.graph import label_propagation, pagerank

    m = n // 10
    fans = spark.range(1, m + 1).select(F.col("id").alias("src"), F.lit(0).alias("dst"))
    hub_out = spark.range(1, m + 1).select(F.lit(0).alias("src"), F.col("id").alias("dst"))
    # isolated mutual pairs over [m+1, n): (u, u+1) both directions
    pair_base = spark.range(m + 1, n - 1, 2)
    pairs_f = pair_base.select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    pairs_b = pair_base.select((F.col("id") + 1).alias("src"), F.col("id").alias("dst"))
    edges = fans.unionByName(hub_out).unionByName(pairs_f).unionByName(pairs_b)
    edges = edges.repartition(32).localCheckpoint()
    n_edges = edges.count()

    # --- PageRank: Spark vs the exact 2-variable trajectory ---
    t0 = time.time()
    ranks = pagerank(edges, n_iter=n_iter)
    got = {
        r["cls"]: (r["n"], r["mn"], r["mx"])
        for r in ranks.groupBy(
            F.when(F.col("id") == 0, "hub")
            .when(F.col("id") <= m, "fan")
            .otherwise("pair")
            .alias("cls")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.min("rank").alias("mn"), F.max("rank").alias("mx"))
        .collect()
    }
    t_pr = time.time() - t0
    r_h, r_f = 1.0, 1.0
    for _ in range(n_iter):
        r_h, r_f = 0.15 + 0.85 * (m * r_f), 0.15 + 0.85 * (r_h / m)
    def _close(a, b):
        return abs(a - b) <= 1e-9 * max(abs(a), abs(b), 1.0)
    pr_ok = (
        got["hub"][0] == 1 and _close(got["hub"][1], r_h) and _close(got["hub"][2], r_h)
        and got["fan"][0] == m
        and _close(got["fan"][1], r_f) and _close(got["fan"][2], r_f)
        and _close(got["pair"][1], 1.0) and _close(got["pair"][2], 1.0)
    )

    # --- LPA: period-2 oscillation pinned after 4 (even) rounds ---
    t0 = time.time()
    labels = label_propagation(edges, n_iter=4)
    lp = labels.agg(
        F.sum(F.when((F.col("id") == 0) & (F.col("label") == 0), 1).otherwise(0)).alias("hub_ok"),
        F.sum(
            F.when((F.col("id") >= 1) & (F.col("id") <= m) & (F.col("label") == 1), 1).otherwise(0)
        ).alias("fan_ok"),
        F.sum(
            F.when((F.col("id") > m) & (F.col("label") == F.col("id")), 1).otherwise(0)
        ).alias("pair_ok"),
        F.count(F.lit(1)).alias("n_total"),
    ).first()
    t_lpa = time.time() - t0
    n_pairs_v = ((n - 1 - (m + 1)) // 2) * 2
    lpa_ok = (
        lp["hub_ok"] + lp["fan_ok"] + lp["pair_ok"] == lp["n_total"]
        and lp["n_total"] == 1 + m + n_pairs_v
    )

    return {
        "probe": "graph_skew",
        "vertices": 1 + m + n_pairs_v,
        "edges": n_edges,
        "hot_degree": 2 * m,
        "pr_iters": n_iter,
        "pr_trajectory_exact": bool(pr_ok),
        "hub_rank": got["hub"][1],
        "t_pagerank_s": round(t_pr, 1),
        "t_pr_per_iter_s": round(t_pr / n_iter, 2),
        "lpa_rounds": 4,
        "lpa_labels_exact": bool(lpa_ok),
        "t_lpa_s": round(t_lpa, 1),
        "t_lpa_per_round_s": round(t_lpa / 4, 2),
    }


def probe_kcore(spark, n_cliq: int = 10_000, cliq: int = 9, tendril: int = 12) -> dict:
    """K-core on planted clique+tendril components: each component is a
    ``cliq``-clique (every member has core cliq-1 — including the
    attachment vertex, whose extra tendril edge must NOT raise it) with
    a ``tendril``-vertex path hanging off (core 1 for every path
    vertex). The per-core histogram is exact: cliq·n_cliq vertices at
    core cliq-1, tendril·n_cliq at core 1, nothing else. The tendril is
    the convergence driver: the H-operator's 2→1 correction propagates
    one hop per round from the free end, so rounds ≈ tendril —
    measuring exactly the wall-per-wave the verdict asked for."""
    from molgraphdb_spark.operators.graph import core_numbers

    root = (F.col("id") * 100).alias("root")
    base = spark.range(n_cliq).select(root)
    ii = F.explode(F.sequence(F.lit(0), F.lit(cliq - 1))).alias("i")
    jj = F.explode(F.sequence(F.lit(0), F.lit(cliq - 1))).alias("j")
    clique = (
        base.select("root", ii)
        .select("root", "i", jj)
        .filter(F.col("i") < F.col("j"))
        .select((F.col("root") + F.col("i")).alias("src"), (F.col("root") + F.col("j")).alias("dst"))
    )
    pp = F.explode(F.sequence(F.lit(0), F.lit(tendril - 1))).alias("p")
    chain = base.select("root", pp).select(
        # p=0 attaches the tendril to clique vertex root+0
        F.when(F.col("p") == 0, F.col("root")).otherwise(F.col("root") + 49 + F.col("p")).alias("src"),
        (F.col("root") + 50 + F.col("p")).alias("dst"),
    )
    fwd = clique.unionByName(chain)
    edges = fwd.unionByName(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    n_edges = edges.count()
    t0 = time.time()
    cores = core_numbers(edges)
    hist = {int(r["core"]): int(r["n"]) for r in
            cores.groupBy("core").agg(F.count(F.lit(1)).alias("n")).collect()}
    t = time.time() - t0
    expected = {cliq - 1: cliq * n_cliq, 1: tendril * n_cliq}
    rounds = core_numbers.last_rounds
    return {
        "probe": "graph_kcore", "components": n_cliq, "edges": n_edges,
        "per_core_counts_exact": bool(hist == expected),
        "rounds": rounds,
        "converged": bool(core_numbers.last_converged),
        "t_total_s": round(t, 1),
        "t_per_round_s": round(t / max(rounds, 1), 2),
    }


def probe_ranking(spark, n: int = 4_000_000) -> dict:
    """Ranking family at ~27× the sf0.1 per-customer relation
    (r6 verdict item 4): the partitionless-window formulation vs the
    exact two-pass distributed rank (operators/ranking.py) on a
    PLANTED permutation — spend = (id·a mod n)+1 with gcd(a,n)=1, so
    the relation is a permutation of 1..n and every invariant is
    analytic:

      * global rank of a row ordered by spend asc IS its spend value
        (checked row-exact on the two-pass output);
      * NTILE(10) tile sizes are exactly n/10 each (n divisible);
      * Gini of uniform 1..n: Σi·xᵢ = Σi² = n(n+1)(2n+1)/6 — the
        engine's floored milli output must equal the same integer
        formula evaluated exactly in Python.

    Both shapes must agree aggregate-for-aggregate; the recorded walls
    are the before/after of the r6 'What's wrong' class (the window
    shape funnels all n rows through ONE sort task — Spark logs
    'Moving all data to a single partition' — while the two-pass
    shape never holds more than n/64 rows in a task)."""
    from pyspark.sql.window import Window

    from molgraphdb_spark.operators.ranking import ntile_from_rank, with_order_stats
    from molgraphdb_spark.plans.explain import n_partitionless_windows

    a = 2654435761  # odd, not divisible by 5 → coprime with n = 4e6
    df = spark.range(n).select(
        F.col("id").alias("custkey"),
        ((F.col("id") * a) % n + 1).alias("spend"),
    )
    order = [F.asc("spend"), F.asc("custkey")]

    def gini_agg(ranked):
        dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
        r = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("spend").alias("sx"),
            F.sum(dec(F.col("i")) * F.col("spend")).alias("six"),
        ).first()
        import math

        g = 2.0 * float(r["six"]) / (r["n"] * float(r["sx"])) - (r["n"] + 1) / r["n"]
        return int(r["n"]), int(r["sx"]), int(r["six"]), math.floor(g * 1000 + 0.5)

    # BEFORE: the partitionless global window (the r6 anti-pattern).
    w = Window.orderBy(*order)
    windowed = df.select(
        "spend", F.row_number().over(w).cast("long").alias("i")
    )
    assert n_partitionless_windows(windowed) == 1
    t0 = time.time()
    win_stats = gini_agg(windowed)
    t_window = time.time() - t0
    spark.catalog.clearCache()

    # AFTER: the exact two-pass distributed rank.
    t0 = time.time()
    ranked, totals = with_order_stats(df, order, rank_col="i")
    two_stats = gini_agg(ranked)
    t_twopass = time.time() - t0
    assert n_partitionless_windows(ranked) == 0

    # planted invariants (exact integer arithmetic)
    rank_mismatches = ranked.filter(F.col("i") != F.col("spend")).count()
    tiles = {
        int(r["t"]): int(r["c"])
        for r in ranked.select(ntile_from_rank(F.col("i"), totals["n"], 10).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    import math

    six_exact = n * (n + 1) * (2 * n + 1) // 6
    g_exact = 2.0 * six_exact / (n * (n * (n + 1) // 2)) - (n + 1) / n
    gini_exact = math.floor(g_exact * 1000 + 0.5)

    # GROUPED primitive: 4 planted groups g = spend % 4. Group g's
    # members in spend order form the arithmetic series first, first+4,
    # first+8, ... with first = g (or 4 when g = 0), so the per-group
    # rank of spend s is exactly (s − 1) DIV 4 + 1 and the group cumsum
    # at rank r is r·first + 4·r(r−1)/2 — both analytic.
    from molgraphdb_spark.operators.ranking import with_grouped_order_stats

    spark.catalog.clearCache()
    gdf = df.withColumn("g", (F.col("spend") % 4).cast("int"))
    t0 = time.time()
    granked = with_grouped_order_stats(
        gdf, ["g"], [F.asc("spend"), F.asc("custkey")],
        rank_col="gr", cumsum={"spend": "gcum"},
    )
    first = F.when(F.col("g") == 0, F.lit(4)).otherwise(F.col("g"))
    g_bad = granked.filter(
        (F.col("gr") != (F.col("spend") - 1 - (F.col("spend") - 1) % 4) / 4 + 1)
        | (
            F.col("gcum")
            != F.col("gr") * first + 2 * (F.col("gr") - 1) * F.col("gr")
        )
    ).count()
    t_grouped = time.time() - t0

    # RUNNING-MAX primitive: max over strictly smaller spend of a
    # permutation is spend − 1 (NULL for the minimum).
    from molgraphdb_spark.operators.ranking import with_running_max_before

    spark.catalog.clearCache()
    t0 = time.time()
    rm = with_running_max_before(df, "spend", "spend", "premax")
    rm_bad = rm.filter(
        ~(
            (F.col("spend") == 1) & F.col("premax").isNull()
            | (F.col("premax") == F.col("spend") - 1)
        )
    ).count()
    t_runmax = time.time() - t0

    return {
        "probe": "ranking", "n": n,
        "results_equal": bool(win_stats == two_stats),
        "rank_eq_spend_violations": int(rank_mismatches),
        "tiles_exact": bool(tiles == {t: n // 10 for t in range(1, 11)}),
        "gini_milli": two_stats[3],
        "gini_milli_exact": gini_exact,
        "gini_exact_match": bool(
            two_stats[3] == gini_exact and two_stats[2] == six_exact
        ),
        "grouped_invariant_violations": int(g_bad),
        "runmax_invariant_violations": int(rm_bad),
        "grouped_exact": bool(g_bad == 0),
        "runmax_exact": bool(rm_bad == 0),
        "wall_window_s": round(t_window, 1),
        "wall_twopass_s": round(t_twopass, 1),
        "wall_grouped_s": round(t_grouped, 1),
        "wall_runmax_s": round(t_runmax, 1),
    }


def probe_ranking_skew(spark, n: int = 4_000_000) -> dict:
    """Grouped ranking under GROUP SKEW (r7 verdict item 4): the
    probe_ranking grouped leg uses 4 equal residue classes; the real
    funnel case is one dominant group. Here group sizes are planted at
    90/5/3/2% of n via thresholds on a permutation p = id·a mod n —
    each group's members are a CONTIGUOUS p-range, so per-group rank
    and running sum are analytic:

      * rank of a row in its group  = p − lo_g + 1
      * running sum of spend (=p+1) = r·lo_g + r(r+1)/2
      * 16-row frame sum at rank r  = 16·lo_g + 16r − 120   (r ≥ 16)
                                      r·lo_g + r(r+1)/2     (r < 16)

    Both the grouped two-pass operator and the partitioned-window
    formulation are checked against the closed forms and against each
    other (mod-prime checksums), and walls are recorded: under this
    skew the window shape sorts 90% of the relation in ONE task while
    the two-pass shape never holds more than n/buckets rows."""
    from pyspark.sql.window import Window

    from molgraphdb_spark.operators.ranking import (
        with_group_rows_frame,
        with_grouped_order_stats,
    )
    from molgraphdb_spark.plans.explain import n_partitionless_windows

    a = 2654435761
    lo1, lo2, lo3 = int(0.90 * n), int(0.95 * n), int(0.98 * n)
    df = spark.range(n).select(
        F.col("id").alias("k"), ((F.col("id") * a) % n).alias("p")
    ).select(
        "k",
        "p",
        (F.col("p") + 1).alias("spend"),
        F.when(F.col("p") < lo1, 0)
        .when(F.col("p") < lo2, 1)
        .when(F.col("p") < lo3, 2)
        .otherwise(3)
        .cast("int")
        .alias("g"),
    )
    lo = (
        F.when(F.col("g") == 0, 0)
        .when(F.col("g") == 1, lo1)
        .when(F.col("g") == 2, lo2)
        .otherwise(lo3)
        .cast("long")
    )
    order = [F.asc("spend"), F.asc("k")]
    P = 1_000_003

    def checksum(ranked, rcol, ccol):
        r = ranked.agg(
            F.sum(F.col(rcol) % P).alias("cr"),
            F.sum(F.col(ccol) % P).alias("cc"),
        ).first()
        return int(r["cr"]), int(r["cc"])

    # window shape (the funnel): 90% of rows sort in one task
    w = Window.partitionBy("g").orderBy(*order)
    t0 = time.time()
    win = df.select(
        "p",
        "g",
        F.row_number().over(w).cast("long").alias("r"),
        F.sum("spend")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
    )
    win_sum = checksum(win, "r", "cum")
    t_window = time.time() - t0
    spark.catalog.clearCache()

    # grouped two-pass
    t0 = time.time()
    granked = with_grouped_order_stats(
        df, ["g"], order, rank_col="r", cumsum={"spend": "cum"}
    )
    two_sum = checksum(granked, "r", "cum")
    bad = granked.filter(
        (F.col("r") != F.col("p") - lo + 1)
        | (
            F.col("cum")
            != F.col("r") * lo + F.col("r") * (F.col("r") + 1) / 2
        )
    ).count()
    t_grouped = time.time() - t0
    assert n_partitionless_windows(granked) == 0
    spark.catalog.clearCache()

    # bounded 16-row frame under the same skew (segmented scan)
    t0 = time.time()
    framed = with_group_rows_frame(df, ["g"], order, 15, "spend", "arr")
    fsum = F.aggregate(
        F.col("arr"), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    r_expr = F.col("p") - lo + 1
    frame_bad = framed.select(
        "p",
        "g",
        fsum.alias("fs"),
        r_expr.alias("r"),
        lo.alias("lo"),
    ).filter(
        ~F.when(
            F.col("r") >= 16,
            F.col("fs") == 16 * F.col("lo") + 16 * F.col("r") - 120,
        ).otherwise(
            F.col("fs")
            == F.col("r") * F.col("lo") + F.col("r") * (F.col("r") + 1) / 2
        )
    ).count()
    t_frame = time.time() - t0

    return {
        "probe": "ranking_skew", "n": n,
        "group_pcts": [90, 5, 3, 2],
        "checksums_equal": bool(win_sum == two_sum),
        "grouped_invariant_violations": int(bad),
        "frame_invariant_violations": int(frame_bad),
        "grouped_exact": bool(bad == 0),
        "frame_exact": bool(frame_bad == 0),
        "wall_window_s": round(t_window, 1),
        "wall_grouped_s": round(t_grouped, 1),
        "wall_frame_s": round(t_frame, 1),
    }


def probe_runmin_skew(spark, n: int = 4_000_000) -> dict:
    """Grouped running-MIN under the 90/5/3/2% group skew (r9b: the
    operator behind events_cusum_alarms). Same planted permutation as
    probe_ranking_skew — each group's members are a contiguous p-range
    ordered by p — with TWO analytic value columns:

      * v_desc = n − p  (strictly decreasing): running min ≡ n − p
      * v_asc  = p      (strictly increasing): running min ≡ lo_g

    Both the two-pass grouped operator and the plain partitioned
    window are checked against the closed forms and each other
    (mod-prime checksums); walls recorded — under this skew the window
    sorts 90% of the relation in ONE task, the two-pass shape never
    holds more than n/buckets rows."""
    from pyspark.sql.window import Window

    from molgraphdb_spark.operators.ranking import with_grouped_running_min

    a = 2654435761
    lo1, lo2, lo3 = int(0.90 * n), int(0.95 * n), int(0.98 * n)
    df = spark.range(n).select(((F.col("id") * a) % n).alias("p")).select(
        "p",
        (F.lit(n) - F.col("p")).alias("v_desc"),
        F.col("p").alias("v_asc"),
        F.when(F.col("p") < lo1, 0)
        .when(F.col("p") < lo2, 1)
        .when(F.col("p") < lo3, 2)
        .otherwise(3)
        .cast("int")
        .alias("g"),
    )
    lo = (
        F.when(F.col("g") == 0, 0)
        .when(F.col("g") == 1, lo1)
        .when(F.col("g") == 2, lo2)
        .otherwise(lo3)
        .cast("long")
    )
    order = [F.asc("p")]
    P = 1_000_003

    def run(make):
        t0 = time.time()
        out = make()
        bad = out.filter(
            (F.col("m_desc") != F.lit(n) - F.col("p")) | (F.col("m_asc") != lo)
        ).count()
        cs = out.agg(
            F.sum(F.col("m_desc") % P).alias("cd"),
            F.sum(F.col("m_asc") % P).alias("ca"),
        ).first()
        return round(time.time() - t0, 2), bad, (int(cs["cd"]), int(cs["ca"]))

    w = (
        Window.partitionBy("g")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t_win, bad_win, cs_win = run(
        lambda: df.select(
            "p", "g",
            F.min("v_desc").over(w).alias("m_desc"),
            F.min("v_asc").over(w).alias("m_asc"),
        )
    )
    t_two, bad_two, cs_two = run(
        lambda: with_grouped_running_min(
            with_grouped_running_min(df, ["g"], order, "v_desc", "m_desc"),
            ["g"], order, "v_asc", "m_asc",
        )
    )
    return {
        "probe": "runmin_skew",
        "n": n,
        "window_sec": t_win,
        "grouped_sec": t_two,
        "window_violations": bad_win,
        "grouped_violations": bad_two,
        "checksums_equal": cs_win == cs_two,
    }


def probe_shuffle_codec(sf_dir: str, runs: int = 3) -> dict:
    """lz4 vs zstd on the heaviest dedup shuffle at 10× (r14 verdict
    item 9 — turn the documented 'cluster trade' note into a number).

    Workload: the shingle inverted-index self-join + pair aggregation
    (neardup_jaccard_pairs' shape) over the 10× probe corpus — the
    family's dominant exchange. spark.io.compression.codec is a
    CONTEXT-time conf, so each codec gets a fresh session (this probe
    STOPS the active session — run it alone/last:
    ``python tools/scale_probe.py 10 shuffle_codec``). Wall times are
    min-of-N per codec, sequential sessions (no interleave possible),
    so treat small deltas as host noise; the decision number for a
    real cluster is still network/disk-bound shuffle BYTES, which this
    host's ramdisk-speed shuffle cannot expose — the probe records the
    shuffled pair volume so the ratio can be projected."""
    import time as _time

    from pyspark.sql import SparkSession

    from molgraphdb_spark.queries.dedup import _shingle_rows

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    out: dict = {"probe": "shuffle_codec", "runs": runs}
    for codec in ("lz4", "zstd"):
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName(f"codec-{codec}")
            .config("spark.io.compression.codec", codec)
            .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        tune(spark)
        spark.range(1000).selectExpr("sum(id)").collect()  # session warmup
        walls = []
        n_pairs = 0
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = _time.time()
            sh = _shingle_rows(spark, sf_dir)
            a, b = sh.alias("a"), sh.alias("b")
            common = (
                a.join(
                    b,
                    (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")),
                )
                .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
                .agg(F.count(F.lit(1)).alias("n_common"))
            )
            n_pairs = common.count()
            walls.append(round(_time.time() - t0, 3))
        out[codec] = {"walls_sorted": sorted(walls), "min": min(walls), "n_pairs": n_pairs}
        spark.stop()
    out["zstd_over_lz4_min_ratio"] = round(out["zstd"]["min"] / out["lz4"]["min"], 3)
    return out


def probe_copurchase_hotkey(spark, n_sup: int = 8_000, n_cust: int = 200_000) -> dict:
    """Hot-key probe for the co-purchase inverted-index family (r8
    verdict item 3): the pair join is bounded by Σ deg(c)² with no
    cap, so ONE customer of degree ≈ |suppliers| contributes
    C(n_sup, 2) pairs — here ~32M from a single key, dwarfing the
    600k pairs of 200k ordinary degree-3 customers. Measures the
    uncapped query against adamic_adar_pairs(max_customer_degree=64)
    (cap-with-exclusion, the MAX_SHINGLE_DF analogue) and verifies
    the cap changed COST, not RESULTS: the capped output must equal
    the uncapped output over the corpus with the hot customer
    removed, exactly."""
    from molgraphdb_spark.queries.graph_queries import adamic_adar_pairs

    base = spark.range(n_cust)
    normal = (
        base.select(
            F.col("id").alias("o_custkey"),
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("i"),
        )
        .select(
            "o_custkey",
            ((F.col("o_custkey") * 31 + F.col("i") * 7919) % n_sup).alias("l_suppkey"),
        )
        .distinct()
    )
    hot = spark.range(n_sup).select(
        F.lit(-1).cast("long").alias("o_custkey"), F.col("id").alias("l_suppkey")
    )
    cs = normal.unionByName(hot).localCheckpoint()

    def run(df, cap):
        t0 = time.time()
        r = (
            adamic_adar_pairs(df, max_customer_degree=cap)
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("aa_micro").alias("sum_aa"),
            )
            .collect()[0]
        )
        return int(r["n_pairs"]), int(r["sum_aa"]), round(time.time() - t0, 1)

    n_unc, sum_unc, t_unc = run(cs, None)
    n_cap, sum_cap, t_cap = run(cs, 64)
    # exact-equality invariant: cap == exclusion of the hot customer
    manual = adamic_adar_pairs(normal.localCheckpoint(), max_customer_degree=None)
    capped = adamic_adar_pairs(cs, max_customer_degree=64)
    diff = (
        capped.exceptAll(manual).count() + manual.exceptAll(capped).count()
    )
    return {
        "probe": "copurchase_hotkey",
        "n_suppliers": n_sup,
        "n_customers": n_cust + 1,
        "hot_degree": n_sup,
        "pairs_uncapped": n_unc,
        "pairs_capped": n_cap,
        "t_uncapped_s": t_unc,
        "t_capped_s": t_cap,
        "cap_equals_exclusion_exact": bool(diff == 0),
        "sum_aa_uncapped": sum_unc,
        "sum_aa_capped": sum_cap,
    }


def probe_triangle_dispatch(spark, n_cliq: int = 20_000, c: int = 12) -> dict:
    """Triangle-count dispatch at ~10x the sf0.1 projection (r8
    verdict item 7): planted disjoint c-cliques (exact count
    n_cliq * C(c,3)), run through BOTH sides of
    operators/graph.triangle_count's broadcast/co-partition dispatch
    — the broadcast plan under the 2M-vertex ceiling and the
    shuffle-hash co-partitioned plan with the ceiling forced to 1k —
    asserting both return the planted count exactly."""
    from molgraphdb_spark.operators.graph import triangle_count

    root = (F.col("id") * 16).alias("root")
    base = spark.range(n_cliq).select(root)
    ii = F.explode(F.sequence(F.lit(0), F.lit(c - 1))).alias("i")
    jj = F.explode(F.sequence(F.lit(0), F.lit(c - 1))).alias("j")
    edges = (
        base.select("root", ii)
        .select("root", "i", jj)
        .filter(F.col("i") < F.col("j"))
        .select(
            (F.col("root") + F.col("i")).alias("x"),
            (F.col("root") + F.col("j")).alias("y"),
        )
        .localCheckpoint()
    )
    n_edges = edges.count()
    want = n_cliq * (c * (c - 1) * (c - 2) // 6)
    t0 = time.time()
    got_b = triangle_count(edges, n_vertices=n_cliq * c).collect()[0][0]
    t_b = round(time.time() - t0, 1)
    strat_b = triangle_count.last_strategy
    t0 = time.time()
    got_c = triangle_count(
        edges, n_vertices=n_cliq * c, broadcast_max_vertices=1_000
    ).collect()[0][0]
    t_c = round(time.time() - t0, 1)
    strat_c = triangle_count.last_strategy
    return {
        "probe": "triangle_dispatch",
        "vertices": n_cliq * c,
        "edges": n_edges,
        "planted_triangles": want,
        "broadcast_exact": bool(got_b == want),
        "copartition_exact": bool(got_c == want),
        "strategies": [strat_b, strat_c],
        "t_broadcast_s": t_b,
        "t_copartition_s": t_c,
    }


def probe_retrieval(spark, sf_dir: str) -> dict:
    """Planted-relevance probe for the r8 retrieval/classifier debuts
    at 10x (r8 verdict item 5): BM25, RRF hybrid, and the hashed
    quality classifier on the 50k-doc corpus, each with a closed-form
    planted answer:

    * BM25: per query, one planted doc holding every query term 40
      times in a 120-token body — tf-saturated, shorter than avgdl —
      must be top-1, and its integer milli score must EQUAL a plain-
      Python recompute from DuckDB-collected corpus stats (the third-
      implementation discipline: catches both-engines-wrong formulas).
    * RRF: a planted doc duplicating query-doc 0's text exactly
      (sparse Jaccard 1.0 -> leg rank 1) whose planted vector is a
      scalar multiple of query-vector 0 (cosine 1.0 -> leg rank 1)
      must win the fusion for query 0.
    * classifier: 100 planted docs of one fixed text under a fresh
      source — the source row must equal the plain-Python md5-hash
      score recompute exactly.
    """
    import duckdb
    import hashlib
    import math

    from molgraphdb_spark.queries.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERIES,
        QC_DIMS,
        QC_MIX,
        doc_bm25_topk,
        doc_quality_classifier,
    )
    from molgraphdb_spark.queries.similarity import retrieval_rrf_hybrid

    # TWO planted corpora: the RRF plant is a verbatim copy of query-
    # doc 0's (term-rich) text and would itself win BM25 query 0 if it
    # shared the corpus — plants must not compete with each other.
    out = f"{BASE}/retrieval_bm25"
    out_rrf = f"{BASE}/retrieval_rrf"
    for d in (out, out_rrf):
        if os.path.exists(d):
            shutil.rmtree(d)
        os.makedirs(d)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc0_text = docs.filter(F.col("doc_id") == 0).select("text").collect()[0][0]
    planted_bm25 = [
        (2_000_000_000 + qid, " ".join(ts * 40), "en", "probe_bm25")
        for qid, ts in BM25_QUERIES
    ]
    planted_rrf = [(600_000, doc0_text, "en", "probe_rrf")]
    qc_text = "alpha beta gamma delta epsilon zeta eta theta"
    planted_qc = [(2_100_000_000 + i, qc_text, "en", "probesrc") for i in range(100)]
    extra = spark.createDataFrame(
        planted_bm25 + planted_qc,
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text"))
    docs.unionByName(extra).repartition(32).write.parquet(f"{out}/documents.parquet")
    extra_rrf = spark.createDataFrame(
        planted_rrf, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    docs.unionByName(extra_rrf).repartition(32).write.parquet(
        f"{out_rrf}/documents.parquet"
    )

    # synthetic embeddings: 20k deterministic vectors, dim 16, period
    # 104729 > n so no two base vectors share a direction; vector
    # 600000 = 2x vector 0 (cosine 1.0 with query vector 0)
    dim = 16
    vexpr = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: ((F.col("vec_id") * 2654435761 + j * 40503) % 104729).cast(
            "double"
        ) / 104729.0 - 0.5,
    )
    base_emb = spark.range(20_000).select(
        F.col("id").alias("vec_id"), vexpr.alias("embedding"),
        (F.col("id") % 7).cast("int").alias("label"),
    )
    twin = base_emb.filter(F.col("vec_id") == 0).select(
        F.lit(600_000).cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"),
        F.lit(0).cast("int").alias("label"),
    )
    base_emb.unionByName(twin).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    ).repartition(8).write.parquet(f"{out_rrf}/embeddings.parquet")

    # --- BM25 ---
    t0 = time.time()
    bm = doc_bm25_topk(spark, out).collect()
    t_bm25 = round(time.time() - t0, 1)
    top1 = {r["query_id"]: r["doc_id"] for r in bm if r["rank"] == 1}
    bm25_top1_planted = all(
        top1.get(qid) == 2_000_000_000 + qid for qid, _ in BM25_QUERIES
    )
    # third implementation: plain Python from DuckDB-collected stats
    con = duckdb.connect()
    n, tot = con.execute(
        f"""SELECT COUNT(*), SUM(len(regexp_split_to_array(trim(text), '\\s+')))
            FROM '{out}/documents.parquet/*.parquet' WHERE text IS NOT NULL"""
    ).fetchone()
    score_exact = True
    got_scores = {(r["query_id"], r["doc_id"]): r["score_milli"] for r in bm}
    for qid, ts in BM25_QUERIES:
        expect = 0
        dl = 40 * len(ts)
        for t in ts:
            (df_t,) = con.execute(
                f"""SELECT COUNT(*) FROM '{out}/documents.parquet/*.parquet'
                    WHERE text IS NOT NULL
                      AND list_contains(regexp_split_to_array(trim(text), '\\s+'), ?)""",
                [t],
            ).fetchone()
            idf = math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
            tf = 40
            expect += math.floor(
                1000 * idf * tf * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl * n / tot))
                + 0.5
            )
        if got_scores.get((qid, 2_000_000_000 + qid)) != expect:
            score_exact = False

    # --- RRF ---
    t0 = time.time()
    rrf = retrieval_rrf_hybrid(spark, out_rrf).collect()
    t_rrf = round(time.time() - t0, 1)
    rrf_top1_q0 = next(
        (r["neighbor_id"] for r in rrf if r["query_id"] == 0 and r["rank"] == 1),
        None,
    )

    # --- classifier ---
    def w(tok: str) -> int:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
        return h % QC_DIMS * QC_MIX % 2147483648 % 2001 - 1000

    per_doc = sum(w(t) for t in qc_text.split())
    t0 = time.time()
    qc = {
        r["source"]: r
        for r in doc_quality_classifier(spark, out).collect()
    }
    t_qc = round(time.time() - t0, 1)
    row = qc.get("probesrc")
    qc_exact = bool(
        row is not None
        and row["n_docs"] == 100
        and row["sum_score_milli"] == 100 * per_doc
        and row["accepted"] == (100 if per_doc >= 0 else 0)
        and row["accept_bp"] == (10000 if per_doc >= 0 else 0)
    )
    return {
        "probe": "retrieval",
        "docs": int(n),
        "vectors": 20_001,
        "bm25_top1_planted": bool(bm25_top1_planted),
        "bm25_score_thirdimpl_exact": bool(score_exact),
        "rrf_top1_q0_planted": bool(rrf_top1_q0 == 600_000),
        "classifier_thirdimpl_exact": qc_exact,
        "t_bm25_s": t_bm25,
        "t_rrf_s": t_rrf,
        "t_classifier_s": t_qc,
    }




def probe_curation(spark, sf_dir: str) -> dict:
    """Planted-invariant probes for the r9b curation/community debuts
    at 10x (the every-family-measures-its-scale-claim rule):

    * DSIR: 500 planted docs of an exclusive target vocabulary (lang
      en, 200 tokens) and 500 anti-target docs (exclusive vocabulary,
      never in en) join the 50k corpus. Target-exclusive buckets get
      lambda = ln((R+B)/(T+B)) > 0 while shared-vocabulary buckets sit
      near ln(1) = 0, so every planted target doc must be selected and
      every anti doc rejected - closed form, no tolerance.
    * perplexity buckets: per language the three buckets partition the
      docs with sizes differing by at most 1, and score ranges are
      monotone head <= middle <= tail (rank-third construction).
    * LPA: 20k disjoint bipartite cliques (10 customers x 3
      suppliers). Synchronous LPA with min tie-break is PERIODIC on
      bipartite structure (the documented GraphFrames caveat): after
      the fixed 4 rounds each clique lands on exactly two communities
      - its customer side (size 10) and its supplier side (size 3).
      The probe pins that closed form: 20k communities of each shape,
      nothing merged across cliques.
    """
    from molgraphdb_spark.queries.graph_queries import graph_label_propagation
    from molgraphdb_spark.queries.text import (
        doc_dsir_selection,
        doc_perplexity_buckets,
    )

    out = f"{BASE}/curation"
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target_words = "theorem proof lemma axiom corollary manifold functor".split()
    anti_words = "clickbait promo unsubscribe casino jackpot".split()
    planted = []
    for i in range(500):
        toks = [target_words[(i + j) % len(target_words)] for j in range(200)]
        planted.append((3_000_000_000 + i, " ".join(toks), "en", "probe_target"))
    for i in range(500):
        toks = [anti_words[(i + j) % len(anti_words)] for j in range(200)]
        planted.append((3_100_000_000 + i, " ".join(toks), "de", "probe_anti"))
    extra = spark.createDataFrame(
        planted, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text"))
    docs.unionByName(extra).repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    n_docs = spark.read.parquet(f"{out}/documents.parquet").count()

    t0 = time.time()
    rows = {r.source: r for r in doc_dsir_selection(spark, out).collect()}
    t_dsir = round(time.time() - t0, 2)
    dsir_ok = (
        rows["probe_target"].n_selected == 500
        and rows["probe_anti"].n_selected == 0
    )

    t0 = time.time()
    ppl = doc_perplexity_buckets(spark, out).collect()
    t_ppl = round(time.time() - t0, 2)
    by_lang: dict = {}
    for r in ppl:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    ppl_ok = True
    for lang, bs in by_lang.items():
        sizes = [b.n_docs for b in bs.values()]
        if max(sizes) - min(sizes) > 1:
            ppl_ok = False
        order = [bs[k] for k in ("head", "middle", "tail") if k in bs]
        for a, b in zip(order, order[1:]):
            if a.max_mean_nlp_milli > b.min_mean_nlp_milli:
                ppl_ok = False

    # LPA: planted disjoint bipartite cliques
    n_cliq, nc, ns = 20_000, 10, 3
    lpa_dir = f"{out}/lpa"
    os.makedirs(lpa_dir, exist_ok=True)
    base = spark.range(n_cliq).select(F.col("id").alias("q"))
    cs = base.select(
        "q",
        F.explode(F.sequence(F.lit(0), F.lit(nc - 1))).alias("c"),
    ).select(
        "q", "c", F.explode(F.sequence(F.lit(0), F.lit(ns - 1))).alias("s")
    )
    pairs = cs.select(
        (F.col("q") * (nc * ns) + F.col("c") * ns + F.col("s")).alias("ok"),
        (F.col("q") * nc + F.col("c")).alias("ck"),
        (F.col("q") * ns + F.col("s")).alias("sk"),
    )
    pairs.select(F.col("ok").alias("o_orderkey"), F.col("ck").alias("o_custkey")) \
        .repartition(32).write.mode("overwrite").parquet(f"{lpa_dir}/orders.parquet")
    pairs.select(F.col("ok").alias("l_orderkey"), F.col("sk").alias("l_suppkey")) \
        .repartition(32).write.mode("overwrite").parquet(f"{lpa_dir}/lineitem.parquet")
    t0 = time.time()
    shapes = {
        (r.n_vertices, r.n_customers, r.n_suppliers): r["count"]
        for r in graph_label_propagation(spark, lpa_dir)
        .groupBy("n_vertices", "n_customers", "n_suppliers")
        .count()
        .collect()
    }
    t_lpa = round(time.time() - t0, 2)
    lpa_ok = shapes == {(nc, nc, 0): n_cliq, (ns, 0, ns): n_cliq}

    return {
        "probe": "curation",
        "docs": n_docs,
        "dsir_planted_exact": dsir_ok,
        "dsir_sec": t_dsir,
        "ppl_thirds_invariants": ppl_ok,
        "ppl_sec": t_ppl,
        "lpa_vertices": n_cliq * (nc + ns),
        "lpa_planted_exact": lpa_ok,
        "lpa_shapes": {str(k): v for k, v in shapes.items()},
        "lpa_sec": t_lpa,
    }


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])  # probe-name filter, e.g. "copurchase_hotkey"
    spark = get_spark("scale-probe")
    tune(spark)
    if only:
        # selective run (r9): probes named on the CLI, no corpus build
        fns = {
            "copurchase_hotkey": lambda: probe_copurchase_hotkey(spark),
            "triangle_dispatch": lambda: probe_triangle_dispatch(spark),
            "retrieval": lambda: probe_retrieval(spark, build_corpus(spark, k)),
            "curation": lambda: probe_curation(spark, build_corpus(spark, k)),
            "runmin_skew": lambda: probe_runmin_skew(spark),
            "hard_negatives": lambda: probe_hard_negatives(spark),
            "ann_production": lambda: probe_ann_production(spark),
            "ann_hot_cell": lambda: probe_ann_hot_cell(spark),
            "ann_spill": lambda: probe_ann_spill(spark),
            "decode_adversarial": lambda: probe_decode_adversarial(spark),
            "pq_production": lambda: probe_pq_production(spark),
            "pq_persisted": lambda: probe_pq_persisted(spark),
            "graph_skew": lambda: probe_graph_skew(spark),
            "decode": lambda: probe_decode(spark, build_corpus(spark, k)),
            "render": lambda: probe_render(spark),
            "extract": lambda: probe_extract(spark, build_corpus(spark, k)),
            # stops the shared session (per-codec contexts) — run alone
            "shuffle_codec": lambda: probe_shuffle_codec(build_corpus(spark, k)),
        }
        for name in sys.argv[2:]:
            print(json.dumps(fns[name]()))
        return
    n_orig = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").count()

    sf_dir = build_corpus(spark, k)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    print(json.dumps({"probe": "corpus", "k": k, "docs": n_docs}))

    print(json.dumps(probe_cap(spark, sf_dir, k, n_orig)))
    print(json.dumps(probe_lsh(spark, sf_dir)))
    print(json.dumps(probe_prefix(spark, sf_dir)))
    print(json.dumps(probe_spans(spark, sf_dir)))
    print(json.dumps(probe_phash(spark, sf_dir)))
    # r10: real-codec decode leg at 10× (r11: + JPEG and FLAC passes)
    print(json.dumps(probe_decode(spark, sf_dir)))
    # r13: malformed-payload quarantine contract at volume
    print(json.dumps(probe_decode_adversarial(spark)))
    # r11: HTML-extraction leg at 10× (sampled vs stdlib html.parser)
    print(json.dumps(probe_extract(spark, sf_dir)))
    # r10: raster leg at volume (bit-determinism across layouts)
    print(json.dumps(probe_render(spark)))
    # CC at both sides of the 1M-edge dispatch threshold.
    print(json.dumps(probe_cc(spark, k=10, n_orig=5000)))       # 225k edges
    print(json.dumps(probe_cc(spark, k=25, n_orig=5000)))       # 1.5M edges
    # ANN at k× vectors: exact brute force vs IVF, with recall.
    print(json.dumps(probe_ann(spark, k)))
    # r10: exact vs ANN-shortlist triplet mining with planted twins
    print(json.dumps(probe_hard_negatives(spark)))
    # r11: the ANN shortlist at production shape (n=2M, K=√n)
    print(json.dumps(probe_ann_production(spark)))
    # r13: the hot-centroid split remediation at the r11 collapse shape
    print(json.dumps(probe_ann_hot_cell(spark)))
    # r14: splits disabled -> spill_cids routed through the salted
    # exact channel (shortlist_with_spill), mined set identical
    print(json.dumps(probe_ann_spill(spark)))
    print(json.dumps(probe_pq(spark, k)))
    # r12: IVF-PQ at the FAISS-default geometry (M=16, K=256) through
    # the engine's K-dispatched BLAS kernels, index built once
    print(json.dumps(probe_pq_production(spark)))
    # r14: the persisted index at production geometry — files/bytes per
    # statically-pruned query batch, plan pin at 2M x 64 cells
    print(json.dumps(probe_pq_persisted(spark)))
    # Iterative graph operators (r5 verdict item 6): planted invariants
    # at ~10× the sf0.1 graph family, rounds + wall-per-wave recorded.
    print(json.dumps(probe_bfs(spark)))
    print(json.dumps(probe_multi_bfs(spark)))
    print(json.dumps(probe_pagerank(spark)))
    # r10: pagerank + LPA under planted hot-vertex degree skew
    print(json.dumps(probe_graph_skew(spark)))
    print(json.dumps(probe_kcore(spark)))
    # Ranking family (r6 verdict item 4): partitionless window vs the
    # exact two-pass distributed rank, planted permutation invariants.
    print(json.dumps(probe_ranking(spark)))
    # Grouped ranking + bounded frames under 90/5/3/2% group skew
    # (r7 verdict item 4).
    print(json.dumps(probe_ranking_skew(spark)))
    # r9: hot-key cap, triangle dispatch, retrieval invariants
    print(json.dumps(probe_copurchase_hotkey(spark)))
    print(json.dumps(probe_triangle_dispatch(spark)))
    print(json.dumps(probe_retrieval(spark, sf_dir)))
    # r9b: DSIR / perplexity-bucket / LPA planted invariants
    print(json.dumps(probe_curation(spark, sf_dir)))
    # r9b: grouped running-min under group skew (the CUSUM operator)
    print(json.dumps(probe_runmin_skew(spark)))


if __name__ == "__main__":
    main()
