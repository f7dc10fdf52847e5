"""Product-quantization operator tests: geometry, encode determinism
under repartitioning, ADC distance fidelity, and recall@3 against the
exact scan — the same evidence pattern as operators/kmeans.py and the
sketches (no DuckDB oracle: Lloyd's training is not SQL-expressible)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from molgraphdb_spark.operators.pq import pq_adc_topk, pq_encode, pq_train

M, K, TOPK = 8, 16, 3


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .cache()
    )


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, "v", "vec_id", m=M, k=K, n_iter=3)


def test_codebook_geometry(books):
    assert len(books) == M
    for cb in books:
        assert len(cb) == K
        assert [cid for cid, _ in cb] == list(range(K))
        assert all(len(c) == 64 // M for _, c in cb)


def test_encode_shape_and_partition_invariance(emb, books):
    codes = pq_encode(emb, "v", books)
    rows = {r["vec_id"]: r["pq_code"] for r in codes.collect()}
    assert len(rows) == emb.count()
    assert all(len(c) == M and all(0 <= x < K for x in c) for c in rows.values())
    # fixed codebooks -> bit-deterministic codes at any partitioning
    rows17 = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(emb.repartition(17), "v", books).collect()
    }
    assert rows == rows17


def test_adc_approximates_true_distance(emb, books):
    """ADC distance == exact distance to the RECONSTRUCTED vector —
    verify the fold against a python recomputation on a sample."""
    dsub = 64 // M
    sample = {r["vec_id"]: list(r["v"]) for r in emb.limit(20).collect()}
    codes = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(emb.limit(20), "v", books).collect()
    }
    q_id, q_vec = next(iter(sample.items()))
    out = {
        r["vec_id"]: r["adc_d2_ubp"]
        for r in pq_adc_topk(
            pq_encode(emb, "v", books), "vec_id", [(q_id, q_vec)], books, k=10**6
        ).collect()
        if r["vec_id"] in sample
    }
    for vid, code in codes.items():
        if vid == q_id:
            continue
        want = sum(
            sum(
                (q_vec[s * dsub + j] - books[s][code[s]][1][j]) ** 2
                for j in range(dsub)
            )
            for s in range(M)
        )
        assert out[vid] == math.floor(want * 1_000_000 + 0.5), vid


def test_pq_search_recall_vs_exact(emb, books):
    """Recall@3 of the deployable path (ADC shortlist=30 + exact
    rerank) against the exact L2 scan over 10 queries. Measured 0.67
    at M=8/K=16 on this data (0.80 at K=64); ≥0.5 pins the behavior
    with margin for training-float drift. Raw ADC-only top-3 measured
    0.17 — reranking is load-bearing and this test would catch its
    loss."""
    from molgraphdb_spark.operators.pq import pq_search

    vecs = {r["vec_id"]: list(r["v"]) for r in emb.collect()}
    queries = [(vid, vecs[vid]) for vid in sorted(vecs)[:10]]
    got = {}
    for r in pq_search(emb, "v", "vec_id", queries, books, k=TOPK, shortlist=30).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for qid, qv in queries:
        exact = sorted(
            (
                (sum((a - b) ** 2 for a, b in zip(qv, v)), vid)
                for vid, v in vecs.items()
                if vid != qid
            )
        )[:TOPK]
        for _, vid in exact:
            total += 1
            hits += vid in got[qid]
    recall = hits / total
    assert recall >= 0.5, recall


def test_ivfpq_recall_and_probe_bound(spark, emb, books):
    """The composed index: coarse cells bound candidates, PQ bounds
    bytes, rerank restores order. Recall trails plain pq_search only
    by what nprobe excludes; with all cells probed results MATCH
    pq_search exactly."""
    from molgraphdb_spark.operators.kmeans import kmeans_fit
    from molgraphdb_spark.operators.pq import ivfpq_search, pq_search

    coarse = kmeans_fit(emb, "v", "vec_id", k=8, n_iter=3)
    vecs = {r["vec_id"]: list(r["v"]) for r in emb.collect()}
    queries = [(vid, vecs[vid]) for vid in sorted(vecs)[:5]]
    full = {
        (r["query_id"], r["rk"]): r["vec_id"]
        for r in pq_search(emb, "v", "vec_id", queries, books, k=3, shortlist=30).collect()
    }
    allprobe = {
        (r["query_id"], r["rk"]): r["vec_id"]
        for r in ivfpq_search(
            emb, "v", "vec_id", queries, coarse, books, k=3, nprobe=8, shortlist=30
        ).collect()
    }
    assert allprobe == full  # all cells probed == un-partitioned PQ
    some = ivfpq_search(
        emb, "v", "vec_id", queries, coarse, books, k=3, nprobe=2, shortlist=30
    ).collect()
    # bounded probing still returns k results per query
    assert {r["query_id"] for r in some} == {q for q, _ in queries}


def test_pq_encode_ubp_self_centroids_zero_error(spark):
    """Vectors that ARE codebook centroids must encode to their own cid
    with zero distortion in every subspace — pins both the argmin and
    the micro-unit flooring."""
    from molgraphdb_spark.operators.pq import pq_encode_ubp

    vecs = [
        (0, [0.0, 0.0, 1.0, 2.0]),
        (1, [5.0, 5.0, -1.0, 0.5]),
        (2, [0.1, 0.1, 0.9, 2.1]),  # near centroid 0 in both subspaces
    ]
    df = spark.createDataFrame(vecs, "vec_id long, v array<double>")
    codebooks = [
        [(0, [0.0, 0.0]), (1, [5.0, 5.0])],
        [(0, [1.0, 2.0]), (1, [-1.0, 0.5])],
    ]
    rows = {r.vec_id: r.pq_cells for r in pq_encode_ubp(df, "v", codebooks).collect()}
    assert [(c.cid, c.d2_upm) for c in rows[0]] == [(0, 0), (0, 0)]
    assert [(c.cid, c.d2_upm) for c in rows[1]] == [(1, 0), (1, 0)]
    # 0.1^2+0.1^2 = 0.02 -> 20_000 upm; (0.9-1)^2+(2.1-2)^2 = 0.02
    assert [(c.cid, c.d2_upm) for c in rows[2]] == [(0, 20_000), (0, 20_000)]


def test_pq_encode_ubp_tie_breaks_to_lowest_cid(spark):
    from molgraphdb_spark.operators.pq import pq_encode_ubp

    df = spark.createDataFrame([(0, [0.5, 0.5])], "vec_id long, v array<double>")
    codebooks = [[(0, [0.0]), (1, [1.0])], [(0, [1.0]), (1, [0.0])]]
    [row] = pq_encode_ubp(df, "v", codebooks).collect()
    assert [c.cid for c in row.pq_cells] == [0, 0]


def test_pq_encode_drops_null_vectors(spark):
    from molgraphdb_spark.operators.pq import pq_encode

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, None)], "vec_id long, v array<double>"
    )
    out = pq_encode(df, "v", [[(0, [0.0]), (1, [1.0])], [(0, [0.0]), (1, [1.0])]])
    assert [r.vec_id for r in out.collect()] == [0]


def test_pq_train_probes_past_null_vectors(spark):
    from molgraphdb_spark.operators.pq import pq_train

    df = spark.createDataFrame(
        [(0, None), (1, [0.0, 1.0]), (2, [1.0, 0.0]), (3, [0.9, 0.1])],
        "vec_id long, v array<double>",
    )
    books = pq_train(df, "v", "vec_id", m=2, k=2, n_iter=2)
    assert len(books) == 2 and all(len(cb) == 2 for cb in books)


def test_pq_encode_blas_matches_literal(emb, books):
    # The K-dispatched production encoder (operators/pq._pq_encode_blas,
    # the M=16/K=256 FAISS-geometry path) must produce the SAME codes
    # as the literal folds — force both kernels over the same corpus
    # and codebooks (K=16 is served literal in production; the private
    # entry point pins the CONTRACT, not the threshold).
    from molgraphdb_spark.operators.pq import _pq_encode_blas

    lit = {r.vec_id: list(r.pq_code) for r in pq_encode(emb, "v", books).collect()}
    blas = {
        r.vec_id: list(r.pq_code)
        for r in _pq_encode_blas(
            emb.filter(F.col("v").isNotNull()), "v", books
        ).collect()
    }
    assert lit == blas and len(lit) > 100


def test_pq_encode_dispatches_to_blas_above_threshold(emb):
    # At K > ASSIGN_LITERAL_MAX_K the public pq_encode must route to
    # the Arrow pass; the codes must still be valid cids and every row
    # must survive.
    from molgraphdb_spark.operators.ivf import ASSIGN_LITERAL_MAX_K

    k_big = ASSIGN_LITERAL_MAX_K + 8
    books_big = pq_train(emb, "v", "vec_id", m=M, k=k_big, n_iter=1)
    out = pq_encode(emb, "v", books_big)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    rows = out.collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r.pq_code) == M
        assert all(0 <= c < k_big for c in r.pq_code)


def test_ivfpq_search_index_reuse_matches_inline(spark, emb, books):
    # The production shape — ivfpq_search(..., indexed=ivfpq_index(...))
    # — must return exactly what the inline (index-derived-per-call)
    # path returns; reuse changes cost, never results.
    from molgraphdb_spark.operators.kmeans import kmeans_fit
    from molgraphdb_spark.operators.pq import ivfpq_index, ivfpq_search

    coarse = kmeans_fit(emb, "v", "vec_id", k=4, n_iter=2)
    qrows = emb.filter(F.col("vec_id") < 3).collect()
    queries = [(r["vec_id"], list(r["v"])) for r in qrows]
    inline = ivfpq_search(emb, "v", "vec_id", queries, coarse, books, k=3)
    idx = ivfpq_index(emb, "v", coarse, books).localCheckpoint(eager=True)
    reused = ivfpq_search(
        emb, "v", "vec_id", queries, coarse, books, k=3, indexed=idx
    )
    a = [tuple(r) for r in inline.collect()]
    b = [tuple(r) for r in reused.collect()]
    assert a == b and len(a) == 9


def test_persisted_index_matches_inline(spark, emb, books, tmp_path):
    # write_ivfpq_index / read_ivfpq_index round-trip: searching the
    # reloaded partitioned-parquet index returns exactly the inline
    # result (persistence changes layout and cost, never results).
    from molgraphdb_spark.operators.kmeans import kmeans_fit
    from molgraphdb_spark.operators.pq import (
        ivfpq_index,
        ivfpq_search,
        read_ivfpq_index,
        write_ivfpq_index,
    )

    coarse = kmeans_fit(emb, "v", "vec_id", k=4, n_iter=2)
    qrows = emb.filter(F.col("vec_id") < 3).collect()
    queries = [(r["vec_id"], list(r["v"])) for r in qrows]
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(ivfpq_index(emb, "v", coarse, books), path)
    loaded = read_ivfpq_index(spark, path)
    got = ivfpq_search(
        emb, "v", "vec_id", queries, coarse, books, k=3, indexed=loaded
    )
    want = ivfpq_search(emb, "v", "vec_id", queries, coarse, books, k=3)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_persisted_index_prunes_partitions(spark, emb, books, tmp_path):
    # The 100 TB point of partitionBy('cid'): ivfpq_search knows its
    # probed cells driver-side and pushes a literal cid IN (...) on the
    # index, which against the partitioned layout compiles to STATIC
    # PartitionFilters on the FileScan — a query batch reads at most
    # Q·nprobe cell directories, skipping the rest at the file level
    # (stronger than DPP: no subquery, pruning happens at planning).
    import re

    from molgraphdb_spark.operators.kmeans import kmeans_fit
    from molgraphdb_spark.operators.pq import (
        ivfpq_index,
        ivfpq_search,
        read_ivfpq_index,
        write_ivfpq_index,
    )

    coarse = kmeans_fit(emb, "v", "vec_id", k=4, n_iter=2)
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(ivfpq_index(emb, "v", coarse, books), path)
    loaded = read_ivfpq_index(spark, path)
    qrows = emb.filter(F.col("vec_id") < 2).collect()
    queries = [(r["vec_id"], list(r["v"])) for r in qrows]
    res = ivfpq_search(
        emb, "v", "vec_id", queries, coarse, books, k=3, nprobe=2, indexed=loaded
    )
    plan = res._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*cid[^\]]* (?:IN \(|INSET )", plan)
    assert m, plan[:3000]
    # r13 verdict item 1: the ONLY corpus-sized relations in the search
    # plan are pruned scans of the persisted index — the exact rerank
    # reads the pruned index's vector column (broadcast shortlist), not
    # the base embeddings table. Every parquet FileScan must carry the
    # static cid IN PartitionFilters, and the cached base table (which
    # would surface as an InMemoryTableScan) must not appear at all.
    filescans = plan.count("Scan parquet")
    # at >10 probed cells the literal prints as INSET, not IN (...)
    pruned_scans = len(
        re.findall(r"PartitionFilters: \[[^\]]*cid[^\]]* (?:IN \(|INSET )", plan)
    )
    assert filescans >= 2 and pruned_scans == filescans, plan[:3000]
    assert "InMemoryTableScan" not in plan, plan[:3000]
    assert "embeddings.parquet" not in plan, plan[:3000]


def test_pq_search_resident_codes_match_inline(spark, emb, books):
    # The r14 resident-index shape of pq_search: passing a pre-built
    # code table (encoded=pq_encode(...)) must return exactly what the
    # inline derivation returns — reuse changes cost (the base table is
    # never scanned: the rerank reads the code table's vector column),
    # never results.
    from molgraphdb_spark.operators.pq import pq_search

    qrows = emb.filter(F.col("vec_id") < 3).collect()
    queries = [(r["vec_id"], list(r["v"])) for r in qrows]
    inline = pq_search(emb, "v", "vec_id", queries, books, k=3, shortlist=30)
    codes = pq_encode(emb, "v", books).localCheckpoint(eager=True)
    resident = pq_search(
        emb, "v", "vec_id", queries, books, k=3, shortlist=30, encoded=codes
    )
    a = [tuple(r) for r in inline.collect()]
    b = [tuple(r) for r in resident.collect()]
    assert a == b and len(a) == 9
