"""K-dispatched IVF assignment kernels (operators/ivf.py + the L2
twins in operators/kmeans.py): the literal-array fold and the
Arrow/BLAS mapInPandas pass implement ONE contract — integer
micro-bp scores, argbest ties to the lowest cid — so forcing each
kernel over the same corpus must produce identical assignments.
Also covers the SCALE.md §12 cell-balance gate as a callable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from molgraphdb_spark.operators import ivf
from molgraphdb_spark.operators.ivf import (
    ASSIGN_LITERAL_MAX_K,
    assign_cells_cos_ubp,
    cell_balance,
    require_balanced_cells,
)


def _emb(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
        )
    )


def _cents(df, k):
    rows = sorted(
        df.filter(F.col("vec_id") < k).select("vec_id", "v").collect(),
        key=lambda r: r.vec_id,
    )
    return [(int(r.vec_id), [float(x) for x in r.v]) for r in rows]


def test_cos_blas_matches_literal_full_corpus(spark, sf_dir):
    # Same corpus, same centroids, both kernels forced explicitly:
    # cid, probes, and nrm must agree row for row. K=16 is served by
    # the literal path in production; _assign_blas is reached via the
    # private entry point so the pin holds the CONTRACT, not the
    # dispatch threshold.
    df = _emb(spark, sf_dir)
    cents = _cents(df, 16)
    lit = ivf._assign_literal(df, "v", cents, nprobe=3, with_norm=True)
    blas = ivf._assign_blas(df, "v", cents, nprobe=3, with_norm=True)
    a = {r.vec_id: r for r in lit.collect()}
    b = {r.vec_id: r for r in blas.collect()}
    assert set(a) == set(b) and len(a) > 100
    for vid, ra in a.items():
        rb = b[vid]
        assert ra.cid == rb.cid, vid
        assert list(ra.probes) == list(rb.probes), vid
        assert abs(ra.nrm - rb.nrm) < 1e-9, vid


def test_dispatch_threshold_picks_blas_kernel(spark, sf_dir):
    # Above ASSIGN_LITERAL_MAX_K the public entry point must route to
    # the Arrow pass (plan shows a Python/Arrow eval node); at K=8 it
    # must stay whole-JVM map-only (zero exchange, zero Python).
    df = _emb(spark, sf_dir)
    big = _cents(df, ASSIGN_LITERAL_MAX_K + 8)
    assert len(big) > ASSIGN_LITERAL_MAX_K
    plan_big = (
        assign_cells_cos_ubp(df, "v", big)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan_big
    small = _cents(df, 8)
    plan_small = (
        assign_cells_cos_ubp(df, "v", small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan_small and "Exchange" not in plan_small


def test_blas_path_end_to_end_above_threshold(spark, sf_dir):
    # Public-entry BLAS assignment agrees with the literal fold forced
    # over the same K-above-threshold centroid set.
    df = _emb(spark, sf_dir).limit(400)
    cents = _cents(_emb(spark, sf_dir), ASSIGN_LITERAL_MAX_K + 8)
    got = {r.vec_id: r.cid for r in assign_cells_cos_ubp(df, "v", cents).collect()}
    want = {
        r.vec_id: r.cid
        for r in ivf._assign_literal(
            df, "v", cents, nprobe=None, with_norm=False
        ).collect()
    }
    assert got == want and len(got) == 400


def test_l2_blas_matches_literal_ubp(spark, sf_dir):
    # The L2 twin (kmeans.assign_cells_ubp) — micro-unit floors make
    # the kernels tie-exact; force both over the same corpus.
    from molgraphdb_spark.operators import kmeans

    df = _emb(spark, sf_dir).select("vec_id", "v")
    cents = _cents(_emb(spark, sf_dir), 12)
    lit = {r.vec_id: (r.cid, r.d2_upm) for r in kmeans.assign_cells_ubp(df, "v", cents).collect()}
    blas = {
        r.vec_id: (r.cid, r.d2_upm)
        for r in kmeans._assign_l2_blas(df, "v", cents, upm=True).collect()
    }
    assert lit == blas and len(lit) > 100


def test_l2_dispatch_above_threshold(spark, sf_dir):
    from molgraphdb_spark.operators import kmeans

    df = _emb(spark, sf_dir).select("vec_id", "v")
    cents = _cents(_emb(spark, sf_dir), ASSIGN_LITERAL_MAX_K + 4)
    plan = (
        kmeans.assign_cells(df, "v", cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    # and the assignment still covers every row with a valid cid
    out = kmeans.assign_cells(df, "v", cents)
    n = df.count()
    assert out.count() == n
    assert out.filter(F.col("cid") < 0).count() == 0


def test_cell_balance_gate_passes_and_raises(spark):
    # Balanced: 4 cells × 25 rows → ratio 1.0, gate returns stats.
    rows = [(i, i % 4) for i in range(100)]
    bal = spark.createDataFrame(rows, "vec_id long, cid int")
    stats = require_balanced_cells(bal)
    assert stats["n_cells"] == 4 and stats["ratio"] == pytest.approx(1.0)
    # Skewed: one hot cell holding 97% (the measured ann_production
    # failure shape: cell_max ≈ 30× cell_mean) → loud ValueError.
    rows = [(i, 0 if i < 970 else i) for i in range(1000)]
    hot = spark.createDataFrame(rows, "vec_id long, cid int")
    with pytest.raises(ValueError, match="skew"):
        require_balanced_cells(hot)
    s = cell_balance(hot)
    assert s["max_sz"] == 970 and s["n_cells"] == 31


def test_cell_balance_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, cid int")
    assert cell_balance(empty)["n_cells"] == 0
    require_balanced_cells(empty)  # no rows → no skew → no raise


def test_kernels_agree_under_exact_ties(spark):
    # Tie-stress: integer-valued vectors and centroids make every
    # distance/cosine EXACT in f64 for both kernels (fold and matmul),
    # so ubp scores collide constantly and the lowest-cid rule is the
    # only thing keeping the kernels aligned. 125 lattice vectors vs
    # 8 centroids containing duplicate positions (cid 3 == cid 7,
    # cid 0 == cid 5) — every row must pick the LOWER cid of each
    # duplicate pair in both kernels.
    rows = [
        (i, [float(x), float(y), float(z)])
        for i, (x, y, z) in enumerate(
            (x, y, z)
            for x in range(5)
            for y in range(5)
            for z in range(5)
            if (x, y, z) != (0, 0, 0)  # zero-norm is outside the contract
        )
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = [
        (0, [1.0, 1.0, 1.0]),
        (1, [4.0, 0.0, 2.0]),
        (2, [0.0, 3.0, 3.0]),
        (3, [2.0, 2.0, 2.0]),
        (4, [3.0, 1.0, 0.0]),
        (5, [1.0, 1.0, 1.0]),  # duplicate of 0
        (6, [0.0, 0.0, 4.0]),
        (7, [2.0, 2.0, 2.0]),  # duplicate of 3
    ]
    lit = {r.vec_id: r.cid for r in ivf._assign_literal(df, "v", cents, nprobe=None, with_norm=False).collect()}
    blas = {r.vec_id: r.cid for r in ivf._assign_blas(df, "v", cents, nprobe=None, with_norm=False).collect()}
    assert lit == blas
    assert 5 not in set(lit.values()) and 7 not in set(lit.values())

    from molgraphdb_spark.operators import kmeans

    l2l = {r.vec_id: (r.cid, r.d2_upm) for r in kmeans.assign_cells_ubp(df, "v", cents).collect()}
    l2b = {r.vec_id: (r.cid, r.d2_upm) for r in kmeans._assign_l2_blas(df, "v", cents, upm=True).collect()}
    assert l2l == l2b
    assert all(c not in (5, 7) for c, _ in l2l.values())


def test_blas_path_empty_input(spark, sf_dir):
    # zero-row corpus through the BLAS kernel: schema intact, no rows,
    # no kernel crash on the empty Arrow batch.
    df = _emb(spark, sf_dir).filter(F.col("vec_id") < 0)
    cents = _cents(_emb(spark, sf_dir), ASSIGN_LITERAL_MAX_K + 8)
    out = ivf._assign_blas(df, "v", cents, nprobe=2, with_norm=True)
    assert out.count() == 0
    assert [f.name for f in out.schema][-3:] == ["cid", "nrm", "probes"]


def test_kmeans_fit_trains_through_blas_dispatch(spark, sf_dir):
    # K above the threshold: every Lloyd iteration's assignment rides
    # the BLAS kernel; the fit must still cover all points with valid
    # cids and improve WCSS over the naive init.
    from molgraphdb_spark.operators.kmeans import kmeans_fit, kmeans_wcss

    df = _emb(spark, sf_dir).select("vec_id", "v")
    k = ASSIGN_LITERAL_MAX_K + 4
    naive = kmeans_fit(df, "v", "vec_id", k=k, n_iter=0)
    trained = kmeans_fit(df, "v", "vec_id", k=k, n_iter=2)
    assert [c for c, _ in trained] == list(range(k))
    assert kmeans_wcss(df, "v", trained) <= kmeans_wcss(df, "v", naive)


def test_nprobe_zero_rejected_both_kernels(spark, sf_dir):
    # ADVICE r12: nprobe=0 used to diverge (literal: empty array; BLAS:
    # declared-but-never-emitted column → runtime schema mismatch).
    df = _emb(spark, sf_dir)
    for k in (8, ASSIGN_LITERAL_MAX_K + 8):
        cents = _cents(df, k)
        with pytest.raises(ValueError, match="nprobe"):
            assign_cells_cos_ubp(df, "v", cents, nprobe=0)


def test_literal_probes_fixed_length_contract(spark):
    # ADVICE r14: the stack() unpivot in embedding_hard_negatives_ann's
    # literal branch hardcodes n_take = min(nprobe, K) as the probes
    # array length. Pin the kernel contract it couples to: on the
    # literal path probes is NEVER NULL and has EXACTLY min(nprobe, K)
    # entries for every non-null input vector — a shorter/variable
    # array would make probes[i] yield NULL cids that the downstream
    # equi-join silently drops.
    rows = [(i, [float(i % 5), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents = [(c, [float(c), 1.0]) for c in range(6)]
    for nprobe in (1, 4, 6, 9):  # below, at, and above K
        out = assign_cells_cos_ubp(df, "v", cents, nprobe=nprobe)
        expect = min(nprobe, len(cents))
        sizes = {
            (r.n, r.nulls)
            for r in out.selectExpr(
                "size(probes) AS n", "size(filter(probes, p -> p IS NULL)) AS nulls"
            ).collect()
        }
        assert sizes == {(expect, 0)}, (nprobe, sizes)


def test_unsorted_cents_sorted_at_entry(spark):
    # ADVICE r12: the lowest-cid tie rule used to silently depend on a
    # cid-ascending input; _checked_cents now enforces it. Duplicate
    # POSITIONS with cids passed DESCENDING: both kernels must still
    # tie to the lower cid.
    rows = [(i, [1.0, float(i % 3)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    cents_desc = [(3, [1.0, 1.0]), (1, [0.0, 1.0]), (0, [1.0, 1.0])]
    out = {r.vec_id: r.cid for r in assign_cells_cos_ubp(df, "v", cents_desc).collect()}
    assert 3 not in set(out.values())  # dup of cid 0 → 0 always wins
    with pytest.raises(ValueError, match="duplicate"):
        assign_cells_cos_ubp(df, "v", [(2, [1.0, 0.0]), (2, [0.0, 1.0])])


def _hot_corpus(spark):
    """8 axis centroids in d=8; cell 0 planted hot with TWO interleaved
    separable sub-blobs (100 each, even/odd vec_id so the deterministic
    first-2-by-id 2-means init lands one seed in each blob); cells 1-7
    hold 10 rows each."""
    d = 8
    cents = [(i, [1.0 if j == i else 0.0 for j in range(d)]) for i in range(d)]
    rows = []
    for i in range(200):
        v = [0.0] * d
        v[0] = 1.0
        v[1 if i % 2 == 0 else 2] = 0.45 + 0.001 * (i % 5)
        rows.append((i, v))
    vid = 200
    for c in range(1, d):
        for i in range(10):
            v = [0.0] * d
            v[c] = 1.0
            v[(c + 1) % d] = 0.05 + 0.01 * (i % 3)
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, v array<double>"), cents


def test_balanced_split_preserves_membership_and_bounds_cells(spark):
    # The SCALE.md §12 remediation (r12 verdict item 3): a planted hot
    # cell (200 of 270 rows; ratio 5.9 at 8 cells) is SPLIT by a local
    # 2-means re-train; children partition the parent EXACTLY, cold
    # cells are untouched, and the post-split histogram passes the gate.
    df, cents = _hot_corpus(spark)
    before = {r.vec_id: r.cid for r in assign_cells_cos_ubp(df, "v", cents).collect()}
    hot_members = {v for v, c in before.items() if c == 0}
    assert len(hot_members) == 200
    out, cents_out, stats = ivf.assign_cells_balanced(
        df, "v", cents, id_col="vec_id", nprobe=2, max_ratio=4.0
    )
    assert list(stats["split_map"]) == [0] and stats["spill_cids"] == []
    kids = stats["split_map"][0]
    assert len(kids) >= 2 and min(kids) >= 8 and stats["ratio"] <= 4.0
    after = {r.vec_id: r.cid for r in out.collect()}
    # children partition the parent exactly
    assert {v for v, c in after.items() if c in kids} == hot_members
    # cold assignments byte-identical
    for v, c in before.items():
        if c != 0:
            assert after[v] == c
    # the returned centroid set is the live one: parent gone, kids in
    live = [c for c, _ in cents_out]
    assert 0 not in live and set(kids) <= set(live)
    out.unpersist()


def test_balanced_split_candidate_set_identical_after_expand(spark):
    # Recall contract: expand_probes(parent→leaves) makes the probed
    # candidate set of EVERY anchor identical to the unsplit index.
    from molgraphdb_spark.operators.ivf import expand_probes

    df, cents = _hot_corpus(spark)
    plain = assign_cells_cos_ubp(df, "v", cents, nprobe=2).collect()
    members_before: dict[int, set] = {}
    for r in plain:
        members_before.setdefault(r.cid, set()).add(r.vec_id)
    out, _, stats = ivf.assign_cells_balanced(
        df, "v", cents, id_col="vec_id", nprobe=2, max_ratio=4.0
    )
    expanded = expand_probes(out, stats["split_map"]).collect()
    members_after: dict[int, set] = {}
    for r in expanded:
        members_after.setdefault(r.cid, set()).add(r.vec_id)
    probes_before = {r.vec_id: list(r.probes) for r in plain}
    for r in expanded:
        want = set().union(*(members_before[p] for p in probes_before[r.vec_id]))
        got = set().union(*(members_after.get(p, set()) for p in r.probes))
        assert got == want, r.vec_id
    out.unpersist()


def test_balanced_split_spills_inseparable_cell(spark):
    # Degradation contract: an all-identical hot cell cannot be split
    # (children tie → everything keeps the lower cid) — after
    # max_rounds the residual hot cid is RETURNED in spill_cids, not
    # raised, and membership is still exact.
    d = 4
    cents = [(i, [1.0 if j == i else 0.0 for j in range(d)]) for i in range(d)]
    rows = [(i, [1.0, 0.2, 0.0, 0.0]) for i in range(120)]
    vid = 120
    for c in range(1, d):
        for i in range(5):
            v = [0.0] * d
            v[c] = 1.0
            rows.append((vid, v))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out, cents_out, stats = ivf.assign_cells_balanced(
        df, "v", cents, id_col="vec_id", max_ratio=2.0, max_rounds=2
    )
    assert stats["spill_cids"], "inseparable hot cell must spill, not raise"
    after = {r.vec_id: r.cid for r in out.collect()}
    spill = set(stats["spill_cids"])
    assert {v for v, c in after.items() if c in spill} == set(range(120))
    # the split chain resolves to leaves: expanding the ORIGINAL parent
    # cid 0 reaches the spill cell
    leaves = stats["split_map"][0]
    assert spill <= set(leaves)
    out.unpersist()


def test_balanced_noop_on_balanced_corpus(spark, sf_dir):
    # Balanced input: no splits, no spills, assignment identical to the
    # plain kernel (same persisted values), centroids returned sorted.
    df = _emb(spark, sf_dir).limit(300)
    cents = _cents(_emb(spark, sf_dir), 8)
    out, cents_out, stats = ivf.assign_cells_balanced(
        df, "v", cents, id_col="vec_id", nprobe=3, max_ratio=1e9
    )
    assert stats["split_map"] == {} and stats["spill_cids"] == []
    plain = assign_cells_cos_ubp(df, "v", cents, nprobe=3)
    a = {(r.vec_id, r.cid, tuple(r.probes)) for r in out.collect()}
    b = {(r.vec_id, r.cid, tuple(r.probes)) for r in plain.collect()}
    assert a == b and len(a) == 300
    assert cents_out == sorted(cents, key=lambda c: c[0])
    out.unpersist()


def _inseparable_corpus(spark):
    # 120 identical vectors in cell 0 (a cell no k-means split can
    # separate) + 5 distinct rows in each other cell — the
    # test_balanced_split_spills_inseparable_cell fixture, shared by
    # the spill-consumer tests below.
    d = 4
    cents = [(i, [1.0 if j == i else 0.0 for j in range(d)]) for i in range(d)]
    rows = [(i, [1.0, 0.2, 0.0, 0.0]) for i in range(120)]
    vid = 120
    for c in range(1, d):
        for i in range(5):
            v = [0.0] * d
            v[c] = 1.0
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, v array<double>"), cents


def test_shortlist_with_spill_candidate_set_identical(spark):
    # The spill_cids CONSUMER (r13 verdict item 3): with splits
    # disabled (max_rounds=0) the inseparable hot cell spills, and
    # shortlist_with_spill's salted side channel must produce EXACTLY
    # the plain equi-join's (anchor, member) multiset — recall 1.0 on
    # the spilled cell by construction, each pair exactly once.
    from collections import Counter

    df, cents = _inseparable_corpus(spark)
    out, _, stats = ivf.assign_cells_balanced(
        df, "v", cents, id_col="vec_id", nprobe=2, max_ratio=2.0, max_rounds=0
    )
    assert stats["spill_cids"] == [0] and stats["split_map"] == {}
    probes_df = out.select(
        F.col("vec_id").alias("ia"), F.explode("probes").alias("cid")
    )
    members_df = out.select(F.col("vec_id").alias("ib"), "cid")
    plain = Counter(
        (r.ia, r.ib, r.cid) for r in probes_df.join(members_df, "cid").collect()
    )
    for n_salt in (1, 4, 32):
        salted = Counter(
            (r.ia, r.ib, r.cid)
            for r in ivf.shortlist_with_spill(
                probes_df, members_df, stats["spill_cids"],
                member_id_col="ib", n_salt=n_salt,
            ).collect()
        )
        assert salted == plain, n_salt
    # the spilled cell's pairs are all present: 120 members x every
    # anchor that probes cell 0
    assert sum(1 for (_, _, c) in plain if c == 0) > 0
    out.unpersist()


def test_shortlist_with_spill_noop_and_validation(spark):
    # Empty spill list = the plain equi-join, byte-identical plan
    # inputs; n_salt < 1 is rejected loudly.
    df, cents = _inseparable_corpus(spark)
    assigned = assign_cells_cos_ubp(df, "v", cents, nprobe=2)
    probes_df = assigned.select(
        F.col("vec_id").alias("ia"), F.explode("probes").alias("cid")
    )
    members_df = assigned.select(F.col("vec_id").alias("ib"), "cid")
    a = {(r.ia, r.ib) for r in ivf.shortlist_with_spill(
        probes_df, members_df, [], member_id_col="ib").collect()}
    b = {(r.ia, r.ib) for r in probes_df.join(members_df, "cid").collect()}
    assert a == b
    with pytest.raises(ValueError, match="n_salt"):
        ivf.shortlist_with_spill(
            probes_df, members_df, [0], member_id_col="ib", n_salt=0
        )


def test_hard_negatives_ann_production_branch_matches_literal(
    spark, sf_dir, monkeypatch
):
    # r13 verdict item 4: the SHIPPED query's production-K branch
    # (assign_cells_balanced + expand_probes + shortlist_with_spill)
    # never executes at the fixture K=8 under the real threshold —
    # lower the dispatch threshold so it does, and pin its output
    # hash-equal to the literal branch.
    from molgraphdb_spark.queries.similarity import embedding_hard_negatives_ann

    want = [tuple(r) for r in embedding_hard_negatives_ann(spark, sf_dir).collect()]
    monkeypatch.setattr(ivf, "ASSIGN_LITERAL_MAX_K", 2)
    got = [tuple(r) for r in embedding_hard_negatives_ann(spark, sf_dir).collect()]
    assert got == want and len(want) > 0
