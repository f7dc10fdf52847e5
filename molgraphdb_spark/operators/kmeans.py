"""DataFrame-native Lloyd's k-means for coarse-quantizer (IVF) training.

The IVF queries in queries/similarity.py use deterministic centroids
(vec_id < k) — correct for the oracle gate, but a production ANN index
trains its coarse quantizer. This operator is the training step,
expressed Spark-first:

- **Assignment is map-only.** Centroids are k×d floats — trivially
  driver-collectable at any corpus scale (k ≤ thousands, d ≤
  thousands) — and are inlined as a literal array, so each iteration's
  assignment is a single `F.aggregate` argmin fold per row inside
  whole-stage codegen: no join, no shuffle, no Python.
- **Update is one aggregation.** Component sums are d parallel
  `F.sum(v[i])` columns (static d read from the schema's first row),
  so the per-iteration shuffle moves exactly k×(d+1) partial
  aggregates per map task — map-side combined, independent of row
  count. No posexplode (which would shuffle n×d rows).
- **n_iter driver jobs total**, one per Lloyd round (plus the init
  collect) — the standard big-data k-means shape (same plan MLlib's
  KMeans produces, without the RDD/legacy-API detour).

Determinism: init is the first k rows by ascending id (no RNG — the
repo-wide design rule), and ties in the argmin resolve to the lowest
centroid id. Float component sums depend on partition reduce order, so
exact centroid bits are NOT reproducible across partitionings; tests
assert invariants (partition coverage, WCSS monotonicity, cluster
count) rather than exact values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _centroid_literal(cents: list[tuple[int, list[float]]]) -> Column:
    """Literal ``array<struct<cid int, cv array<double>>>`` of centroids.

    Built as ONE SQL string parsed JVM-side (a single py4j call) rather
    than nested F.array/F.struct/F.lit Column constructions — a k=16,
    d=8 codebook is ~160 literal nodes, and the PQ queries instantiate
    16 codebooks per plan, so per-node py4j round-trips dominated plan
    BUILD time (~2 s/query at sf0.1). ``repr(float)`` is the shortest
    round-trip decimal and Spark's double parser recovers the exact
    bits, so the parsed tree is identical to the old construction."""
    parts = ", ".join(
        "struct({} as cid, array({}) as cv)".format(
            int(cid), ", ".join(_dlit(x) for x in vec)
        )
        for cid, vec in cents
    )
    return F.expr(f"array({parts})")


def _dlit(x: float) -> str:
    """Exact SQL double literal for ``x``: repr() is the shortest
    round-trip decimal and Spark's parser recovers the same bits;
    non-finite values need the CAST form (not SQL literals)."""
    x = float(x)
    if x != x:
        return "CAST('NaN' AS DOUBLE)"
    if x in (float("inf"), float("-inf")):
        return "CAST('Infinity' AS DOUBLE)" if x > 0 else "CAST('-Infinity' AS DOUBLE)"
    return f"{x!r}D"


def assign_cells(df: DataFrame, vec_col: str, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Map-only nearest-centroid assignment: adds ``cid`` (and the
    squared distance ``d2``) to ``df`` via a literal-array argmin fold.
    Ties resolve to the lowest centroid id (strict < keeps the first).

    K-dispatch (SCALE.md §12): above ``ivf.ASSIGN_LITERAL_MAX_K``
    centroids the literal fold would compile kilonode expression trees,
    so the kernel switches to one Arrow/BLAS ``mapInPandas`` pass with
    the same argmin/tie contract (raw-double d2 may differ in the last
    ulp across kernels; cid agrees except on exact-boundary ties, which
    the micro-unit ``assign_cells_ubp`` variant is for)."""
    from molgraphdb_spark.operators.ivf import ASSIGN_LITERAL_MAX_K, _checked_cents

    cents = _checked_cents(cents)
    if len(cents) > ASSIGN_LITERAL_MAX_K:
        return _assign_l2_blas(df, vec_col, cents, upm=False)
    cent_arr = _centroid_literal(cents)
    v = F.col(vec_col)

    def d2(c: Column) -> Column:
        diff = F.zip_with(v, c["cv"], lambda x, y: x - y)
        return _dot(diff, diff)

    init = F.struct(F.lit(float("inf")).alias("d2"), F.lit(-1).alias("cid"))
    best = F.aggregate(
        cent_arr,
        init,
        lambda acc, c: F.when(
            d2(c) < acc["d2"], F.struct(d2(c).alias("d2"), c["cid"].alias("cid"))
        ).otherwise(acc),
    )
    return df.withColumn("_best", best).select(
        # coalesce: static non-nullability barrier so equi-joins on cid
        # infer no isnotnull(cid) filter (which would inline and
        # re-evaluate the whole fold per row — see ivf._assign_literal).
        # Never fires: the fold's init struct carries cid=-1.
        "*",
        F.coalesce(F.col("_best.cid"), F.lit(-1)).alias("cid"),
        F.col("_best.d2").alias("d2"),
    ).drop("_best")


def assign_cells_ubp(
    df: DataFrame, vec_col: str, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Cross-engine-portable cell assignment: like :func:`assign_cells`
    but the argmin compares squared distances floored to integer
    MICRO-UNITS (the `_ubp` rule — raw-double argmin can flip on the
    last ulp between engines), via ``array_min`` over (d2_upm, cid)
    structs whose lexicographic order IS the (distance ASC, cid ASC)
    tie rule. Adds ``cid`` and ``d2_upm``; map-only. Same K-dispatch
    to the Arrow/BLAS kernel as :func:`assign_cells` — integer
    micro-units make the two kernels tie-exact: BOTH kernels break
    exact ties to the lowest cid because _checked_cents sorts the
    array cid-ascending at entry (ADVICE r12: the rules only agree
    under that ordering — now enforced, not assumed)."""
    from molgraphdb_spark.operators.ivf import ASSIGN_LITERAL_MAX_K, _checked_cents

    cents = _checked_cents(cents)
    if len(cents) > ASSIGN_LITERAL_MAX_K:
        return _assign_l2_blas(df, vec_col, cents, upm=True)
    cent_arr = _centroid_literal(cents)
    v = F.col(vec_col)

    def cell(c: Column) -> Column:
        diff = F.zip_with(v, c["cv"], lambda x, y: x - y)
        d2_upm = F.floor(_dot(diff, diff) * 1_000_000 + 0.5).cast("long")
        return F.struct(d2_upm.alias("d2_upm"), c["cid"].cast("int").alias("cid"))

    best = F.array_min(F.transform(cent_arr, cell))
    return df.withColumn("_best", best).select(
        # coalesce: same non-nullability barrier as assign_cells (never
        # fires; stops equi-joins re-evaluating the fold via an
        # inferred isnotnull(cid) filter).
        "*",
        F.coalesce(F.col("_best.cid"), F.lit(-1)).alias("cid"),
        F.col("_best.d2_upm").alias("d2_upm"),
    ).drop("_best")


def _assign_l2_blas(
    df: DataFrame, vec_col: str, cents: list[tuple[int, list[float]]], *, upm: bool
) -> DataFrame:
    """Arrow/BLAS L2 assignment kernel for K > ASSIGN_LITERAL_MAX_K:
    one ``mapInPandas`` pass computing the full (batch×K) distance
    matrix via ||v||² + ||c||² − 2·V@Cᵀ (clamped at 0). Map-only, no
    shuffle — the same plan position as the literal fold."""
    import numpy as np

    cmat = np.array([vec for _, vec in cents], dtype=np.float64)  # (K, d)
    cids = np.array([int(cid) for cid, _ in cents], dtype=np.int64)
    c2 = (cmat * cmat).sum(axis=1)

    fields = ", ".join(f"`{c.name}` {c.dataType.simpleString()}" for c in df.schema)
    schema = fields + (", cid int, d2_upm long" if upm else ", cid int, d2 double")
    in_cols = [c.name for c in df.schema]

    K = len(cids)
    # One preallocated block buffer + in-place ops: a fresh (b, K)
    # temporary costs ~2 s of first-touch faults per 350 MB on this
    # host (see operators/ivf.py) — the expansion runs as dot(out=),
    # two broadcast adds, and an in-place clamp/floor chain. Buffer is
    # size-capped (~128 MB) so production-scale K shrinks the row
    # block instead of ballooning per-task memory.
    BLOCK = max(128, min(4096, (128 << 20) // (8 * K)))

    def kernel(batches):
        buf = np.empty((BLOCK, K), dtype=np.float64)
        for pdf in batches:
            b = len(pdf)
            if b == 0:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)  # (b, d)
            v2 = (V * V).sum(axis=1)
            best = np.empty(b, dtype=np.int64)
            dist = np.empty(b, dtype=np.float64)
            for lo in range(0, b, BLOCK):
                hi = min(lo + BLOCK, b)
                s = buf[: hi - lo]
                np.dot(V[lo:hi], cmat.T, out=s)
                s *= -2.0
                s += c2[None, :]
                s += v2[lo:hi, None]
                np.maximum(s, 0.0, out=s)
                if upm:
                    s *= 1_000_000.0
                    s += 0.5
                    np.floor(s, out=s)
                # np.argmin keeps the FIRST minimum = lowest cid — the
                # literal fold's strict-< tie rule.
                blk_best = s.argmin(axis=1)
                best[lo:hi] = blk_best
                dist[lo:hi] = s[np.arange(hi - lo), blk_best]
            out = pdf[in_cols].copy()
            out["cid"] = cids[best].astype(np.int32)
            if upm:
                out["d2_upm"] = dist.astype(np.int64)
            else:
                out["d2"] = dist
            yield out

    return df.mapInPandas(kernel, schema=schema)


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    n_iter: int = 5,
    init: str = "first",
) -> list[tuple[int, list[float]]]:
    """Train k centroids by ``n_iter`` Lloyd rounds; returns
    ``[(cid, centroid_vector), ...]`` ordered by cid.

    ``init``: "first" seeds from the first k rows by ascending id (the
    historical rule); "hash" seeds from the k first rows ordered by
    ``(xxhash64(id), id)`` — still RNG-free and deterministic, but
    decorrelated from any id-ordered structure in the data (a drift
    continuum seeds one END of itself under "first", collapsing early
    Lloyd rounds; the hot-cell split path uses "hash"). Both are one
    distributed TakeOrdered job.

    Empty-cluster rule: a cell that captures no points keeps its
    previous centroid (the standard practical fallback).

    NULL-vector rows are dropped up front: they cannot seed, assign, or
    contribute to a mean, and a NULL in row 1 must not misreport
    'empty input' when later rows carry vectors (ADVICE r5)."""
    df = df.filter(F.col(vec_col).isNotNull())
    probe = df.select(vec_col).first()
    if probe is None:
        raise ValueError("cannot fit k-means on empty input (no rows with a vector)")
    d = len(probe[0])
    if init == "hash":
        seed_order = [F.xxhash64(F.col(id_col)).asc(), F.col(id_col).asc()]
    elif init == "first":
        seed_order = [F.col(id_col).asc()]
    else:
        raise ValueError(f"unknown init {init!r} (use 'first' or 'hash')")
    first_k = df.orderBy(*seed_order).limit(k).select(id_col, vec_col).collect()
    cents = [(i, list(map(float, r[1]))) for i, r in enumerate(first_k)]
    for _ in range(n_iter):
        assigned = assign_cells(df, vec_col, cents)
        rows = (
            assigned.groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col(vec_col)[i]).alias(f"s{i}") for i in range(d)],
            )
            .collect()
        )
        new = dict(cents)
        for r in rows:
            new[r["cid"]] = [r[f"s{i}"] / r["n"] for i in range(d)]
        cents = sorted(new.items())
    return cents


def kmeans_wcss(df: DataFrame, vec_col: str, cents: list[tuple[int, list[float]]]) -> float:
    """Within-cluster sum of squares under ``cents`` (one job)."""
    return assign_cells(df, vec_col, cents).agg(F.sum("d2")).first()[0]
