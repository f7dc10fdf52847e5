"""Bloom-filter runtime join pruning — the build-side digest pattern.

At 100 TB the dominant cost of a selective fact⋈dim join is moving
fact rows that will never match: the shuffle (or even the scan) pays
for rows the dim side later rejects. Engines attack this with runtime
filters — a compact digest of the build side's join keys, shipped to
the probe side so non-matching rows die at the scan, BEFORE the
shuffle. Spark itself has an AQE flavor
(``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``, off by
default and only injected under cost heuristics); this operator is the
EXPLICIT version a pipeline can place deliberately and reuse across
several probe joins of the same build side.

Spark-first shape:

- **Build** (:func:`bloom_build`): hash every build key into k bit
  positions (``xxhash64`` with k seed columns — JVM codegen, no
  Python), take the DISTINCT positions (bounded by m, NOT by build
  cardinality — at most m/64·8 bytes ever reach the driver), and fold
  them into ``m/64`` longs driver-side. The build relation itself
  never moves: one partial-aggregated shuffle of ≤m ints.
- **Probe** (:func:`bloom_might_contain`): a pure Column expression —
  bitmap literal + k shift/mask tests — that runs inside whole-stage
  codegen and pushes BELOW the join: probe rows drop at the scan
  projection, so the join shuffle moves only survivors.
- False positives (rate ≈ (1-e^{-kn/m})^k) are removed by the exact
  join that follows; the bloom stage only PRUNES, never decides — the
  query result is bit-identical with the filter on or off (the oracle
  checks exactly this).

Determinism: xxhash64 is a fixed pure function, so the bitmap — and
therefore the pruned plan — is identical on every run/partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default geometry: 64 Kib bitmap, 5 hashes — <1% FP up to ~6k keys.
BLOOM_M_BITS = 1 << 16
BLOOM_K = 5


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for a key: xxhash64(key, seed_i) mod m. The
    extra seed literal participates in the hash, giving k independent
    hash functions from the one JVM-side primitive."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> list[int]:
    """Fold the build side's keys into an m-bit bitmap, returned as
    ``m_bits/64`` Python ints (one per 64-bit word, LSB-first).

    The scan emits k positions per key; DISTINCT bounds the shuffle
    and the driver transfer by m (65536 positions = 512 KiB worst
    case) no matter how many build rows exist."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos_rows = (
        df.select(
            F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        p = int(r.pos)
        words[p // 64] |= 1 << (p % 64)
    # Python ints are unbounded; re-wrap to signed 64-bit for LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> Column:
    """Membership-test Column: true iff all k bits are set. A literal
    array of m/64 longs + shift/mask per hash — whole-stage-codegen
    all the way, evaluable at the probe scan."""
    arr = F.expr(
        "array({})".format(", ".join(f"{int(w)}L" for w in words))
    )
    tests = []
    for p in _positions(key, m_bits, k):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        # call_function: the F.shiftright wrapper only takes a literal
        # int shift, but the SQL function accepts a column
        shifted = F.call_function("shiftright", word, (p % 64).cast("int"))
        tests.append(shifted.bitwiseAND(F.lit(1)) == 1)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out
