"""Property-based tests (hypothesis) for the invariants the engine's
correctness rests on: SMILES round-trips, WL-identity stability under
relabeling, edit-generator emit symmetry, idempotent-append algebra.
Pure-Python (no Spark) so hundreds of cases run in seconds."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from molgraphdb_spark.chem.edits import all_single_edits
from molgraphdb_spark.chem.mol import MolGraph, mol_key, parse_smiles, to_smiles
from molgraphdb_spark.chem.subgraphs import overlap_metrics, subgraph_hashes


@st.composite
def random_trees(draw):
    """Random connected carbon trees (≤8 atoms): always a valid
    molecule under the single-bond model (max degree guarded)."""
    n = draw(st.integers(min_value=1, max_value=8))
    mol = MolGraph(elements=["C"] * n)
    for i in range(1, n):
        parents = [p for p in range(i) if mol.degree(p) < 4]
        if not parents:
            return mol.induced(tuple(range(i)))
        mol.add_bond(draw(st.sampled_from(parents)), i)
    return mol


@given(random_trees())
@settings(max_examples=60, deadline=None)
def test_smiles_roundtrip_preserves_identity(mol):
    assert mol_key(parse_smiles(to_smiles(mol))) == mol_key(mol)


@given(random_trees(), st.randoms())
@settings(max_examples=60, deadline=None)
def test_wl_key_invariant_under_relabeling(mol, rnd):
    # shuffle node labels: isomorphic graph must hash identically
    perm = list(range(mol.n_atoms))
    rnd.shuffle(perm)
    shuffled = MolGraph(
        elements=[mol.elements[perm.index(i)] for i in range(mol.n_atoms)],
        bonds={
            (min(perm[a], perm[b]), max(perm[a], perm[b])): o
            for (a, b), o in mol.bonds.items()
        },
    )
    assert mol_key(shuffled) == mol_key(mol)


@given(st.text(alphabet="CNOSPcnos()[]=#:123+-.@H\\/%Fl", max_size=30))
@settings(max_examples=300, deadline=None)
def test_parser_total_on_arbitrary_input(s):
    # The parser is TOTAL over arbitrary strings: either a valid,
    # connected, valence-sane molecule or SmilesError — never a crash
    # with any other exception type (quarantine contract, P3).
    from molgraphdb_spark.chem.mol import SmilesError

    try:
        mol = parse_smiles(s)
    except SmilesError:
        return
    assert mol.n_atoms > 0
    assert mol.is_connected()
    assert mol.valence_ok()
    # and whatever parses must round-trip through the writer
    assert mol_key(parse_smiles(to_smiles(mol))) == mol_key(mol)


@given(random_trees())
@settings(max_examples=40, deadline=None)
def test_adjacency_roundtrip_preserves_identity(mol):
    # F15 reconstruction: the stored catalog form (elements + 0/1
    # adjacency) rebuilds a molecule with the same WL identity.
    from molgraphdb_spark.chem.mol import from_adjacency

    rebuilt = from_adjacency(mol.elements, mol.adjacency_matrix())
    assert mol_key(rebuilt) == mol_key(mol)


@given(random_trees())
@settings(max_examples=40, deadline=None)
def test_edits_emit_is_bidirectional_and_consistent(mol):
    if mol.n_atoms < 2:
        return
    edges = list(all_single_edits(mol, "m"))
    tuples = {(s, d, da, db, su) for s, _, d, da, db, su in edges}
    for s, d, da, db, su in tuples:
        assert (d, s, -da, -db, su) in tuples  # G5 negated reverse
    # no self-loops, and the source molecule key appears in every pair
    mk = mol_key(mol)
    for s, d, *_ in tuples:
        assert s != d
        assert mk in (s, d)


@given(random_trees())
@settings(max_examples=30, deadline=None)
def test_overlap_metrics_bounds(mol):
    # Tanimoto of a molecule with itself is 1 (or 0 for edgeless);
    # GED-approx to itself is 0; metrics stay in range vs a fixed other
    h = subgraph_hashes(mol)
    other = subgraph_hashes(parse_smiles("CCCC"))
    if h:
        self_m = overlap_metrics(h, h, mol.n_atoms)
        assert self_m["tanimoto"] == 1.0
        assert self_m["ged_approx"] == 0.0
    m = overlap_metrics(h, other, max(mol.n_atoms, 4))
    assert 0.0 <= m["tanimoto"] <= 1.0
    assert m["ged_approx"] >= 0.0
    assert m["n_shared"] <= min(len(h), len(other))


# ---------------------------------------------------------------------------
# As-of join vs pandas merge_asof (the reference implementation)
# ---------------------------------------------------------------------------
import pandas as pd
from hypothesis import settings

from molgraphdb_spark.operators.asof import asof_join

_asof_cases = st.tuples(
    st.lists(  # left: (key, ts_second)
        st.tuples(st.integers(0, 2), st.integers(0, 500)),
        min_size=1, max_size=12,
    ),
    st.lists(  # right: (key, ts_second) — unique ts per key below
        st.tuples(st.integers(0, 2), st.integers(0, 500)),
        min_size=0, max_size=12,
    ),
    st.sampled_from([None, 60, 200]),  # tolerance seconds
)


@given(_asof_cases)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_pandas_merge_asof(case):
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:  # property runs inside the session-scoped suite
        from molgraphdb_spark.session import get_spark

        spark = get_spark("asof-prop", cpus=2)
    lrows, rrows, tol = case
    # merge_asof semantics need unique right ts per key for a unique
    # answer; dedupe (keep one) and sort
    rseen = {}
    for k, t in rrows:
        rseen[(k, t)] = True
    rrows = sorted(rseen)
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {"k": [k for k, _ in lrows],
         "ts": [base + pd.Timedelta(seconds=t) for _, t in lrows],
         "lid": range(len(lrows))}
    ).sort_values("ts", kind="stable").reset_index(drop=True)
    rpdf = pd.DataFrame(
        {"k": pd.Series([k for k, _ in rrows], dtype="int64"),
         "ts": pd.Series([base + pd.Timedelta(seconds=t) for _, t in rrows],
                          dtype="datetime64[ns]"),
         "rid": pd.Series([100 + i for i in range(len(rrows))], dtype="int64")}
    ).sort_values("ts", kind="stable").reset_index(drop=True)

    want_df = pd.merge_asof(
        lpdf, rpdf, on="ts", by="k", suffixes=("", "_r"),
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    want = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in want_df.itertuples()
    }

    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf) if len(rpdf) else spark.createDataFrame(
        [], "k long, ts timestamp, rid long"
    )
    out = asof_join(
        left, right, on=["k"], right_cols=["rid"], tiebreak="rid",
        tolerance_micros=None if tol is None else tol * 1_000_000,
    )
    got = {int(r.lid): (None if r.rid_r is None else int(r.rid_r)) for r in out.collect()}
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=-(10**8), max_value=10**8),
        ),
        min_size=2,
        max_size=50,
    ),
    st.integers(min_value=-(10**9), max_value=10**9),
)
@settings(max_examples=200, deadline=None)
def test_ols_moments_shift_invariance(points, shift):
    # The identity value_trend_stream relies on: the OLS numerator and
    # denominator computed from raw moments are invariant under any
    # constant shift of x — so accumulating UNSHIFTED epoch seconds is
    # exact regardless of when a group's first event arrives.
    def moments(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        return n * sxy - sx * sy, n * sxx - sx * sx

    num0, den0 = moments(points)
    num1, den1 = moments([(x + shift, y) for x, y in points])
    assert (num0, den0) == (num1, den1)
