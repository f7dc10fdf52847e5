"""Golden tests for the chemistry layer against FIXTURES.md §2 —
the reference's own demo corpus semantics, re-verified here on the
pure-Python MolGraph model (SURVEY.md §7 M2 fallback).
"""

from __future__ import annotations

import pytest

from molgraphdb_spark.chem.edits import all_single_edits, atom_substitutions
from molgraphdb_spark.chem.mol import (
    SmilesError,
    mol_key,
    parse_smiles,
    to_smiles,
    validate_ged_input,
)
from molgraphdb_spark.chem.spark_ops import (
    expand_relations,
    molecule_subgraphs,
    parse_molecules,
    subgraph_catalog,
)
from molgraphdb_spark.chem.subgraphs import exact_ged, overlap_metrics, subgraph_hashes

EXAMPLES = {
    "Butane": "CCCC",
    "Isopentane": "CCC(C)C",
    "Cyclobutane": "C1CCC1",
    "Neopentane": "CC(C)(C)C",
    "Hexane": "CCCCCC",
}
GOLDEN_COUNTS = {"Butane": 3, "Isopentane": 5, "Cyclobutane": 3, "Neopentane": 4, "Hexane": 5}


# ---------------------------------------------------------------- pure python
def test_subgraph_counts_golden():
    for name, smi in EXAMPLES.items():
        assert len(subgraph_hashes(parse_smiles(smi))) == GOLDEN_COUNTS[name], name


def test_neopentane_hexane_overlap_golden():
    neo, hexn = parse_smiles(EXAMPLES["Neopentane"]), parse_smiles(EXAMPLES["Hexane"])
    m = overlap_metrics(subgraph_hashes(neo), subgraph_hashes(hexn), 6)
    assert m == {"n_shared": 2, "n_union": 7, "tanimoto": 0.286, "ged_approx": 3.0}


def test_validator_rejects():
    # mcs.py:36–52 gate: parse failure, >10 atoms, non-carbon, non-single bonds
    assert validate_ged_input("CCO") == (False, "non-carbon atom")
    assert not validate_ged_input("C=C")[0]
    assert not validate_ged_input("CCCCCCCCCCC")[0]
    assert not validate_ged_input("not_smiles")[0]
    assert validate_ged_input("CC(C)(C)C") == (True, "ok")


def test_wl_identity_isomorphism_invariant():
    # same molecule written differently → same key (vertex identity,
    # replacing RDKit canonical SMILES, main.py:95)
    assert mol_key(parse_smiles("CCC")) == mol_key(parse_smiles("C(C)C"))
    assert mol_key(parse_smiles("CCCC")) != mol_key(parse_smiles("CC(C)C"))


def test_smiles_roundtrip():
    for smi in EXAMPLES.values():
        m = parse_smiles(smi)
        assert mol_key(parse_smiles(to_smiles(m))) == mol_key(m)


def test_parse_rejects_disconnected():
    with pytest.raises(SmilesError):
        parse_smiles("CC.CC")


def test_substitution_respects_valence():
    # central carbon of neopentane has 4 bonds: C→N there is invalid
    # (N valence 3) and must die in the sanitize gate — only the 4
    # terminal substitutions survive (one forward+reverse pair each)
    neo = parse_smiles("CC(C)(C)C")
    edges = list(atom_substitutions(neo, "neo"))
    assert len(edges) == 8  # 4 valid sites × 2 directions, central excluded
    for _, smi, *_ in edges:
        assert parse_smiles(smi).valence_ok()
    # all 4 terminal substitutions are isomorphic → a single WL key
    fwd_keys = {k for k, smi, *_ in edges if smi != "CC(C)(C)C"}
    assert len(fwd_keys) == 1
    # propane: 3 sites × 2 directions (dedup happens at the DataFrame
    # layer via dropDuplicates, like the reference's INSERT OR IGNORE)
    assert len(list(atom_substitutions(parse_smiles("CCC"), "p"))) == 6


def test_edge_diff_sign_is_dst_minus_src():
    # Reference convention (main.py:109-114): each directed edge stores
    # target-minus-source. Deleting an atom from propane gives ethane;
    # the CC->CCC edge must carry diff_atom=+1, diff_bond=+1, and the
    # CCC->CC edge the negation.
    from molgraphdb_spark.chem.edits import atom_deletions

    ccc = parse_smiles("CCC")
    cc_key = mol_key(parse_smiles("CC"))
    ccc_key = mol_key(ccc)
    edges = {(src, dst): (da, db) for src, _, dst, da, db, _ in atom_deletions(ccc, "p")}
    assert edges[(cc_key, ccc_key)] == (1, 1)
    assert edges[(ccc_key, cc_key)] == (-1, -1)


def test_reference_demo_molecules_parse():
    # The reference's own demo corpus (/root/reference/main.py:385-391)
    # parses end-to-end; heavy-atom counts match the molecular formulas
    # (sildenafil C22H30N6O4S=33, vardenafil C23H32N6O4S=34,
    # tadalafil C22H19N3O4=29, aspirin C9H8O4=13, ibuprofen C13H18O2=15).
    demos = {
        r"CCCC1=NN(C2=C1N=C(NC2=O)C3=C(C=CC(=C3)S(=O)(=O)N4CCN(CC4)C)OCC)C": 33,
        r"O=C2\N=C(/Nn1c(nc(c12)C)CCC)c3cc(ccc3OCC)S(=O)(=O)N4CCN(CC)CC4": 34,
        r"CN1CC(=O)N2[C@H](Cc3c([nH]c4ccccc34)[C@H]2c2ccc3c(c2)OCO3)C1=O": 29,
        r"O=C(C)Oc1ccccc1C(=O)O": 13,
        r"CC(C)Cc1ccc(cc1)[C@@H](C)C(=O)O": 15,
    }
    for smi, n in demos.items():
        m = parse_smiles(smi)
        assert m.n_atoms == n, smi
        # display round-trip preserves identity
        assert mol_key(parse_smiles(to_smiles(m))) == mol_key(m), smi


def test_kekule_aromatic_identity():
    # Perceived Kekulé benzenoid rings share identity with lowercase
    # aromatic forms (RDKit SanitizeMol behavior the reference relies
    # on, main.py:94-95) ...
    pairs = [
        ("c1ccccc1", "C1=CC=CC=C1"),
        ("c1ccncc1", "C1=CC=NC=C1"),
        ("c1ccc2ccccc2c1", "C1=CC=CC2=C1C=CC=C2"),
        ("O=C(C)Oc1ccccc1C(=O)O", "CC(=O)OC1=CC=CC=C1C(=O)O"),
        # 5-ring heteroaromatics: Kekulé forms perceive via the
        # lone-pair-donor rule (pyrrole / furan / thiophene)
        ("c1cc[nH]c1", "C1=CC=CN1"),
        ("c1ccoc1", "C1=CC=CO1"),
        ("c1ccsc1", "C1=CC=CS1"),
        # fused: Kekulé indole perceives after its benzo ring does
        ("c1ccc2[nH]ccc2c1", "C1=CC=C2NC=CC2=C1"),
        # peri-fused: pyrene's FUNDAMENTAL cycle basis is [6,6,6,12], so
        # basis-driven perception finds 0/16 aromatic atoms — the
        # all-simple-5/6-cycle enumeration finds every hexagonal face
        ("c1cc2ccc3cccc4ccc(c1)c2c34", "C1=CC2=C3C(=C1)C=CC4=CC=CC(=C43)C=C2"),
        # linear fused (anthracene) still converges via the fixpoint
        ("c1ccc2cc3ccccc3cc2c1", "C1=CC2=CC3=CC=CC=C3C=C2C=C1"),
        # biphenyl: implicit inter-ring bond is a single (bridge), same
        # identity as the explicit '-' form
        ("c1ccccc1c1ccccc1", "c1ccccc1-c1ccccc1"),
    ]
    for a, b in pairs:
        assert mol_key(parse_smiles(a)) == mol_key(parse_smiles(b)), (a, b)
    # ... while bond order still separates non-isomorphic molecules,
    # and anti-aromatic/quinoid rings stay non-aromatic.
    assert len({mol_key(parse_smiles(s)) for s in ("CC", "C=C", "C#C")}) == 3
    assert not parse_smiles("O=C1C=CC(=O)C=C1").aromatic  # quinone
    assert not parse_smiles("C1CCCCC1").aromatic  # cyclohexane
    assert not parse_smiles("C1=CC=CC1").aromatic  # cyclopentadiene (C donor)
    with pytest.raises(SmilesError):
        parse_smiles("C:C")  # explicit aromatic bond, non-aromatic atoms


def test_dense_polycyclic_roundtrip_uses_percent_labels():
    # 10+ simultaneous ring closures must emit %nn labels — bare '12'
    # re-parses as two single-digit closures and silently rebuilds a
    # different molecule.
    from molgraphdb_spark.chem.mol import MolGraph

    m = MolGraph(elements=["C"] * 20)

    def idx(r, c):
        return r * 5 + c

    for r in range(4):
        for c in range(5):
            if c < 4:
                m.add_bond(idx(r, c), idx(r, c + 1))
            if r < 3:
                m.add_bond(idx(r, c), idx(r + 1, c))
    s = to_smiles(m)
    assert "%" in s
    assert mol_key(parse_smiles(s)) == mol_key(m)


def test_aspirin_edit_expansion_counts():
    # Single-edit generator counts over aspirin, pinned (deterministic
    # under the extended model; the reference expands exactly this
    # molecule at main.py:393-400).
    from molgraphdb_spark.chem.edits import (
        atom_deletions,
        atom_substitutions,
        bond_deletions,
    )

    # Edits that tear the aromatic ring open (ring atom/bond deletions)
    # die in the aromatic-integrity gate, matching RDKit sanitize in
    # the reference's _check_and_return.
    aspirin = parse_smiles("O=C(C)Oc1ccccc1C(=O)O")
    assert len(list(atom_substitutions(aspirin, "a"))) == 14
    assert len(list(bond_deletions(aspirin, "a"))) == 14
    assert len(list(atom_deletions(aspirin, "a"))) == 8
    edges = list(all_single_edits(aspirin, "a"))
    assert len(edges) == 36
    for _, smi, *_ in edges:
        assert parse_smiles(smi).valence_ok()  # every candidate re-parses


def test_exact_ged_hand_cases():
    p = parse_smiles
    assert exact_ged(p("CCC"), p("CCC")) == 0.0
    assert exact_ged(p("CC"), p("CCC")) == 2.0  # 1 node + 1 edge
    assert exact_ged(p("CCCC"), p("C1CCC1")) == 1.0  # close the ring
    assert exact_ged(p("CCC"), p("CNC")) == 1.0  # 1 relabel
    # 8–10-atom cases (cap now matches the reference's 10-atom
    # validator bound, mcs.py:41)
    assert exact_ged(p("CCCCCCCC"), p("CC(C)CCCCC")) == 2.0  # move a methyl
    assert exact_ged(p("C1CCCCCCC1"), p("CCCCCCCC")) == 1.0  # open the ring
    assert exact_ged(p("C1CCCCC1CCCC"), p("CCCCCCCCCC")) == 1.0
    assert exact_ged(p("CCCCCCCCCC"), p("NCCCCCCCCN")) == 2.0  # 2 relabels
    assert exact_ged(p("CCCCCCCCCCC"), p("CC")) is None  # >10-atom guard


# ---------------------------------------------------------------- spark layer
def test_parse_molecules_quarantine(spark):
    df = parse_molecules(spark, ["CCCC", "C=C", "CC(C", "CC.CC"])
    rows = {r.smiles: r for r in df.collect()}
    assert rows["CCCC"].valid and rows["CCCC"].n_atoms == 4
    assert rows["C=C"].valid and rows["C=C"].n_bonds == 1  # double bond, one bond entry
    assert not rows["CC(C"].valid  # unbalanced branch → quarantined
    assert not rows["CC.CC"].valid  # disconnected → quarantined


def test_subgraph_catalog_semantics(spark):
    mols = parse_molecules(spark, list(EXAMPLES.values())).filter("valid")
    cat = subgraph_catalog(molecule_subgraphs(mols)).collect()
    assert len(cat) == 9  # distinct WL hashes across the corpus
    # single-edge subgraph: all 5 parents, frequency counts observations
    edge_row = next(r for r in cat if r.size == 2)
    assert len(edge_row.parent_molecules) == 5
    assert edge_row.frequency == 5
    # upsert-never-duplicates: one row per hash
    assert len({r.subgraph_hash for r in cat}) == 9


def test_reference_simple_demo_flow(spark):
    # The reference's simple-molecule demo verbatim (main.py:377-382):
    # add_relations([CCC, CC, C(C)C], min_atoms=1) then
    # query(CCCCCC, CC(CC)C) — neither query molecule is in the edit
    # graph (single edits only shrink), so the path length is -1.
    edges, _ = expand_relations(spark, ["CCC", "CC", "C(C)C"], depth=2)
    from molgraphdb_spark.operators.graph import bfs_query

    k_hexane = mol_key(parse_smiles("CCCCCC"))
    k_methylbutane = mol_key(parse_smiles("CC(CC)C"))
    assert bfs_query(edges, k_hexane, k_methylbutane) == -1
    # and a pair that IS connected resolves (CCC -> CC, one deletion)
    assert bfs_query(edges, mol_key(parse_smiles("CCC")), mol_key(parse_smiles("CC"))) == 2


def test_expand_relations_fixed_point(spark):
    # seeds CCC, CC, C(C)C (main.py:377–380): CCC ≡ C(C)C (same WL id)
    edges, vertices = expand_relations(spark, ["CCC", "CC", "C(C)C"], depth=2)
    v = {r.mol_id for r in vertices.collect()}
    assert len(v) == vertices.count()  # unique ids
    e = edges.collect()
    # bidirectional: every edge has its reverse
    pairs = {(r.src, r.dst) for r in e}
    assert all((d, s) in pairs for s, d in pairs)
    # idempotent: no duplicate ordered pairs
    assert len(pairs) == len(e)
    # seeds CCC and CC connected via atom deletion (dist 1)
    from molgraphdb_spark.operators.graph import bfs_query

    k_ccc = mol_key(parse_smiles("CCC"))
    k_cc = mol_key(parse_smiles("CC"))
    assert bfs_query(edges, k_ccc, k_cc) == 2
