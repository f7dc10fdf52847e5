"""Single-edit molecule generators (SURVEY.md §2.9 G2–G5) — the
dataflow heart of the reference's edit graph
(/root/reference/main.py:53–114), re-expressed over the pure-Python
MolGraph model.

Each generator takes one molecule and emits candidate neighbors one
edit away; ``check_candidate`` applies the validity predicate P2
(main.py:86–114: sanitize, connected/no '.', ≥min_atoms, ≥min_bonds)
and the bidirectional edge emit G5 (two directed edges with negated
diffs, main.py:113–114).

These are plain Python functions: the Spark layer wraps them in
``mapInPandas`` (one input row → many edge rows), so they run
Arrow-batched on executors (SURVEY.md §2.11).
"""

from __future__ import annotations

from collections.abc import Iterator

from molgraphdb_spark.chem.mol import MolGraph, mol_key, to_smiles

#: Default lower bounds of the validity predicate (main.py:92–105).
MIN_ATOMS = 2
MIN_BONDS = 1


def _candidate_edges(
    mol: MolGraph,
    mol_id: str,
    cand: MolGraph,
    subs: int,
    min_atoms: int,
    min_bonds: int,
) -> Iterator[tuple[str, str, str, int, int, int]]:
    """Validity gate + bidirectional emit (G5, main.py:86–114).

    Yields (key, smiles, other_key, diff_atom, diff_bond, subs) for
    both directions; each directed edge carries destination-minus-source
    (main.py:109–114: the candidate→original edge stores
    ``self.n_atoms - next_n_atoms``, i.e. dst − src).
    """
    if not cand.is_connected():  # the '.' check (main.py:101)
        return
    if not cand.valence_ok():  # sanitize (main.py:94)
        return
    if not cand.aromatic_ok():  # kekulization failure dies in sanitize too
        return
    if cand.n_atoms < min_atoms or cand.n_bonds < min_bonds:  # main.py:96–105
        return
    ckey = mol_key(cand)
    mkey = mol_key(mol)
    if ckey == mkey:
        return
    d_atom = cand.n_atoms - mol.n_atoms
    d_bond = cand.n_bonds - mol.n_bonds
    yield (ckey, to_smiles(cand), mkey, -d_atom, -d_bond, subs)
    yield (mkey, to_smiles(mol), ckey, d_atom, d_bond, subs)


def atom_deletions(
    mol: MolGraph, mol_id: str, min_atoms: int = MIN_ATOMS, min_bonds: int = MIN_BONDS
) -> Iterator[tuple]:
    """G3 (main.py:69–74): one candidate per deleted atom."""
    for i in range(mol.n_atoms):
        keep = tuple(j for j in range(mol.n_atoms) if j != i)
        if not keep:
            continue
        yield from _candidate_edges(
            mol, mol_id, mol.induced(keep), 0, min_atoms, min_bonds
        )


def bond_deletions(
    mol: MolGraph, mol_id: str, min_atoms: int = MIN_ATOMS, min_bonds: int = MIN_BONDS
) -> Iterator[tuple]:
    """G2 (main.py:60–67): one candidate per deleted bond, keeping the
    largest fragment when deletion disconnects (main.py:66)."""
    for bond in sorted(mol.bonds):
        cand = mol.copy()
        cand.bonds.pop(bond, None)
        cand = cand.largest_fragment()
        yield from _candidate_edges(mol, mol_id, cand, 0, min_atoms, min_bonds)


def atom_substitutions(
    mol: MolGraph,
    mol_id: str,
    elem_from: str = "C",
    elem_to: str = "N",
    min_atoms: int = MIN_ATOMS,
    min_bonds: int = MIN_BONDS,
) -> Iterator[tuple]:
    """G4 (main.py:76–84): one candidate per atom of ``elem_from``
    swapped to ``elem_to`` (P6 element filter at main.py:82); invalid
    valences (e.g. a 4-bonded C→N) die in the sanitize gate."""
    for i, el in enumerate(mol.elements):
        if el != elem_from:
            continue
        cand = mol.copy()
        cand.elements[i] = elem_to
        yield from _candidate_edges(mol, mol_id, cand, 1, min_atoms, min_bonds)


def all_single_edits(
    mol: MolGraph, mol_id: str, min_atoms: int = MIN_ATOMS, min_bonds: int = MIN_BONDS
) -> Iterator[tuple]:
    """The full wave-expansion generator set in the reference's order
    (add_next_wavefront, main.py:244–260: substitutions, bond
    deletions, atom deletions)."""
    yield from atom_substitutions(mol, mol_id, min_atoms=min_atoms, min_bonds=min_bonds)
    yield from bond_deletions(mol, mol_id, min_atoms, min_bonds)
    yield from atom_deletions(mol, mol_id, min_atoms, min_bonds)
