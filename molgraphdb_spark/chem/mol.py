"""Pure-Python molecular graph model — the chemistry substrate for the
edit-graph and subgraph/GED pipelines (SURVEY.md §7 M2/M3).

RDKit is not available in this environment, so this implements the
graph-theoretic fallback SURVEY.md §7 M2 plans: molecules as
element-labeled undirected graphs parsed from a SMILES subset
(single bonds; C/N/O; branches; ring closures) — exactly the model the
reference's GED pipeline validates down to anyway
(/root/reference/src/mcs.py:33–54: ≤10 atoms, carbon-only, single
bonds; graph built at mcs.py:178–194 with element node attrs).

Identity: molecules and subgraphs are keyed by a Weisfeiler–Lehman
hash over element labels (networkx ≥3.5 convention, deterministic
across processes — replacing both RDKit canonical SMILES
(/root/reference/main.py:95) and the reference's PYTHONHASHSEED-
dependent fallback ``str(hash(...))`` (mcs.py:241; SURVEY.md §7
risk 3). WL-hash identity is isomorphism-class identity, which is
what canonical SMILES encodes.

These objects exist ONLY transiently inside pandas-UDF/mapInPandas
workers (SURVEY.md §1.1) — they are never stored or shuffled; the
engine's persistent state is plain DataFrames of strings/ints.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import networkx as nx

#: Max bonds per element under the single-bond-only model.
VALENCE = {"C": 4, "N": 3, "O": 2}

#: Validation limits of the GED pipeline (mcs.py:41–52).
MAX_ATOMS_GED = 10


class SmilesError(ValueError):
    pass


@dataclass
class MolGraph:
    """Element-labeled undirected graph; nodes are 0..n-1."""

    elements: list[str] = field(default_factory=list)
    bonds: set[tuple[int, int]] = field(default_factory=set)

    @property
    def n_atoms(self) -> int:
        return len(self.elements)

    @property
    def n_bonds(self) -> int:
        return len(self.bonds)

    def add_atom(self, element: str) -> int:
        self.elements.append(element)
        return len(self.elements) - 1

    def add_bond(self, i: int, j: int) -> None:
        if i == j:
            raise SmilesError("self-bond")
        self.bonds.add((min(i, j), max(i, j)))

    def neighbors(self, i: int) -> list[int]:
        return sorted(
            (b if a == i else a) for a, b in self.bonds if i in (a, b)
        )

    def degree(self, i: int) -> int:
        return sum(1 for a, b in self.bonds if i in (a, b))

    def is_connected(self) -> bool:
        if self.n_atoms == 0:
            return False
        seen = {0}
        stack = [0]
        while stack:
            for nb in self.neighbors(stack.pop()):
                if nb not in seen:
                    seen.add(nb)
                    stack.append(nb)
        return len(seen) == self.n_atoms

    def valence_ok(self) -> bool:
        """Sanitize-analogue (main.py:94): degree within element valence."""
        return all(
            self.degree(i) <= VALENCE.get(el, 0) for i, el in enumerate(self.elements)
        )

    def to_nx(self) -> nx.Graph:
        """Element-labeled networkx graph (mcs.py:178–194 shape)."""
        g = nx.Graph()
        for i, el in enumerate(self.elements):
            g.add_node(i, symbol=el)
        g.add_edges_from(self.bonds)
        return g

    def induced(self, nodes: tuple[int, ...]) -> "MolGraph":
        """Induced subgraph on ``nodes`` (relabeled 0..k-1)."""
        remap = {n: k for k, n in enumerate(sorted(nodes))}
        sub = MolGraph(elements=[self.elements[n] for n in sorted(nodes)])
        for a, b in self.bonds:
            if a in remap and b in remap:
                sub.add_bond(remap[a], remap[b])
        return sub

    def largest_fragment(self) -> "MolGraph":
        """LargestFragmentChooser analogue (main.py:31,66): keep the
        biggest connected component (ties → the one with the smallest
        node index, matching deterministic traversal)."""
        comps: list[set[int]] = []
        unseen = set(range(self.n_atoms))
        while unseen:
            start = min(unseen)
            comp = {start}
            stack = [start]
            while stack:
                for nb in self.neighbors(stack.pop()):
                    if nb not in comp:
                        comp.add(nb)
                        stack.append(nb)
            comps.append(comp)
            unseen -= comp
        best = max(comps, key=lambda c: (len(c), -min(c)))
        return self.induced(tuple(best))

    def copy(self) -> "MolGraph":
        return MolGraph(elements=list(self.elements), bonds=set(self.bonds))

    def adjacency_matrix(self) -> list[list[int]]:
        """Dense 0/1 matrix over node order (mcs.py:230–239 shape) —
        stored as a real ArrayType(ArrayType(Int)), never JSON-in-TEXT
        (SURVEY.md §1.1)."""
        n = self.n_atoms
        m = [[0] * n for _ in range(n)]
        for a, b in self.bonds:
            m[a][b] = m[b][a] = 1
        return m


def parse_smiles(smiles: str) -> MolGraph:
    """Parse the single-bond SMILES subset: C/N/O atoms, branches
    ``()``, ring closures 1–9, optional explicit ``-`` bonds. Raises
    SmilesError on anything else (aromatics, multiple bonds, charges,
    disconnected '.')."""
    mol = MolGraph()
    prev: int | None = None
    stack: list[int] = []
    rings: dict[str, int] = {}
    i = 0
    while i < len(smiles):
        ch = smiles[i]
        if ch in VALENCE:
            idx = mol.add_atom(ch)
            if prev is not None:
                mol.add_bond(prev, idx)
            prev = idx
        elif ch == "(":
            if prev is None:
                raise SmilesError("branch before first atom")
            stack.append(prev)
        elif ch == ")":
            if not stack:
                raise SmilesError("unbalanced ')'")
            prev = stack.pop()
        elif ch.isdigit():
            if prev is None:
                raise SmilesError("ring closure before first atom")
            if ch in rings:
                mol.add_bond(rings.pop(ch), prev)
            else:
                rings[ch] = prev
        elif ch == "-":
            pass  # explicit single bond
        else:
            raise SmilesError(f"unsupported SMILES token {ch!r} in {smiles!r}")
        i += 1
    if stack:
        raise SmilesError("unbalanced '('")
    if rings:
        raise SmilesError("unclosed ring bond")
    if mol.n_atoms == 0:
        raise SmilesError("empty SMILES")
    if not mol.is_connected():
        raise SmilesError("disconnected molecule")
    if not mol.valence_ok():
        raise SmilesError("valence violation")
    return mol


def to_smiles(mol: MolGraph) -> str:
    """Write a (representative, deterministic) SMILES string via DFS
    from node 0 with ring-closure digits. Not canonical — identity is
    the WL hash (``mol_key``); this string is for display/round-trip."""
    if mol.n_atoms == 0:
        return ""
    ring_bonds: list[tuple[int, int]] = []
    visited: set[int] = set()
    tree: dict[int, list[int]] = {i: [] for i in range(mol.n_atoms)}

    def dfs(u: int) -> None:
        visited.add(u)
        for v in mol.neighbors(u):
            if v not in visited:
                tree[u].append(v)
                dfs(v)
            elif v < u and u not in tree.get(v, []):
                pair = (min(u, v), max(u, v))
                if pair not in ring_bonds:
                    ring_bonds.append(pair)

    dfs(0)
    ring_digit: dict[tuple[int, int], str] = {
        pair: str(k + 1) for k, pair in enumerate(ring_bonds)
    }

    def emit(u: int) -> str:
        s = mol.elements[u]
        for pair, d in ring_digit.items():
            if u in pair:
                s += d
        kids = tree[u]
        for k, v in enumerate(kids):
            sub = emit(v)
            s += f"({sub})" if k < len(kids) - 1 else sub
        return s

    return emit(0)


def mol_key(mol: MolGraph, iterations: int = 3) -> str:
    """Deterministic isomorphism-invariant identity: WL graph hash over
    element labels (replaces RDKit canonical SMILES as the vertex-
    identity function, main.py:95; networkx ≥3.5 hash convention per
    SURVEY.md §7 M3)."""
    return nx.weisfeiler_lehman_graph_hash(
        mol.to_nx(), node_attr="symbol", iterations=iterations
    )


def validate_ged_input(smiles: str) -> tuple[bool, str]:
    """The GED-pipeline input gate (MoleculeInput, mcs.py:27–54):
    parsable, ≤10 atoms, carbon-only, single bonds only. Returns
    (valid, reason)."""
    try:
        mol = parse_smiles(smiles)
    except SmilesError as ex:
        return False, f"parse: {ex}"
    if mol.n_atoms > MAX_ATOMS_GED:
        return False, f"too many atoms ({mol.n_atoms} > {MAX_ATOMS_GED})"
    if any(el != "C" for el in mol.elements):
        return False, "non-carbon atom"
    return True, "ok"
