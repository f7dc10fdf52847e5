"""Pure-Python molecular graph model — the chemistry substrate for the
edit-graph and subgraph/GED pipelines (SURVEY.md §7 M2/M3).

RDKit is not available in this environment, so this implements the
graph-theoretic fallback SURVEY.md §7 M2 plans: molecules as
element-labeled undirected graphs with bond orders, parsed from a
SMILES subset wide enough for the reference's own demo corpus
(/root/reference/main.py:377–391: the chain demos, aspirin, ibuprofen,
sildenafil/vardenafil/tadalafil) — single/double/triple/aromatic
bonds, branches, ring closures (incl. ``%nn``), aromatic lowercase
atoms, bracket atoms with charge/stereo/H-count, directional-bond
symbols (read as single), the organic-subset elements
B/C/N/O/P/S/F/Cl/Br/I bare, and ANY periodic-table element inside
brackets ([Na+], [Fe+2], [Au]; aromatic [se]/[as]) — non-organic
elements carry no valence bound, matching RDKit's default model.

Kekulé-written aromatic rings are normalized to aromatic form via
Hückel 4n+2 π-electron counting over all simple 5/6/7-cycles iterated
to fixpoint (perception below, r9), so ``C1=CC=CC=C1`` and
``c1ccccc1`` share one identity — as do the fused/non-benzenoid
forms RDKit's SanitizeMol unifies for the reference (main.py:94–95):
Kekulé caffeine's pyrimidinedione ring (exocyclic C=O carbons
contribute 0 electrons, pyrrole-type N its lone pair) equals its
lowercase form, tropylium's 7-ring qualifies (r9b), and fused
systems whose individual rings fail Hückel are re-counted as one
π system (azulene's 10 electrons — both Kekulé writings unify).
PRECISE perception boundary (pinned by tests/test_chem.py): rings
of size 5/6/7, their fused systems, AND pure monocycles of any size
(r11 — [10]/[14]/[18]annulene unify Kekulé with lowercase; [8]/[12]/
[16] fail 4n+2 and keep distinct identities, matching the electron
count); anti-aromatic counts (quinone 4, 1,4-dioxine 8, pentalene 8,
heptalene 12) and sp³-interrupted rings stay Kekulé; a ring holding
any non-aromatic-capable element ([Na+]) stays Kekulé regardless of
bond alternation. Fused systems keep the 5/6/7 ring-membership rule
(a fused 8+-ring perimeter is counted only through the system pass).
The parser is TOTAL: any string outside the subset raises
``SmilesError`` (never another exception — fuzz-verified over
arbitrary token soup and a grammar-valid generator), and anything
accepted satisfies connected + valence_ok + aromatic_ok and
round-trips through ``to_smiles`` with its WL identity intact.

Isotopes and tetrahedral stereo are IDENTITY-BEARING (r8, r7 verdict
item 5): ``[13C]`` ≠ ``[C]``, and ``C[C@H](N)O`` ≠ ``C[C@@H](N)O``
while every rewriting of the same configuration (``O[C@@H](N)C``)
hashes equal — the parsed ``@``/``@@`` flag is canonicalized against
stereo-blind WL colors via permutation parity (OpenSMILES §3.9.2:
swapping two neighbor entities flips the mark), and tags on centers
whose entities are WL-equivalent (achiral, e.g. cyclobutan-1-ol C1)
lapse, mirroring RDKit's AssignStereochemistry cleanup. Tags also
lapse when graph edits change a center's neighbor set (validity is
re-checked at every use). Double-bond cis/trans is identity-bearing
too: directional marks (``/``, ``\\``) classify each double bond E/Z
relative to WL-canonical substituents (``F/C=C/F`` ≠ ``F/C=C\\F`` ≠
``FC=CF``; all rewritings of one geometry equal), geometrically
impossible mark combinations raise, and non-stereogenic ends (equal
substituents) drop the class. Atom maps are validated and discarded.

Identity: molecules and subgraphs are keyed by a Weisfeiler–Lehman
hash over element labels and bond orders (networkx ≥3.5 convention,
deterministic across processes — replacing both RDKit canonical SMILES
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

#: Max total bond order per neutral element (organic subset). A formal
#: charge of ±q widens the bound by q (e.g. [N+] carries 4).
VALENCE = {
    "B": 3, "C": 4, "N": 3, "O": 2, "P": 5, "S": 6,
    "F": 1, "Cl": 1, "Br": 1, "I": 1, "H": 1,
}

#: Aromatic bond order (two aromatic ring bonds + one substituent = 4).
AROMATIC_ORDER = 1.5

#: Validation limits of the GED pipeline (mcs.py:41–52).
MAX_ATOMS_GED = 10

#: Bond symbol → order ('/' and '\\' are directional singles; ':' is an
#: explicit aromatic bond).
_BOND_SYMBOLS = {"-": 1.0, "=": 2.0, "#": 3.0, ":": AROMATIC_ORDER, "/": 1.0, "\\": 1.0}

#: Directional-single sign ('/' = +1, '\\' = −1) in the written a→b
#: direction — the raw material of double-bond E/Z classes.
_BOND_DIRS = {"/": 1, "\\": -1}

#: Elements parsable OUTSIDE brackets (SMILES organic subset), longest
#: match first so 'Cl'/'Br' win over 'C'/'B'.
_ORGANIC = ["Cl", "Br", "B", "C", "N", "O", "P", "S", "F", "I"]

#: Aromatic lowercase forms allowed outside brackets.
_AROMATIC_ORGANIC = {"b": "B", "c": "C", "n": "N", "o": "O", "p": "P", "s": "S"}

#: Aromatic lowercase forms allowed only INSIDE brackets (selenophene /
#: arsole rings — OpenSMILES §3.4 aromatic-symbols list).
_AROMATIC_BRACKET = {"se": "Se", "as": "As"}

#: The aromatic-CAPABLE element set (OpenSMILES §3.4): the organic
#: lowercase subset plus the bracket-only pair. Ring aromatization is
#: gated on membership — a bond-alternating ring containing e.g. [Na+]
#: must stay Kekulé (RDKit SanitizeMol parity, reference main.py:94:
#: sodium cannot be aromatic), and ``to_smiles`` lowercases only these
#: symbols, keeping the parse/serialize round-trip total.
AROMATIC_ELEMENTS = frozenset(_AROMATIC_ORGANIC.values()) | frozenset(
    _AROMATIC_BRACKET.values()
)

#: All periodic-table element symbols — bracket atoms accept ANY of
#: these (RDKit parity: [Na+], [Fe+2], [Au] are valid SMILES atoms).
#: Elements outside the organic subset carry no valence bound
#: (valence_ok skips them — the documented parity with RDKit's default
#: model, which leaves d-block valence effectively unchecked).
PERIODIC = frozenset(
    """H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar K Ca Sc Ti V Cr Mn Fe
    Co Ni Cu Zn Ga Ge As Se Br Kr Rb Sr Y Zr Nb Mo Tc Ru Rh Pd Ag Cd In Sn
    Sb Te I Xe Cs Ba La Ce Pr Nd Pm Sm Eu Gd Tb Dy Ho Er Tm Yb Lu Hf Ta W
    Re Os Ir Pt Au Hg Tl Pb Bi Po At Rn Fr Ra Ac Th Pa U Np Pu Am Cm Bk Cf
    Es Fm Md No Lr Rf Db Sg Bh Hs Mt Ds Rg Cn Nh Fl Mc Lv Ts Og""".split()
)


class SmilesError(ValueError):
    pass


def _parity_even(perm: list[int]) -> bool:
    """True iff the permutation (a list containing 0..k-1) is even
    (inversion count — k ≤ 4 here, so the quadratic count is free)."""
    inv = sum(
        1
        for a in range(len(perm))
        for b in range(a + 1, len(perm))
        if perm[a] > perm[b]
    )
    return inv % 2 == 0


@dataclass
class MolGraph:
    """Element-labeled undirected graph; nodes are 0..n-1. ``bonds``
    maps the ordered pair (min, max) to the bond order (1.0 / 2.0 /
    3.0 / 1.5 aromatic); iterating it yields the pairs, so set-era call
    sites (``for a, b in mol.bonds``) read unchanged."""

    elements: list[str] = field(default_factory=list)
    bonds: dict[tuple[int, int], float] = field(default_factory=dict)
    aromatic: set[int] = field(default_factory=set)
    charges: dict[int, int] = field(default_factory=dict)
    #: isotope mass number per atom (absent = natural abundance) —
    #: identity-bearing since r8 ([13C] ≠ [C]).
    isotopes: dict[int, int] = field(default_factory=dict)
    #: tetrahedral stereo flag per atom: 1 = ``@``, 2 = ``@@``.
    stereo: dict[int, int] = field(default_factory=dict)
    #: parse-order neighbor ENTITY list per stereo atom; -1 is the
    #: implicit bracket hydrogen (OpenSMILES §3.9.2 ordering:
    #: preceding atom, bracket H, ring-closure digits in text order,
    #: then following atoms). A stereo entry is USED only while valid:
    #: exactly 4 entities whose real members are exactly the atom's
    #: current neighbors — graph edits that break that invariant make
    #: the tag silently lapse (RDKit drops stereo on edited centers
    #: the same way), so copy()-and-mutate callers stay correct.
    stereo_nbrs: dict[int, list[int]] = field(default_factory=dict)
    #: directional single bonds ('/', '\\') for double-bond E/Z:
    #: (min,max) → ±1, the sign of '/' when the bond is read min→max
    #: (so '\\' written min→max is −1, and either symbol written
    #: max→min negates). E/Z classes are derived per double bond at
    #: identity time (canonical_ez) and lapse when marks or the double
    #: bond disappear under edits.
    bond_dirs: dict[tuple[int, int], int] = field(default_factory=dict)

    @property
    def n_atoms(self) -> int:
        return len(self.elements)

    @property
    def n_bonds(self) -> int:
        return len(self.bonds)

    def add_atom(self, element: str) -> int:
        self.elements.append(element)
        return len(self.elements) - 1

    def add_bond(self, i: int, j: int, order: float = 1.0) -> None:
        if i == j:
            raise SmilesError("self-bond")
        self.bonds[(min(i, j), max(i, j))] = order

    def neighbors(self, i: int) -> list[int]:
        return sorted(
            (b if a == i else a) for a, b in self.bonds if i in (a, b)
        )

    def degree(self, i: int) -> int:
        return sum(1 for a, b in self.bonds if i in (a, b))

    def valence_sum(self, i: int) -> float:
        """Total bond order at atom ``i``. For an AROMATIC atom each
        aromatic bond counts as one σ-bond: whether the atom donates a
        lone pair (pyrrole-type) or an electron (pyridine-type) to the
        π system needs Hückel electron counting we deliberately don't
        do, and the σ-count is the bound that holds for both. For a
        non-aromatic atom an (unusual) aromatic bond keeps its 1.5."""
        return sum(
            (1.0 if o == AROMATIC_ORDER and i in self.aromatic else o)
            for (a, b), o in self.bonds.items()
            if i in (a, b)
        )

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

    def aromatic_ok(self) -> bool:
        """Every aromatic atom must sit in an aromatic ring (≥2
        aromatic bonds). A dangling aromatic atom is unkekulizable —
        RDKit's SanitizeMol rejects it, and so does the reference's
        candidate gate through that sanitize call (main.py:94): edits
        that tear an aromatic ring open die here."""
        for i in self.aromatic:
            n_arom = sum(
                1 for (a, b), o in self.bonds.items()
                if i in (a, b) and o == AROMATIC_ORDER
            )
            if n_arom < 2:
                return False
        return True

    def valence_ok(self) -> bool:
        """Sanitize-analogue (main.py:94): total bond order within the
        element's valence bound, widened by |formal charge|. Elements
        outside the organic subset (no VALENCE entry — metals, noble
        gases) are UNCHECKED, matching RDKit's default model which
        leaves d-block valence effectively unbounded."""
        return all(
            self.valence_sum(i)
            <= VALENCE[el] + abs(self.charges.get(i, 0)) + 1e-9
            for i, el in enumerate(self.elements)
            if el in VALENCE
        )

    def _node_label(self, i: int) -> str:
        """WL node label: isotope-prefixed element symbol, lowercased
        when aromatic, charge-suffixed when charged — so pyridine-N ≠
        pyrrole-C, [O-] ≠ O, and [13C] ≠ C in identity space. Stereo
        is NOT in this label (it feeds the stereo-blind WL colors that
        canonical_stereo orients against); to_nx appends the canonical
        stereo class on top."""
        sym = self.elements[i].lower() if i in self.aromatic else self.elements[i]
        iso = self.isotopes.get(i, 0)
        if iso:
            sym = f"{iso}{sym}"
        q = self.charges.get(i, 0)
        return f"{sym}{q:+d}" if q else sym

    def _wl_colors(self) -> list[str]:
        """Stereo-blind Weisfeiler–Lehman color per atom, refined to a
        stable partition (capped at n iterations). Isomorphism-
        invariant: renumbering the molecule permutes but never changes
        the colors — the property canonical_stereo rides on."""
        import hashlib

        n = self.n_atoms
        colors = [self._node_label(i) for i in range(n)]
        adj: dict[int, list[tuple[int, float]]] = {i: [] for i in range(n)}
        for (a, b), o in self.bonds.items():
            adj[a].append((b, o))
            adj[b].append((a, o))
        n_classes = len(set(colors))
        for _ in range(n):
            nxt = []
            for i in range(n):
                sig = (colors[i], sorted((str(o), colors[j]) for j, o in adj[i]))
                nxt.append(hashlib.md5(repr(sig).encode()).hexdigest())
            colors = nxt
            k = len(set(colors))
            if k == n_classes:
                break
            n_classes = k
        return colors

    def _stereo_entities(self, i: int) -> list[int] | None:
        """The atom's stereo entity list if its tag is VALID (exactly
        4 entities; real members == current neighbor set), else None.
        Centralizing validity here makes copy()-and-mutate edits safe:
        a stale tag simply lapses instead of corrupting identity."""
        if i not in self.stereo:
            return None
        ents = self.stereo_nbrs.get(i, [])
        if len(ents) != 4:
            return None
        real = sorted(e for e in ents if e != -1)
        if len(set(ents)) != 4 or real != self.neighbors(i):
            return None
        return ents

    def canonical_stereo(self) -> dict[int, str]:
        """Writing-invariant tetrahedral class ('@' / '@@') per valid
        stereocenter: the parsed flag, flipped by the parity of the
        permutation that sorts the parse-order entities into
        WL-color order. Two SMILES writings of the same configuration
        differ by an entity permutation whose parity equals their flag
        difference (OpenSMILES §3.9.2: swapping two neighbors flips
        @/@@), so the composition is invariant. Centers whose entities
        share a WL color are dropped — the tag is not orientable
        against the skeleton (achiral or WL-symmetric; RDKit's
        AssignStereochemistry strips non-stereogenic tags likewise)."""
        if not self.stereo:
            return {}
        colors = None
        out: dict[int, str] = {}
        for i, flag in self.stereo.items():
            ents = self._stereo_entities(i)
            if ents is None:
                continue
            if colors is None:
                colors = self._wl_colors()
            keys = ["0H" if e == -1 else "1" + colors[e] for e in ents]
            if len(set(keys)) != 4:
                continue
            perm = sorted(range(4), key=lambda k: keys[k])
            canon = flag if _parity_even(perm) else 3 - flag
            out[i] = "@" if canon == 1 else "@@"
        return out

    def _bond_side(self, x: int, a: int) -> int | None:
        """Relative side (±1) of neighbor ``a`` w.r.t. atom ``x`` under
        the bond's directional mark, or None if unmarked. Sign
        convention: consistent under either writing direction (the
        normalized dict absorbs '/'-vs-'\\' flips)."""
        d = self.bond_dirs.get((min(a, x), max(a, x)))
        if d is None:
            return None
        return d if x == max(a, x) else -d

    def canonical_ez(self, colors: list[str]) -> dict[tuple[int, int], str]:
        """Writing-invariant cis/trans class ('Z'/'E') per double bond
        whose both ends have a directional mark and a color-unique
        reference substituent: each end's side is taken relative to
        its MINIMUM-WL-color substituent (marks on the other
        substituent negate — the two substituents of an sp² end are
        opposite by construction), and the product of the two sides is
        the class (+1 → Z, −1 → E: F/C=C/F is E). Ends whose two
        substituents share a WL color are not stereogenic — no class
        (RDKit's AssignStereochemistry drops those markings too)."""
        out: dict[tuple[int, int], str] = {}
        if not self.bond_dirs:
            return out
        for (x, y), o in self.bonds.items():
            if o != 2.0:
                continue
            sides = []
            for end, partner in ((x, y), (y, x)):
                cands = [n for n in self.neighbors(end) if n != partner]
                if not cands:
                    break
                marked = [c for c in cands if self._bond_side(end, c) is not None]
                if not marked:
                    break
                ref = min(cands, key=lambda c: colors[c])
                # The reference substituent's WL color must be UNIQUE
                # among ALL of the end's substituents — not just in the
                # two-substituent case (r8 ADVICE, mol.py:368): with 3+
                # valence-legal substituents, a color tie on the min
                # reference would make the marked[0]/ref pairing
                # writing-dependent, merging or splitting geometries
                # inconsistently. A tied reference lapses the class.
                if sum(1 for c in cands if colors[c] == colors[ref]) > 1:
                    break  # reference WL-ambiguous: not stereogenic
                m = marked[0]
                side = self._bond_side(end, m)
                sides.append(side if m == ref else -side)
            if len(sides) == 2:
                out[(x, y)] = "Z" if sides[0] * sides[1] == 1 else "E"
        return out

    def to_nx(self) -> nx.Graph:
        """Element-labeled networkx graph (mcs.py:178–194 shape), with
        bond order as a string edge attr for WL hashing; valid stereo
        centers carry their canonical class in the node label, and
        classed double bonds their E/Z in the edge label."""
        st = self.canonical_stereo()
        ez = (
            self.canonical_ez(self._wl_colors()) if self.bond_dirs else {}
        )
        g = nx.Graph()
        for i in range(self.n_atoms):
            g.add_node(i, symbol=self._node_label(i) + st.get(i, ""))
        for (a, b), o in self.bonds.items():
            g.add_edge(a, b, order=str(o) + ez.get((a, b), ""))
        return g

    def induced(self, nodes: tuple[int, ...]) -> "MolGraph":
        """Induced subgraph on ``nodes`` (relabeled 0..k-1), preserving
        bond orders, aromatic flags, charges, and isotopes. Stereo tags
        carry over only when every entity survives (a center that lost
        a neighbor is no longer tetrahedrally defined — the validity
        check would drop it anyway; pruning here keeps the dicts
        clean)."""
        order = sorted(nodes)
        remap = {n: k for k, n in enumerate(order)}
        sub = MolGraph(
            elements=[self.elements[n] for n in order],
            aromatic={remap[n] for n in order if n in self.aromatic},
            charges={remap[n]: q for n, q in self.charges.items() if n in remap},
            isotopes={remap[n]: m for n, m in self.isotopes.items() if n in remap},
        )
        for (a, b), o in self.bonds.items():
            if a in remap and b in remap:
                sub.add_bond(remap[a], remap[b], o)
        for n, flag in self.stereo.items():
            ents = self.stereo_nbrs.get(n, [])
            if n in remap and all(e == -1 or e in remap for e in ents):
                sub.stereo[remap[n]] = flag
                sub.stereo_nbrs[remap[n]] = [
                    -1 if e == -1 else remap[e] for e in ents
                ]
        for (a, b), d in self.bond_dirs.items():
            if a in remap and b in remap:
                ra, rb = remap[a], remap[b]
                # remapping preserves relative order (remap is
                # monotone over sorted nodes), so the sign carries
                sub.bond_dirs[(min(ra, rb), max(ra, rb))] = (
                    d if (ra < rb) == (a < b) else -d
                )
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
        return MolGraph(
            elements=list(self.elements),
            bonds=dict(self.bonds),
            aromatic=set(self.aromatic),
            charges=dict(self.charges),
            isotopes=dict(self.isotopes),
            stereo=dict(self.stereo),
            stereo_nbrs={k: list(v) for k, v in self.stereo_nbrs.items()},
            bond_dirs=dict(self.bond_dirs),
        )

    def adjacency_matrix(self) -> list[list[int]]:
        """Dense 0/1 occupancy matrix over node order (mcs.py:230–239
        shape) — stored as a real ArrayType(ArrayType(Int)), never
        JSON-in-TEXT (SURVEY.md §1.1)."""
        n = self.n_atoms
        m = [[0] * n for _ in range(n)]
        for a, b in self.bonds:
            m[a][b] = m[b][a] = 1
        return m


def _parse_bracket(
    body: str, smiles: str
) -> tuple[str, bool, int, int, int, int]:
    """Parse a bracket-atom body → (element, aromatic, charge,
    isotope, stereo, h_count). Isotope and tetrahedral ``@``/``@@``
    are IDENTITY-BEARING since r8 (stereo = 0/1/2); the H-count is
    kept because it is a stereo neighbor entity (OpenSMILES §3.9.2).
    Atom-map numbers are validated and discarded."""
    i = 0
    iso_start = i
    while i < len(body) and body[i].isdigit():  # isotope
        i += 1
    isotope = int(body[iso_start:i]) if i > iso_start else 0
    if i < len(body) and body[i].isupper():
        # longest element match over the FULL periodic table (bracket
        # atoms are not restricted to the organic subset — RDKit
        # parity; [Sc] is scandium, never S + aromatic c, per the
        # one-atom-per-bracket rule)
        elem = body[i]
        i += 1
        if i < len(body) and body[i].islower() and elem + body[i] in PERIODIC:
            elem += body[i]
            i += 1
        if elem not in PERIODIC:
            raise SmilesError(f"bad bracket atom [{body}] in {smiles!r}")
        aromatic = False
    elif body[i : i + 2] in _AROMATIC_BRACKET:  # [se]/[as] aromatics
        elem = _AROMATIC_BRACKET[body[i : i + 2]]
        aromatic = True
        i += 2
    elif i < len(body) and body[i] in _AROMATIC_ORGANIC:
        elem = _AROMATIC_ORGANIC[body[i]]
        aromatic = True
        i += 1
    else:
        raise SmilesError(f"bad bracket atom [{body}] in {smiles!r}")
    stereo = 0
    while i < len(body) and body[i] == "@":  # tetrahedral stereo
        stereo += 1
        i += 1
    if stereo > 2:
        raise SmilesError(f"bad stereo mark in [{body}] in {smiles!r}")
    h_count = 0
    if i < len(body) and body[i] == "H":  # explicit H count
        i += 1
        h_start = i
        while i < len(body) and body[i].isdigit():
            i += 1
        h_count = int(body[h_start:i]) if i > h_start else 1
    charge = 0
    while i < len(body) and body[i] in "+-":
        sign = 1 if body[i] == "+" else -1
        i += 1
        if i < len(body) and body[i].isdigit():
            j = i
            while j < len(body) and body[j].isdigit():
                j += 1
            charge += sign * int(body[i:j])
            i = j
        else:
            charge += sign
    if i < len(body) and body[i] == ":":  # atom map number
        i += 1
        while i < len(body) and body[i].isdigit():
            i += 1
    if i != len(body):
        raise SmilesError(f"bad bracket atom [{body}] in {smiles!r}")
    return elem, aromatic, charge, isotope, stereo, h_count


#: Hückel lone-pair donors: π-electron contribution of a ring atom
#: with NO π bond anywhere (both cycle edges single, no exocyclic
#: double). N/O/S/Se/P/As donate their lone pair (2 e⁻, pyrrole/furan/
#: thiophene type); boron's empty p orbital donates none (borole stays
#: antiaromatic). Neutral carbon without a π bond is sp³ — the ring
#: cannot be aromatic at all (handled as a reject, not a 0).
_PI_DONOR_ELECTRONS = {"N": 2, "O": 2, "S": 2, "Se": 2, "P": 2, "As": 2, "B": 0}

#: Exocyclic-double partners that let the ring atom stay in the π
#: system contributing 0 electrons (RDKit aromaticity model: a
#: carbonyl/imine/thione carbon is sp² but donates no π electron to
#: the ring — caffeine's pyrimidinedione, 2-pyridone). An exocyclic
#: double to any OTHER element (fulvene's =CH2) takes the atom's π
#: electron out of the ring entirely: the ring cannot be aromatic.
_EXO_ELECTRONEGATIVE = frozenset({"O", "N", "S"})


def _no_pi_contribution(
    mol: MolGraph,
    atom: int,
    in_edges: frozenset[tuple[int, int]],
) -> int | None:
    """π-electron contribution of ``atom`` when NONE of its bonds
    inside the candidate ring/system (``in_edges``) is a π bond:
    an exocyclic double to O/N/S keeps it in the system at 0 e⁻
    (carbonyl carbon), an exocyclic double to anything else rejects
    (fulvene), otherwise lone-pair donors give 2, boron 0, charged
    carbon 2/0, and neutral carbon rejects (sp³)."""
    exo_partners = [
        x
        for x in mol.neighbors(atom)
        if mol.bonds.get((min(atom, x), max(atom, x))) == 2.0
        and (min(atom, x), max(atom, x)) not in in_edges
    ]
    if exo_partners:
        if all(mol.elements[x] in _EXO_ELECTRONEGATIVE for x in exo_partners):
            return 0
        return None
    q = mol.charges.get(atom, 0)
    if mol.elements[atom] == "C":
        # cyclopentadienyl anion donates its pair; tropylium-type
        # cations contribute an empty orbital; neutral sp³ C rejects.
        if q < 0:
            return 2
        if q > 0:
            return 0
        return None
    base = _PI_DONOR_ELECTRONS.get(mol.elements[atom])
    if base is None:
        return None
    # A positively charged donor has no lone pair left to give.
    return 0 if q > 0 else base


def _pi_contribution(
    mol: MolGraph,
    atom: int,
    prev_o: float,
    next_o: float,
    cycle_edges: frozenset[tuple[int, int]],
) -> int | None:
    """π-electron contribution of ``atom`` to a candidate ring whose
    two cycle edges at the atom have orders ``prev_o``/``next_o``, or
    None when the atom makes the ring non-aromatizable (sp³ carbon,
    exocyclic double to a non-electronegative atom)."""
    # An in-ring π edge (double, or aromatic from an already-perceived
    # fused ring) contributes exactly one electron.
    if 2.0 in (prev_o, next_o) or AROMATIC_ORDER in (prev_o, next_o):
        return 1
    # Both cycle edges single: no in-ring π at this atom.
    return _no_pi_contribution(mol, atom, cycle_edges)


def _perceive_aromatic_rings(mol: MolGraph) -> None:
    """Normalize Kekulé-written aromatic rings to aromatic form via
    Hückel 4n+2 π-electron counting, so ``C1=CC=CC=C1`` and
    ``c1ccccc1`` — and since r9 the fused/non-benzenoid forms RDKit's
    SanitizeMol unifies for the reference (main.py:94), e.g. Kekulé
    caffeine's pyrimidinedione ring — share one WL identity.

    Rule, iterated to fixpoint for fused systems (naphthalene, pyrene,
    Kekulé indole/purine): a 5/6/7-cycle of aromatic-CAPABLE elements
    (AROMATIC_ELEMENTS gate — a ring holding [Na+] stays Kekulé no
    matter how its bonds alternate) qualifies when every cycle edge is
    single/double/aromatic, no atom joins two double cycle edges
    (cumulated), every atom yields a π contribution
    (:func:`_pi_contribution`: in-ring π edge → 1, exocyclic double to
    O/N/S → 0, lone-pair donor → 2, boron → 0, charged carbon → 2/0;
    sp³ carbon or an exocyclic double to carbon reject the ring), and
    the ring total satisfies 4n+2 (quinone's 4 and 1,4-dioxine's 8
    stay Kekulé). 7-rings joined r9b: tropylium's 6 electrons qualify,
    azepine/oxepine's 8 do not, and tropone aromatizes — the same
    exocyclic-C=O-contributes-0 rule that unifies caffeine, applied
    without a ring-size carve-out.

    Second pass for fused systems whose INDIVIDUAL rings fail Hückel
    but whose union passes (RDKit counts ring systems, not just rings
    — azulene: the 5-ring and 7-ring alone never total 4n+2 in any
    Kekulé writing, the 10-atom system always totals 10): per-ATOM
    contributions over the union of the member rings' edges (π bond
    anywhere inside the system → 1, else the same no-π table), total
    ≡ 2 (mod 4) aromatizes every system edge — so both azulene
    Kekulé forms (transannular bond single or double) unify with the
    lowercase form. Pentalene (8), heptalene (12) and s-indacene (12)
    systems stay Kekulé; acenaphthylene's 5-ring keeps its localized
    double (ring 5 e⁻, system 12 e⁻ — both fail, matching RDKit)."""
    g = nx.Graph(list(mol.bonds))
    # All simple 5/6/7-cycles, not a cycle basis: nx.cycle_basis
    # returns a FUNDAMENTAL basis, which for peri-fused polycyclics
    # (pyrene: [6,6,6,12]) omits some hexagonal faces entirely and
    # would silently split the WL identity of Kekulé vs lowercase
    # forms. length_bound enumeration is exact and cheap on molecular
    # graphs (≤ tens of atoms; ring count is bounded by the
    # cyclomatic number).
    try:
        cycles = nx.simple_cycles(g, length_bound=7)
        rings = [c for c in cycles if len(c) in (5, 6, 7)]
    except nx.NetworkXError:
        return
    # Large PURE monocycles ([10]/[14]/[18]annulene…, r10 verdict item
    # 6): Hückel 4n+2 has no upper size bound for an isolated ring, so
    # a Kekulé-written annulene with 4n+2 π electrons must unify with
    # its lowercase form exactly like benzene does (RDKit's default
    # electron-counting model agrees; [8]/[12]/[16] fail 4n+2 and stay
    # Kekulé). Detection is LINEAR, no cycle enumeration: a biconnected
    # component with |edges| == |atoms| IS a simple cycle, and being a
    # maximal biconnected component it shares no edge with any other
    # ring — so these never perturb the fused-system (5/6/7-membered)
    # pass below.
    # Cheap necessary-condition gate before paying for Tarjan: an
    # 8+-monocycle can only live in the 2-core, so strip degree-<=1
    # vertices with plain dict ops first (O(V+E), tiny constants) and
    # run the biconnected pass only when >=8 core vertices survive.
    # Typical drug-like molecules (benzene ring + substituents) strip
    # to a <8-vertex core and skip — ungated, the pass measured 1.73x
    # parse overhead on the edit-expansion hot path.
    ncore = 0
    if len(g) >= 8 and g.number_of_edges() >= 8:
        adj = g._adj
        deg = {v: len(n) for v, n in adj.items()}
        stack = [v for v, d in deg.items() if d <= 1]
        ncore = len(deg)
        while stack:
            v = stack.pop()
            if deg[v] < 0 or deg[v] > 1:
                continue  # already stripped / re-pushed stale entry
            deg[v] = -1
            ncore -= 1
            for u in adj[v]:
                if deg[u] > 0:
                    deg[u] -= 1
                    if deg[u] == 1:
                        stack.append(u)
    if ncore >= 8:
        core = [v for v, d in deg.items() if d > 0]
        for comp in nx.biconnected_components(g.subgraph(core)):
            if len(comp) < 8 or g.subgraph(comp).number_of_edges() != len(comp):
                continue
            sub = g.subgraph(comp)
            cyc = [next(iter(comp))]
            prev = None
            while len(cyc) < len(comp):
                nxt = next(x for x in sub.neighbors(cyc[-1]) if x != prev)
                prev = cyc[-1]
                cyc.append(nxt)
            rings.append(cyc)
    ring_edges: list[frozenset[tuple[int, int]]] = [
        frozenset(
            (min(c[k], c[(k + 1) % len(c)]), max(c[k], c[(k + 1) % len(c)]))
            for k in range(len(c))
        )
        for c in rings
    ]
    outer = True
    while outer:
        outer = False
        changed = True
        while changed:
            changed = False
            for cyc in rings:
                n = len(cyc)
                # Aromaticity is an ELEMENT property before it is a bond
                # property: a ring holding any non-aromatic-capable atom
                # ([Na+], [Fe], …) keeps its Kekulé form, no matter how its
                # bonds alternate (fuzz counterexample
                # ``CCCC1=[Na+]2N(C1(=C3))23`` — aromatizing it made
                # to_smiles emit ``[na+]``, which parse_smiles rejects).
                if any(mol.elements[a] not in AROMATIC_ELEMENTS for a in cyc):
                    continue
                edges = [
                    (min(cyc[k], cyc[(k + 1) % n]), max(cyc[k], cyc[(k + 1) % n]))
                    for k in range(n)
                ]
                orders = [mol.bonds.get(e) for e in edges]
                if any(o not in (1.0, 2.0, AROMATIC_ORDER) for o in orders):
                    continue
                if all(o == AROMATIC_ORDER for o in orders):
                    continue  # already aromatic
                # Cumulated doubles (an atom joining two double cycle
                # edges) cannot be part of a planar π system.
                if any(orders[k - 1] == 2.0 and orders[k] == 2.0 for k in range(n)):
                    continue
                edge_set = frozenset(edges)
                pi = 0
                ok = True
                for k in range(n):
                    c = _pi_contribution(mol, cyc[k], orders[k - 1], orders[k], edge_set)
                    if c is None:
                        ok = False
                        break
                    pi += c
                if not ok or pi % 4 != 2:  # Hückel 4n+2
                    continue
                for e in edges:
                    mol.bonds[e] = AROMATIC_ORDER
                mol.aromatic.update(cyc)
                changed = True
                outer = True
        # Phase 2: fused ring SYSTEMS (union-find over rings sharing an
        # edge). Only systems of ≥2 rings with a non-aromatic edge left
        # are candidates — single rings were fully decided above.
        parent = list(range(len(rings)))

        def _find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(len(rings)):
            for j in range(i + 1, len(rings)):
                if ring_edges[i] & ring_edges[j]:
                    parent[_find(i)] = _find(j)
        systems: dict[int, list[int]] = {}
        for i in range(len(rings)):
            systems.setdefault(_find(i), []).append(i)
        for members in systems.values():
            if len(members) < 2:
                continue
            sys_edges = frozenset().union(*(ring_edges[i] for i in members))
            sys_atoms = sorted({a for e in sys_edges for a in e})
            orders = {e: mol.bonds.get(e) for e in sys_edges}
            if all(o == AROMATIC_ORDER for o in orders.values()):
                continue  # already aromatic
            if any(mol.elements[a] not in AROMATIC_ELEMENTS for a in sys_atoms):
                continue
            if any(o not in (1.0, 2.0, AROMATIC_ORDER) for o in orders.values()):
                continue
            pi = 0
            ok = True
            for a in sys_atoms:
                incident = [e for e in sys_edges if a in e]
                doubles = sum(1 for e in incident if orders[e] == 2.0)
                if doubles > 1:  # cumulated inside the system
                    ok = False
                    break
                if doubles or any(orders[e] == AROMATIC_ORDER for e in incident):
                    pi += 1
                    continue
                c = _no_pi_contribution(mol, a, sys_edges)
                if c is None:
                    ok = False
                    break
                pi += c
            if not ok or pi % 4 != 2:
                continue
            for e in sys_edges:
                mol.bonds[e] = AROMATIC_ORDER
            mol.aromatic.update(sys_atoms)
            outer = True


def from_adjacency(elements: list[str], adjacency: list[list[int]]) -> MolGraph:
    """Reconstruct a molecule from the STORED catalog representation
    (element labels + 0/1 adjacency matrix) — the F15 reconstruction
    step (mcs.py:376–410 ``networkx_to_rdkit_subgraph`` rebuilds an
    RDKit mol from persisted subgraph structure; here the persisted
    form is the adjacency ArrayType column and the round-trip target
    is MolGraph → display SMILES). Occupancy is 0/1, so bonds come
    back single — exactly the GED-pipeline domain the catalog stores."""
    mol = MolGraph(elements=list(elements))
    n = len(elements)
    for i in range(n):
        for j in range(i + 1, n):
            if adjacency[i][j]:
                mol.add_bond(i, j)
    return mol


def parse_smiles(smiles: str) -> MolGraph:
    """Parse the SMILES subset described in the module docstring.
    Raises SmilesError on anything outside it (disconnected '.'
    molecules included, matching the reference's candidate filter
    main.py:101)."""
    mol = MolGraph()
    prev: int | None = None
    stack: list[int] = []
    rings: dict[str, tuple[int, float | None, int | None, str]] = {}
    pending: float | None = None  # explicit bond symbol awaiting use
    pending_dir: int | None = None  # '/'=+1, '\\'=-1 awaiting use
    i = 0
    n = len(smiles)
    # Parse-order neighbor entities per atom (OpenSMILES §3.9.2:
    # preceding atom, bracket H (-1), ring digits in text order as
    # placeholders resolved at close, then following atoms) — the
    # orientation frame tetrahedral stereo is defined against.
    nbr: dict[int, list] = {}
    ring_seq = 0

    def attach(idx: int, aromatic: bool) -> None:
        nonlocal prev, pending, pending_dir
        nbr[idx] = []
        if prev is not None:
            if pending is not None:
                order = pending
            elif aromatic and prev in mol.aromatic:
                order = AROMATIC_ORDER
            else:
                order = 1.0
            mol.add_bond(prev, idx, order)
            if pending_dir is not None:
                # normalize the written prev→idx direction to min→max
                mol.bond_dirs[(min(prev, idx), max(prev, idx))] = (
                    pending_dir if prev < idx else -pending_dir
                )
            nbr[prev].append(idx)
            nbr[idx].append(prev)
        pending = None
        pending_dir = None
        prev = idx

    while i < n:
        ch = smiles[i]
        if ch == "[":
            end = smiles.find("]", i)
            if end < 0:
                raise SmilesError(f"unclosed '[' in {smiles!r}")
            elem, aromatic, charge, isotope, stereo, h_count = _parse_bracket(
                smiles[i + 1 : end], smiles
            )
            idx = mol.add_atom(elem)
            if aromatic:
                mol.aromatic.add(idx)
            if charge:
                mol.charges[idx] = charge
            if isotope:
                mol.isotopes[idx] = isotope
            attach(idx, aromatic)
            if stereo:
                mol.stereo[idx] = stereo
            nbr[idx].extend([-1] * h_count)
            i = end + 1
            continue
        two = smiles[i : i + 2]
        if two in ("Cl", "Br"):
            attach(mol.add_atom(two), False)
            i += 2
            continue
        if ch in VALENCE:  # single-letter uppercase organic atom
            attach(mol.add_atom(ch), False)
        elif ch in _AROMATIC_ORGANIC:
            idx = mol.add_atom(_AROMATIC_ORGANIC[ch])
            mol.aromatic.add(idx)
            attach(idx, True)
        elif ch in _BOND_SYMBOLS:
            pending = _BOND_SYMBOLS[ch]
            pending_dir = _BOND_DIRS.get(ch)
        elif ch == "(":
            if prev is None:
                raise SmilesError("branch before first atom")
            stack.append(prev)
        elif ch == ")":
            if not stack:
                raise SmilesError("unbalanced ')'")
            prev = stack.pop()
        elif ch.isdigit() or ch == "%":
            if ch == "%":
                if i + 2 >= n or not smiles[i + 1 : i + 3].isdigit():
                    raise SmilesError(f"bad %nn ring closure in {smiles!r}")
                label = smiles[i + 1 : i + 3]
                i += 2
            else:
                label = ch
            if prev is None:
                raise SmilesError("ring closure before first atom")
            if label in rings:
                other, other_pending, other_dir, token = rings.pop(label)
                order = pending if pending is not None else other_pending
                if order is None:
                    order = (
                        AROMATIC_ORDER
                        if prev in mol.aromatic and other in mol.aromatic
                        else 1.0
                    )
                mol.add_bond(other, prev, order)
                # directional marks on ring-closure bonds: the OPEN
                # occurrence reads open→close, the CLOSE occurrence
                # close→open; both normalize to min→max and must agree
                key = (min(other, prev), max(other, prev))
                d_open = (
                    None
                    if other_dir is None
                    else (other_dir if other < prev else -other_dir)
                )
                d_close = (
                    None
                    if pending_dir is None
                    else (pending_dir if prev < other else -pending_dir)
                )
                if d_open is not None and d_close is not None and d_open != d_close:
                    raise SmilesError(
                        f"conflicting ring-bond directions in {smiles!r}"
                    )
                d = d_open if d_open is not None else d_close
                if d is not None:
                    mol.bond_dirs[key] = d
                # resolve the opener's placeholder; the closer's slot
                # is at this digit's text position
                nbr[other] = [prev if e == token else e for e in nbr[other]]
                nbr[prev].append(other)
                pending = None
                pending_dir = None
            else:
                token = f"\x00ring{ring_seq}"
                ring_seq += 1
                rings[label] = (prev, pending, pending_dir, token)
                nbr[prev].append(token)
                pending = None
                pending_dir = None
        else:
            raise SmilesError(f"unsupported SMILES token {ch!r} in {smiles!r}")
        i += 1
    if stack:
        raise SmilesError("unbalanced '('")
    if rings:
        raise SmilesError("unclosed ring bond")
    if pending is not None:
        raise SmilesError("dangling bond symbol")
    if mol.n_atoms == 0:
        raise SmilesError("empty SMILES")
    if not mol.is_connected():
        raise SmilesError("disconnected molecule")
    # An aromatic-order bond that is a BRIDGE (in no ring) between two
    # aromatic atoms is really a single bond — biphenyl written
    # 'c1ccccc1c1ccccc1' must equal the explicit '-' form (RDKit
    # semantics: implicit aromatic bonding applies within rings only).
    arom_bridges = [
        e for e in nx.bridges(nx.Graph(list(mol.bonds)))
        if mol.bonds.get((min(e), max(e))) == AROMATIC_ORDER
    ]
    for e in arom_bridges:
        a, b = min(e), max(e)
        if a in mol.aromatic and b in mol.aromatic:
            mol.bonds[(a, b)] = 1.0
    _perceive_aromatic_rings(mol)
    if not mol.aromatic_ok():
        raise SmilesError("aromatic atom outside an aromatic ring")
    # Any surviving aromatic-order bond with a non-aromatic endpoint
    # (explicit 'C:C') is unkekulizable — RDKit rejects it too.
    for (a, b), o in mol.bonds.items():
        if o == AROMATIC_ORDER and (a not in mol.aromatic or b not in mol.aromatic):
            raise SmilesError("aromatic bond between non-aromatic atoms")
    if not mol.valence_ok():
        raise SmilesError("valence violation")
    # Two marked substituents on the same sp² end claiming the same
    # side are geometrically impossible — RDKit rejects the SMILES.
    for (x, y), o in mol.bonds.items():
        if o != 2.0:
            continue
        for end, partner in ((x, y), (y, x)):
            sides = [
                s
                for c in mol.neighbors(end)
                if c != partner
                and (s := mol._bond_side(end, c)) is not None
            ]
            if len(sides) == 2 and sides[0] == sides[1]:
                raise SmilesError(
                    f"conflicting bond directions at atom {end} in {smiles!r}"
                )
    # Record parse-order entities for stereo atoms (all ring
    # placeholders are resolved by now — unclosed rings raised above).
    for idx in mol.stereo:
        mol.stereo_nbrs[idx] = list(nbr.get(idx, []))
    return mol


def to_smiles(mol: MolGraph) -> str:
    """Write a (representative, deterministic) SMILES string via DFS
    from node 0 with ring-closure digits; aromatic atoms lowercase,
    double/triple bonds as ``=``/``#``. Not canonical — identity is
    the WL hash (``mol_key``); this string is for display/round-trip."""
    if mol.n_atoms == 0:
        return ""
    ring_bonds: list[tuple[int, int]] = []
    visited: set[int] = set()
    tree: dict[int, list[int]] = {i: [] for i in range(mol.n_atoms)}
    parent: dict[int, int] = {}

    def dfs(u: int) -> None:
        visited.add(u)
        for v in mol.neighbors(u):
            if v not in visited:
                tree[u].append(v)
                parent[v] = u
                dfs(v)
            elif v < u and u not in tree.get(v, []):
                pair = (min(u, v), max(u, v))
                if pair not in ring_bonds:
                    ring_bonds.append(pair)

    dfs(0)
    # Labels ≥10 must use the %nn form: bare '12' re-parses as two
    # separate single-digit closures and silently rebuilds a different
    # molecule (caught by differential fuzzing on dense polycyclics).
    ring_digit: dict[tuple[int, int], str] = {
        pair: (str(k + 1) if k < 9 else f"%{k + 1:02d}")
        for k, pair in enumerate(ring_bonds)
    }

    def bond_sym(a: int, b: int) -> str:
        """Symbol for the bond emitted in the written a→b direction
        (a = the atom whose text the symbol follows)."""
        o = mol.bonds[(min(a, b), max(a, b))]
        if o == 2.0:
            return "="
        if o == 3.0:
            return "#"
        d = mol.bond_dirs.get((min(a, b), max(a, b)))
        if o == 1.0 and d is not None:
            # re-orient the stored min→max sign to the emitted a→b
            return "/" if (d if a < b else -d) == 1 else "\\"
        if o == 1.0 and a in mol.aromatic and b in mol.aromatic:
            return "-"  # biphenyl-type single between aromatic atoms
        return ""  # single and aromatic are implicit

    def _written_entities(u: int) -> list[int]:
        """The entity order a REPARSE of this output will record for
        atom u: parent, bracket H, ring partners in digit order, then
        children (mirrors parse_smiles's nbr tracking exactly)."""
        w: list[int] = []
        if u in parent:
            w.append(parent[u])
        if -1 in mol.stereo_nbrs.get(u, []):
            w.append(-1)
        for pair in ring_digit:
            if u in pair:
                w.append(pair[0] if pair[1] == u else pair[1])
        w.extend(tree[u])
        return w

    def atom_sym(u: int) -> str:
        # Lowercase ONLY symbols the parser accepts lowercase
        # (AROMATIC_ELEMENTS) — serializer totality: every emitted
        # token must re-parse. Perception guarantees mol.aromatic ⊆
        # capable atoms, so the guard is belt-and-braces.
        arom = u in mol.aromatic and mol.elements[u] in AROMATIC_ELEMENTS
        sym = mol.elements[u].lower() if arom else mol.elements[u]
        q = mol.charges.get(u, 0)
        qs = (
            (("+" if q > 0 else "-") * abs(q) if abs(q) <= 2 else f"{q:+d}")
            if q
            else ""
        )
        iso = mol.isotopes.get(u, 0)
        isos = str(iso) if iso else ""
        ents = mol._stereo_entities(u)
        if ents is not None:
            # emit the mark whose orientation under the OUTPUT's
            # written entity order equals the stored one: flip @/@@
            # when the permutation between the two orders is odd
            written = _written_entities(u)
            if sorted(written) == sorted(ents):
                perm = [ents.index(w) for w in written]
                flag = (
                    mol.stereo[u] if _parity_even(perm) else 3 - mol.stereo[u]
                )
                marks = "@" if flag == 1 else "@@"
                h = "H" if -1 in ents else ""
                return f"[{isos}{sym}{marks}{h}{qs}]"
        if q or iso:
            return f"[{isos}{sym}{qs}]"
        # elements with no bare form ([Na], [Au], aromatic [se]) must
        # re-enter through brackets or the round-trip re-parses wrong
        bare_ok = sym in _AROMATIC_ORGANIC if arom else mol.elements[u] in _ORGANIC
        return sym if bare_ok else f"[{sym}]"

    def emit(u: int) -> str:
        s = atom_sym(u)
        for pair, d in ring_digit.items():
            if u in pair:
                other = pair[0] if pair[1] == u else pair[1]
                # bond symbol on the second (closing) endpoint only
                s += (bond_sym(u, other) if u == max(pair) else "") + d
        kids = tree[u]
        for k, v in enumerate(kids):
            sub = bond_sym(u, v) + emit(v)
            s += f"({sub})" if k < len(kids) - 1 else sub
        return s

    return emit(0)


def mol_key(mol: MolGraph, iterations: int = 3) -> str:
    """Deterministic isomorphism-invariant identity: WL graph hash over
    element labels AND bond orders (replaces RDKit canonical SMILES as
    the vertex-identity function, main.py:95; networkx ≥3.5 hash
    convention per SURVEY.md §7 M3)."""
    return nx.weisfeiler_lehman_graph_hash(
        mol.to_nx(), node_attr="symbol", edge_attr="order", iterations=iterations
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
    if any(o != 1.0 for o in mol.bonds.values()):
        return False, "non-single bond"
    return True, "ok"
