"""Connected-subgraph enumeration + overlap GED/Tanimoto (SURVEY.md
§2.9 G6/G7, §2.4 A5/A6) — the reference's mcs pipeline
(/root/reference/src/mcs.py:196–346) over the MolGraph model.

Safe-by-construction: enumeration is exponential (O(2^n) node
subsets), bounded by the GED input gate's 10-atom cap
(mcs.py:41–42; SURVEY.md §7 risk 4 — the cap is a semantic, enforced
upstream by ``validate_ged_input``).
"""

from __future__ import annotations

from itertools import combinations

import networkx as nx

from molgraphdb_spark.chem.mol import MolGraph, mol_key


def enumerate_subgraphs(
    mol: MolGraph, min_size: int = 2, max_size: int | None = None
) -> dict[str, MolGraph]:
    """All connected induced subgraphs with ``min_size`` ≤ nodes ≤
    ``max_size``, deduplicated by WL hash — the semantics of
    generate_all_subgraphs (mcs.py:196–220: node-subset combinations →
    connectivity predicate P7 → WL dedup P8). Returns hash → one
    representative subgraph."""
    if max_size is None:
        max_size = mol.n_atoms
    seen: dict[str, MolGraph] = {}
    nodes = range(mol.n_atoms)
    for size in range(min_size, max_size + 1):
        for subset in combinations(nodes, size):
            sub = mol.induced(subset)
            if sub.n_bonds < 1 or not sub.is_connected():
                continue
            h = mol_key(sub)
            if h not in seen:
                seen[h] = sub
    return seen


def subgraph_hashes(mol: MolGraph, min_size: int = 2) -> set[str]:
    return set(enumerate_subgraphs(mol, min_size=min_size))


def overlap_metrics(hashes1: set[str], hashes2: set[str], max_nodes: int) -> dict:
    """Tanimoto + approximate GED from subgraph-set overlap — the exact
    formulas of calculate_ged_approximation (mcs.py:306–331):
    tanimoto = |∩|/|∪| (0 on empty union, mcs.py:314); approx GED =
    max_nodes·(1 − |∩|/min(|h1|,|h2|)), falling back to max_nodes when
    the denominator is 0 (mcs.py:316–327); both rounded to 3 dp
    (mcs.py:330–331)."""
    inter = hashes1 & hashes2
    union = hashes1 | hashes2
    tanimoto = len(inter) / len(union) if union else 0.0
    denom = min(len(hashes1), len(hashes2))
    if denom > 0:
        ged = max_nodes * (1 - len(inter) / denom)
    else:
        ged = float(max_nodes)
    return {
        "n_shared": len(inter),
        "n_union": len(union),
        "tanimoto": round(tanimoto, 3),
        "ged_approx": round(ged, 3),
    }


def exact_ged(mol1: MolGraph, mol2: MolGraph, max_atoms: int = 7) -> float | None:
    """Exact graph edit distance (F16, mcs.py:338–346) — exponential;
    guarded by a hard size cap (SURVEY.md §7 risk 4 upgrades the
    reference's try/except-only guard to a predicate). Returns None
    when skipped, matching the reference's None-on-failure contract.

    Unit costs match the networkx defaults the reference relies on:
    node insert/delete 1, node relabel 1 (symbol mismatch), edge
    insert/delete 1. networkx's own solver needs scipy (absent here),
    so this is a direct branch-and-bound over injective node mappings
    — exact for the guarded sizes.
    """
    if mol1.n_atoms > max_atoms or mol2.n_atoms > max_atoms:
        return None
    small, big = (mol1, mol2) if mol1.n_atoms <= mol2.n_atoms else (mol2, mol1)
    n1, n2 = small.n_atoms, big.n_atoms
    big_nodes = list(range(n2))
    best = float("inf")

    def edge_cost(mapping: dict[int, int | None]) -> float:
        mapped = {u: v for u, v in mapping.items() if v is not None}
        cost = 0
        # edges of small: deleted if either endpoint unmapped or image edge absent
        for a, b in small.bonds:
            va, vb = mapping.get(a), mapping.get(b)
            if va is None or vb is None or (min(va, vb), max(va, vb)) not in big.bonds:
                cost += 1
        # edges of big between mapped images not covered above are insertions;
        # edges touching un-imaged big nodes are insertions too
        images = set(mapped.values())
        inv = {v: u for u, v in mapped.items()}
        for a, b in big.bonds:
            if a in images and b in images:
                if (min(inv[a], inv[b]), max(inv[a], inv[b])) not in small.bonds:
                    cost += 1
            else:
                cost += 1
        return cost

    def rec(i: int, mapping: dict[int, int | None], used: set[int], node_cost: float) -> None:
        nonlocal best
        if node_cost >= best:
            return
        if i == n1:
            # unmapped big nodes are insertions
            total_nodes = node_cost + (n2 - len(used))
            if total_nodes >= best:
                return
            total = total_nodes + edge_cost(mapping)
            best = min(best, total)
            return
        # delete small node i
        mapping[i] = None
        rec(i + 1, mapping, used, node_cost + 1)
        del mapping[i]
        # map small node i to an unused big node
        for v in big_nodes:
            if v in used:
                continue
            sub = 0 if small.elements[i] == big.elements[v] else 1
            mapping[i] = v
            used.add(v)
            rec(i + 1, mapping, used, node_cost + sub)
            used.discard(v)
            del mapping[i]

    rec(0, {}, set(), 0.0)
    return float(best)
