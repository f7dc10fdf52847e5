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


def exact_ged(mol1: MolGraph, mol2: MolGraph, max_atoms: int = 10) -> float | None:
    """Exact graph edit distance (F16, mcs.py:338–346) — exponential;
    guarded by a hard size cap matching the reference's effective
    10-atom validator bound (mcs.py:41; SURVEY.md §7 risk 4 upgrades
    the try/except-only guard to a predicate). Returns None when
    skipped, matching the reference's None-on-failure contract.

    Unit costs match the networkx defaults the reference relies on:
    node insert/delete 1, node relabel 1 (symbol mismatch), edge
    insert/delete 1 (edge attrs/orders ignored — nx default).
    networkx's own solver needs scipy (absent here), so this is a
    branch-and-bound over injective node mappings, exact for the
    guarded sizes. Pruning that makes 10 atoms tractable: small-side
    nodes visited in BFS order from the highest-degree node so edge
    costs accrue EARLY (incrementally per assignment, not at leaves),
    a greedy initial upper bound, and candidate ordering by
    label-match + degree proximity.
    """
    if mol1.n_atoms > max_atoms or mol2.n_atoms > max_atoms:
        return None
    small, big = (mol1, mol2) if mol1.n_atoms <= mol2.n_atoms else (mol2, mol1)
    n1, n2 = small.n_atoms, big.n_atoms
    m2 = big.n_bonds

    # BFS order over the small graph from the max-degree node: each
    # newly assigned node is adjacent to already-assigned ones, so the
    # incremental edge cost is informative from depth 1.
    order: list[int] = []
    seen: set[int] = set()
    for start in sorted(range(n1), key=lambda u: -small.degree(u)):
        if start in seen:
            continue
        queue = [start]
        seen.add(start)
        while queue:
            u = queue.pop(0)
            order.append(u)
            for nb in small.neighbors(u):
                if nb not in seen:
                    seen.add(nb)
                    queue.append(nb)

    small_adj = {u: set(small.neighbors(u)) for u in range(n1)}
    big_adj = {v: set(big.neighbors(v)) for v in range(n2)}

    def assign_cost(pos: int, v: int | None, mapping: list[int | None]) -> tuple[float, int]:
        """Incremental cost of assigning order[pos] → v, given earlier
        assignments; returns (edit cost, big edges newly covered)."""
        u = order[pos]
        cost = 0.0
        covered = 0
        if v is None:
            # node deletion + deletion of its edges to assigned nodes
            cost += 1
            for k in range(pos):
                if order[k] in small_adj[u]:
                    cost += 1
            return cost, 0
        if small.elements[u] != big.elements[v]:
            cost += 1
        for k in range(pos):
            w = mapping[k]
            has_small = order[k] in small_adj[u]
            has_big = w is not None and w in big_adj[v]
            if has_big:
                covered += 1
            if has_small != has_big:
                cost += 1
        return cost, covered

    def leaf_tail(used_count: int, covered: int) -> float:
        """Cost of completing a full small-side assignment: unmapped
        big nodes are insertions, plus every big edge not between
        images (covered edges were already priced)."""
        return (n2 - used_count) + (m2 - covered)

    # Greedy upper bound: map in BFS order to the cheapest available
    # candidate (or delete); any valid mapping's cost bounds best.
    g_mapping: list[int | None] = [None] * n1
    g_used: set[int] = set()
    g_cost = 0.0
    g_covered = 0
    for pos in range(n1):
        choices: list[tuple[float, int, int | None]] = [
            (assign_cost(pos, None, g_mapping)[0], 0, None)
        ]
        for v in range(n2):
            if v in g_used:
                continue
            c, cov = assign_cost(pos, v, g_mapping)
            choices.append((c, cov, v))
        c, cov, v = min(choices, key=lambda t: (t[0] - 0.25 * t[1], t[2] is None))
        g_mapping[pos] = v
        if v is not None:
            g_used.add(v)
        g_cost += c
        g_covered += cov
    best = g_cost + leaf_tail(len(g_used), g_covered)

    mapping: list[int | None] = [None] * n1

    def rec(pos: int, used: set[int], cost: float, covered: int) -> None:
        nonlocal best
        # admissible bound: every unmapped big node still costs ≥1 once
        # fewer small nodes remain than big nodes
        remaining_small = n1 - pos
        lb = cost + max(0, (n2 - len(used)) - remaining_small)
        if lb >= best:
            return
        if pos == n1:
            total = cost + leaf_tail(len(used), covered)
            if total < best:
                best = total
            return
        u = order[pos]
        cands: list[tuple[float, int, int | None]] = []
        for v in range(n2):
            if v in used:
                continue
            c, cov = assign_cost(pos, v, mapping)
            cands.append((c, cov, v))
        c_del, _ = assign_cost(pos, None, mapping)
        cands.append((c_del, 0, None))
        # try cheapest (covered-adjusted) first for fast tight bounds
        cands.sort(key=lambda t: (t[0] - 0.25 * t[1], t[2] is None))
        for c, cov, v in cands:
            mapping[pos] = v
            if v is not None:
                used.add(v)
            rec(pos + 1, used, cost + c, covered + cov)
            if v is not None:
                used.discard(v)
            mapping[pos] = None

    rec(0, set(), 0.0, 0)
    return float(best)
