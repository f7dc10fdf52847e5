"""Third-implementation goldens for the percentile / EWMA / Adamic–Adar
families (r8 verdict item 8, extending the tests/test_retrieval.py
pattern): every DuckDB oracle shares its query's formula by design, so
cross-engine parity cannot catch a both-sides-wrong formula bug. Each
test here recomputes the result with plain Python (sorted lists, dict
loops, math) — and for Adamic–Adar additionally against networkx's own
``adamic_adar_index`` — on corpora small enough to eyeball.
"""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

MINI_EVENT_TYPES = ["click", "view", "error"]


@pytest.fixture(scope="module")
def mini_events_dir(spark, tmp_path_factory):
    """~300 events over 3 types with deterministic pseudo-random values
    (ties included: values quantized to 1 decimal so nearest-rank
    tiebreaks actually fire)."""
    path = str(tmp_path_factory.mktemp("thirdimpl_events"))
    rng = random.Random(42)
    rows = []
    for eid in range(300):
        rows.append(
            (
                eid,
                # out-of-order timestamps: ordering must come from sort
                ((eid * 48271) % 300) * 1_000_000 + 1_600_000_000_000_000,
                eid % 37,
                MINI_EVENT_TYPES[eid % 3],
                round(rng.uniform(0, 50), 1),
                None,
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    return path, rows


def test_latency_percentiles_match_python_reference(spark, mini_events_dir):
    # nearest-rank ceil(p·n) per type, recomputed with a sorted list.
    from molgraphdb_spark.queries.events import (
        LATENCY_PCTS_BP,
        events_latency_percentiles,
    )

    path, rows = mini_events_dir
    got = [
        (r.event_type, r.pct_bp, r.rank_i, r.n_events, r.value_u)
        for r in events_latency_percentiles(spark, path).collect()
    ]
    expect = []
    for et in sorted(MINI_EVENT_TYPES):
        vals = sorted(
            (math.floor(v * 1_000_000 + 0.5), eid)
            for (eid, _ts, _u, t, v, _p) in rows
            if t == et and v is not None
        )
        n = len(vals)
        for p in LATENCY_PCTS_BP:
            rank = (p * n + 9999) // 10000
            expect.append((et, p, rank, n, vals[rank - 1][0]))
    assert got == expect


def test_spend_percentiles_match_python_reference(spark, tmp_path_factory):
    # global nearest-rank percentiles of per-customer spend.
    from molgraphdb_spark.queries.relational import (
        SPEND_PCTS_BP,
        customer_spend_exact_percentiles,
    )

    path = str(tmp_path_factory.mktemp("thirdimpl_orders"))
    rng = random.Random(7)
    orders = [
        (oid, oid % 83, round(rng.uniform(100, 5000), 2))
        for oid in range(400)
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")

    got = [
        (r.pct_bp, r.rank_i, r.spend_c)
        for r in customer_spend_exact_percentiles(spark, path).collect()
    ]
    spend: dict[int, int] = {}
    for _oid, cust, price in orders:
        spend[cust] = spend.get(cust, 0) + math.floor(price * 100 + 0.5)
    ordered = sorted((s, c) for c, s in spend.items())
    n = len(ordered)
    expect = [
        (p, (p * n + 9999) // 10000, ordered[(p * n + 9999) // 10000 - 1][0])
        for p in SPEND_PCTS_BP
    ]
    assert got == expect


def test_ewma_matches_python_reference(spark, mini_events_dir):
    # per-type 16-row EWMA (alpha=1/2): integer weights 2^(j-1) over
    # the ordered frame, floored integer quotient — recomputed with a
    # rolling Python list.
    from molgraphdb_spark.queries.temporal import events_ewma

    path, rows = mini_events_dir
    got = {
        r.event_id: (r.ewma_num, r.ewma_den, r.ewma_u)
        for r in events_ewma(spark, path).collect()
    }
    expect = {}
    for et in MINI_EVENT_TYPES:
        stream = sorted(
            (ts, eid, math.floor(v * 1_000_000 + 0.5))
            for (eid, ts, _u, t, v, _p) in rows
            if t == et and v is not None
        )
        hist: list[int] = []
        for _ts, eid, vu in stream:
            hist.append(vu)
            frame = hist[-16:]
            num = sum(v * (1 << j) for j, v in enumerate(frame))
            den = (1 << len(frame)) - 1
            expect[eid] = (num, den, math.floor(num / den))
    assert got == expect


def test_adamic_adar_matches_python_and_networkx(spark, tmp_path_factory):
    # Random bipartite purchase graph: the integer-milli score must
    # equal a plain-Python recompute with the exact floored weights,
    # and track networkx's own adamic_adar_index (the INDEPENDENT
    # library implementation of the published formula) to within the
    # flooring error.
    import networkx as nx

    from molgraphdb_spark.queries.graph_queries import adamic_adar_pairs

    rng = random.Random(13)
    n_cust, n_sup = 40, 25
    inc = sorted(
        {
            (c, rng.randrange(n_sup))
            for c in range(n_cust)
            for _ in range(rng.randrange(1, 6))
        }
    )
    cs = spark.createDataFrame(inc, "o_custkey long, l_suppkey long")
    got = [
        (r.sup_a, r.sup_b, r.shared_customers, r.aa_micro)
        for r in adamic_adar_pairs(cs).collect()
    ]

    # plain-Python recompute (exact integer semantics)
    by_cust: dict[int, list[int]] = {}
    for c, s in inc:
        by_cust.setdefault(c, []).append(s)
    scores: dict[tuple[int, int], list[int]] = {}
    for c, sups in by_cust.items():
        if len(sups) < 2:
            continue
        w = math.floor(1_000_000 / math.log(len(sups)))
        for i, a in enumerate(sorted(sups)):
            for b in sorted(sups)[i + 1 :]:
                cur = scores.setdefault((a, b), [0, 0])
                cur[0] += 1
                cur[1] += w
    expect = sorted(
        ((a, b, sh, aa) for (a, b), (sh, aa) in scores.items()),
        key=lambda t: (-t[3], t[0], t[1]),
    )
    assert got == expect

    # networkx cross-check of the weight formula itself
    g = nx.Graph()
    g.add_edges_from((f"c{c}", f"s{s}") for c, s in inc)
    nx_scores = {
        tuple(sorted((int(u[1:]), int(v[1:])))): p
        for u, v, p in nx.adamic_adar_index(
            g, [(f"s{a}", f"s{b}") for (a, b) in scores]
        )
    }
    for a, b, sh, aa in got:
        # flooring loses < 1 micro-unit per shared customer
        assert abs(aa / 1_000_000 - nx_scores[(a, b)]) < sh * 1e-6 + 1e-9


def test_collocation_pmi_matches_python_reference(spark, tmp_path_factory):
    # PMI over adjacent token pairs, count floor 5 — recomputed with
    # dict loops and math.log on a corpus where "new york" is a real
    # collocation and "the the" is frequent but uninformative.
    from molgraphdb_spark.queries.text import (
        COLLOC_MIN_COUNT,
        doc_collocation_pmi,
    )

    path = str(tmp_path_factory.mktemp("thirdimpl_colloc"))
    rng = random.Random(3)
    filler = ["the", "of", "a", "data", "table", "fast", "row"]
    rows = []
    for did in range(60):
        toks = [rng.choice(filler) for _ in range(rng.randrange(5, 15))]
        if did % 4 == 0:
            toks[2:2] = ["new", "york"]  # planted collocation
        rows.append((did, " ".join(toks), "en", "web"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = [
        (r.bigram, r.n_ab, r.c_a, r.c_b, r.pmi_milli)
        for r in doc_collocation_pmi(spark, path).collect()
    ]

    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    n1 = n2 = 0
    for _did, text, _l, _s in rows:
        toks = text.split()
        n1 += len(toks)
        n2 += max(len(toks) - 1, 0)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    expect = []
    for (a, b), n_ab in big.items():
        if n_ab < COLLOC_MIN_COUNT:
            continue
        pmi = math.floor(
            1000 * math.log((n_ab * n1 * n1) / (n2 * uni[a] * uni[b])) + 0.5
        )
        expect.append((f"{a} {b}", n_ab, uni[a], uni[b], pmi))
    expect.sort(key=lambda t: (-t[4], t[0]))
    assert got == expect[:20]
    # the planted collocation outranks every filler bigram
    assert got[0][0] == "new york"


def _edit_dist(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_matches_python_reference(spark, tmp_path_factory):
    # Hernández–Stolfo sliding window over the sorted dictionary,
    # recomputed with a plain sort + window scan + DP edit distance.
    from molgraphdb_spark.queries.linkage import (
        MAX_EDIT_DIST,
        SN_WINDOW,
        fuzzy_name_sorted_neighborhood,
    )

    path = str(tmp_path_factory.mktemp("thirdimpl_sn"))
    rng = random.Random(5)
    base = [
        f"{a} {b} {c}"
        for a in ["almond", "azure", "beige", "blush", "coral"]
        for b in ["metallic", "polished", "dim"]
        for c in ["steel", "tin", "brass"]
    ]
    names = set(base)
    for n in base[::3]:  # planted typos sort-adjacent to their source
        names.add(n[:-1] + chr(ord(n[-1]) + 1))
    rows = [(i, n) for i, n in enumerate(sorted(names))]
    spark.createDataFrame(rows, "p_partkey long, p_name string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/part.parquet")

    got = [
        (r.name_a, r.name_b, r.edit_dist)
        for r in fuzzy_name_sorted_neighborhood(spark, path).collect()
    ]
    ordered = sorted(names)
    expect = sorted(
        (a, b, d)
        for i, a in enumerate(ordered)
        for b in ordered[i + 1 : i + SN_WINDOW]
        if (d := _edit_dist(a, b)) <= MAX_EDIT_DIST
    )
    assert got == expect
    assert len(got) >= len(base) // 3  # every planted typo is caught


def test_substructure_search_matches_python_reference(spark):
    # containment = fragment WL key ∈ the molecule's enumerated induced
    # connected subgraph hashes — recomputed with the pure-Python
    # enumeration directly (no Spark catalog, no literal golden).
    from molgraphdb_spark.chem.mol import mol_key, parse_smiles
    from molgraphdb_spark.chem.subgraphs import subgraph_hashes
    from molgraphdb_spark.queries.chem_queries import (
        EXAMPLES,
        SUBSTRUCTURE_QUERIES,
        chem_substructure_search,
    )

    got = [
        (r.query, r.name)
        for r in chem_substructure_search(spark, "unused").collect()
    ]
    cat = {name: subgraph_hashes(parse_smiles(smi)) for name, smi in EXAMPLES}
    expect = sorted(
        (q, name)
        for q, qsmi in SUBSTRUCTURE_QUERIES
        for name, hs in cat.items()
        if mol_key(parse_smiles(qsmi)) in hs
    )
    assert got == expect
    # the induced-subgraph subtlety stays pinned: no 4-path in the ring
    assert ("butyl_chain", "Cyclobutane") not in got


"""Fully independent chem recompute (r11 verdict item 5): the two
tests below rebuild the substructure screen and the nearest-molecule
ranking WITHOUT importing anything from molgraphdb_spark.chem — their
own 20-line SMILES parser (the fixtures are carbon-only single-bond
alkanes), brute-force connected-induced-subgraph enumeration, and a
permutation-minimal adjacency canonical key in place of the WL hash.
If the engine's parser, enumerator, WL dedup, or metric formulas were
wrong IN THE SAME WAY on both Spark and the VALUES oracle, these
recomputes would still catch it."""


def _alkane_graph(smi: str) -> list[set]:
    """Adjacency sets for a carbon-only single-bond SMILES subset:
    'C', '(' ')' branches, one-digit ring closures."""
    adj: list[set] = []
    prev = None
    stack = []
    ring: dict[str, int] = {}
    for ch in smi:
        if ch == "C":
            adj.append(set())
            cur = len(adj) - 1
            if prev is not None:
                adj[prev].add(cur)
                adj[cur].add(prev)
            prev = cur
        elif ch == "(":
            stack.append(prev)
        elif ch == ")":
            prev = stack.pop()
        elif ch.isdigit():
            if ch in ring:
                o = ring.pop(ch)
                adj[o].add(prev)
                adj[prev].add(o)
            else:
                ring[ch] = prev
        else:  # pragma: no cover - fixture SMILES never reach here
            raise ValueError(f"unsupported SMILES char {ch!r}")
    return adj


def _canon_key(nodes: tuple, adj: list) -> tuple:
    """Isomorphism-class key: lexicographically minimal upper-triangle
    adjacency bitstring over ALL node permutations (n <= 6 here)."""
    from itertools import permutations as _perms

    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    local = [
        {idx[w] for w in adj[v] if w in idx} for v in nodes
    ]
    best = None
    for p in _perms(range(n)):
        # relabel: position i holds original-local node p[i]
        bits = tuple(
            1 if p[j] in local[p[i]] else 0
            for i in range(n)
            for j in range(i + 1, n)
        )
        if best is None or bits < best:
            best = bits
    return (n, best)


def _subgraph_keys(adj: list) -> set:
    """Canonical keys of every connected induced subgraph with >= 2
    atoms — brute force over node subsets, connectivity by flood."""
    from itertools import combinations as _comb

    keys = set()
    n = len(adj)
    for size in range(2, n + 1):
        for sub in _comb(range(n), size):
            ss = set(sub)
            seen = {sub[0]}
            q = [sub[0]]
            while q:
                v = q.pop()
                for w in adj[v] & ss:
                    if w not in seen:
                        seen.add(w)
                        q.append(w)
            if len(seen) == size:
                keys.add(_canon_key(sub, adj))
    return keys


def test_substructure_search_matches_independent_enumeration(spark):
    # Same screen, rebuilt from scratch: containment = the fragment's
    # canonical key appears in the molecule's enumerated key set.
    from molgraphdb_spark.queries.chem_queries import (
        EXAMPLES,
        SUBSTRUCTURE_QUERIES,
        chem_substructure_search,
    )

    got = sorted(
        (r.query, r.name)
        for r in chem_substructure_search(spark, "unused").collect()
    )
    cat = {name: _subgraph_keys(_alkane_graph(smi)) for name, smi in EXAMPLES}
    expect = sorted(
        (q, name)
        for q, qsmi in SUBSTRUCTURE_QUERIES
        for name, keys in cat.items()
        if _canon_key(
            tuple(range(len(_alkane_graph(qsmi)))), _alkane_graph(qsmi)
        )
        in keys
    )
    assert got == expect
    assert ("butyl_chain", "Cyclobutane") not in got  # induced, not mono


def test_nearest_molecule_matches_independent_recompute(spark):
    # The namesake ranking rebuilt from the independent key sets and
    # the reference formulas (mcs.py:306-331): tanimoto = |I|/|U|,
    # approx GED = max_nodes * (1 - |I|/min(|A|,|B|)), 3-dp round,
    # then milli-bp floor(x*1000+0.5); top-1 per molecule by
    # (tanimoto desc, ged asc, name asc).
    from molgraphdb_spark.queries.chem_queries import (
        EXAMPLES,
        chem_nearest_molecule,
    )

    adjs = {name: _alkane_graph(smi) for name, smi in EXAMPLES}
    keys = {name: _subgraph_keys(a) for name, a in adjs.items()}
    best = {}
    for a in adjs:
        cands = []
        for b in adjs:
            if b == a:
                continue
            inter = len(keys[a] & keys[b])
            union = len(keys[a] | keys[b])
            tan = round(inter / union, 3) if union else 0.0
            max_nodes = max(len(adjs[a]), len(adjs[b]))
            denom = min(len(keys[a]), len(keys[b]))
            ged = round(
                max_nodes * (1 - inter / denom) if denom else float(max_nodes), 3
            )
            cands.append(
                (-int(tan * 1000 + 0.5), int(ged * 1000 + 0.5), b)
            )
        s, g, nb = min(cands)
        best[a] = (nb, -s, g)
    got = {
        r.mol: (r.nearest, r.tanimoto_mbp, r.ged_approx_mbp)
        for r in chem_nearest_molecule(spark, "unused").collect()
    }
    assert got == best


def test_subgraph_counts_and_catalog_match_independent_enumeration(spark):
    # chem_subgraph_counts (per-molecule unique-subgraph totals) and
    # chem_subgraph_catalog_hist (per-size distinct hashes /
    # observations / parents across the corpus) re-derived from the
    # independent enumeration — the two remaining count-shaped
    # constant-VALUES chem oracles.
    from molgraphdb_spark.queries.chem_queries import (
        EXAMPLES,
        chem_subgraph_catalog_hist,
        chem_subgraph_counts,
    )

    keys = {name: _subgraph_keys(_alkane_graph(smi)) for name, smi in EXAMPLES}
    got_counts = {
        r.name: r.n_subgraphs for r in chem_subgraph_counts(spark, "unused").collect()
    }
    assert got_counts == {name: len(ks) for name, ks in keys.items()}

    by_size = {}
    for name, ks in keys.items():
        for k in ks:
            by_size.setdefault(k[0], {}).setdefault(k, set()).add(name)
    expect_hist = {
        size: (
            len(hashes),
            sum(len(p) for p in hashes.values()),  # observations
            sum(len(p) for p in hashes.values()),  # = parents here
        )
        for size, hashes in by_size.items()
    }
    got_hist = {
        r.size: (r.n_hashes, r.total_observations, r.total_parents)
        for r in chem_subgraph_catalog_hist(spark, "unused").collect()
    }
    assert got_hist == expect_hist


def test_tanimoto_pairs_match_independent_recompute(spark):
    # The full 10-pair Tanimoto/approx-GED table (A5/A6) from the
    # independent key sets — completes the independent coverage of the
    # chem constant-VALUES oracle family.
    from molgraphdb_spark.queries.chem_queries import (
        EXAMPLES,
        chem_tanimoto_pairs,
    )

    adjs = {name: _alkane_graph(smi) for name, smi in EXAMPLES}
    keys = {name: _subgraph_keys(a) for name, a in adjs.items()}
    expect = {}
    for a in sorted(adjs):
        for b in sorted(adjs):
            if a >= b:
                continue
            inter = len(keys[a] & keys[b])
            union = len(keys[a] | keys[b])
            tan = round(inter / union, 3) if union else 0.0
            max_nodes = max(len(adjs[a]), len(adjs[b]))
            denom = min(len(keys[a]), len(keys[b]))
            ged = round(
                max_nodes * (1 - inter / denom) if denom else float(max_nodes), 3
            )
            expect[(a, b)] = (
                inter,
                union,
                int(tan * 1000 + 0.5),
                int(ged * 1000 + 0.5),
            )
    got = {
        (r.mol_a, r.mol_b): (r.n_shared, r.n_union, r.tanimoto_mbp, r.ged_approx_mbp)
        for r in chem_tanimoto_pairs(spark, "unused").collect()
    }
    assert got == expect


def _md5_bucket(t: str, dims: int) -> int:
    import hashlib

    return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dims


def test_dsir_selection_matches_python_reference(spark, tmp_path_factory):
    # DSIR importance weights (Xie et al. 2023) recomputed with
    # hashlib + math on a corpus with a planted target vocabulary:
    # 'en' docs draw from TARGET_WORDS, others from CRAWL_WORDS, so
    # target-like docs must dominate the selected fifth.
    from molgraphdb_spark.queries.text import (
        DSIR_DIMS,
        DSIR_TOP_PCT,
        doc_dsir_selection,
    )

    path = str(tmp_path_factory.mktemp("thirdimpl_dsir"))
    rng = random.Random(11)
    target_words = ["theorem", "proof", "lemma", "axiom", "corollary"]
    crawl_words = ["click", "buy", "now", "free", "offer", "deal"]
    rows = []
    for did in range(100):
        if did % 2 == 0:
            lang, src = "en", "wiki"
            toks = [rng.choice(target_words) for _ in range(rng.randrange(6, 12))]
        else:
            lang = rng.choice(["de", "fr"])
            src = "crawl"
            toks = [rng.choice(crawl_words) for _ in range(rng.randrange(6, 12))]
        rows.append((did, " ".join(toks), lang, src))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = [
        (r.source, r.n_docs, r.n_selected, r.sum_weight_milli,
         r.sum_selected_weight_milli)
        for r in doc_dsir_selection(spark, path).collect()
    ]

    # model: hashed unigram+bigram bucket counts, target vs raw
    tc = [0] * DSIR_DIMS
    rc = [0] * DSIR_DIMS
    feats: dict[int, list[int]] = {}
    for did, text, lang, _src in rows:
        toks = text.split()
        bs = [_md5_bucket(t, DSIR_DIMS) for t in toks] + [
            _md5_bucket(f"{a} {b}", DSIR_DIMS) for a, b in zip(toks, toks[1:])
        ]
        feats[did] = bs
        for b in bs:
            rc[b] += 1
            if lang == "en":
                tc[b] += 1
    t_tot, r_tot = sum(tc), sum(rc)
    lam = [
        math.floor(
            math.log(
                ((tc[b] + 1.0) * (r_tot + DSIR_DIMS))
                / ((rc[b] + 1.0) * (t_tot + DSIR_DIMS))
            )
            * 1000
            + 0.5
        )
        for b in range(DSIR_DIMS)
    ]
    w = {did: sum(lam[b] for b in feats[did]) for did, *_ in rows}
    order = sorted(w, key=lambda d: (-w[d], d))
    k = len(order) * DSIR_TOP_PCT // 100
    selected = set(order[:k])
    expect = []
    for src in sorted({r[3] for r in rows}):
        dids = [did for did, _t, _l, s in rows if s == src]
        expect.append(
            (
                src,
                len(dids),
                sum(1 for d in dids if d in selected),
                sum(w[d] for d in dids),
                sum(w[d] for d in dids if d in selected),
            )
        )
    assert got == expect
    # the planted effect: every selected doc is a target-vocabulary doc
    by_src = {r[0]: r for r in got}
    assert by_src["wiki"][2] == k and by_src["crawl"][2] == 0


def test_perplexity_buckets_match_python_reference(spark, tmp_path_factory):
    # CCNet head/middle/tail thirds recomputed with dict loops: the
    # per-language unigram model, integer milli-nat means, and exact
    # rank thirds bucket = min(2, 3(r-1)//n).
    from molgraphdb_spark.queries.text import doc_perplexity_buckets

    path = str(tmp_path_factory.mktemp("thirdimpl_ppl"))
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "rare1", "rare2", "rare3"]
    # Zipf-ish draw so mean scores actually spread
    weights = [20, 12, 8, 5, 1, 1, 1]
    rows = []
    for did in range(90):
        lang = ["en", "de", "fr"][did % 3]
        toks = rng.choices(vocab, weights=weights, k=rng.randrange(4, 20))
        rows.append((did, " ".join(toks), lang, f"src{did % 4}"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = [
        (r.lang, r.bucket, r.n_docs, r.min_mean_nlp_milli,
         r.max_mean_nlp_milli, r.sum_mean_nlp_milli)
        for r in doc_perplexity_buckets(spark, path).collect()
    ]

    # per-language unigram model
    model: dict[str, dict[str, int]] = {}
    for _did, text, lang, _s in rows:
        m = model.setdefault(lang, {})
        for t in text.split():
            m[t] = m.get(t, 0) + 1
    mean_nlp: dict[int, tuple[str, int]] = {}
    for did, text, lang, _s in rows:
        m = model[lang]
        n_tok, v = sum(m.values()), len(m)
        nlps = [
            math.floor(-math.log((m[t] + 1.0) / (n_tok + v)) * 1000 + 0.5)
            for t in text.split()
        ]
        mean_nlp[did] = (lang, math.floor(sum(nlps) / len(nlps)))
    expect_rows = []
    for lang in sorted({r[2] for r in rows}):
        docs = sorted(
            ((s, d) for d, (lg, s) in mean_nlp.items() if lg == lang)
        )
        n = len(docs)
        by_bucket: dict[str, list[int]] = {}
        for r_, (s, _d) in enumerate(docs, 1):
            b = ["head", "middle", "tail"][min(2, 3 * (r_ - 1) // n)]
            by_bucket.setdefault(b, []).append(s)
        for b in sorted(by_bucket):
            ss = by_bucket[b]
            expect_rows.append((lang, b, len(ss), min(ss), max(ss), sum(ss)))
    assert got == expect_rows
    # thirds differ by at most one doc within each language
    for lang in ("en", "de", "fr"):
        sizes = [r[2] for r in got if r[0] == lang]
        assert max(sizes) - min(sizes) <= 1


def test_label_propagation_matches_python_reference(spark, tmp_path_factory):
    # Synchronous LPA (most-frequent neighbor label, ties to minimum,
    # exactly N_LPA_ITER rounds) recomputed with dict loops on a
    # planted two-community purchase graph: customers 1-3 buy only
    # from suppliers 1-2, customers 11-13 only from suppliers 11-12,
    # one bridge order ties them weakly.
    from molgraphdb_spark.queries.graph_queries import (
        N_LPA_ITER,
        graph_label_propagation,
    )

    path = str(tmp_path_factory.mktemp("thirdimpl_lpa"))
    # (orderkey, custkey) and (orderkey, suppkey) rows
    purchases = []
    ok = 0
    for c in (1, 2, 3):
        for s in (1, 2):
            ok += 1
            purchases.append((ok, c, s))
    for c in (11, 12, 13):
        for s in (11, 12):
            ok += 1
            purchases.append((ok, c, s))
    ok += 1
    purchases.append((ok, 3, 11))  # the bridge
    spark.createDataFrame(
        [(o, c) for o, c, _s in purchases], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        [(o, s) for o, _c, s in purchases], "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")

    got = [
        (r.community, r.n_vertices, r.n_customers, r.n_suppliers)
        for r in graph_label_propagation(spark, path).collect()
    ]

    # plain-Python sync LPA over the bidirectional projection
    adj: dict[int, list[int]] = {}
    for _o, c, s in purchases:
        u, v = 2 * c, 2 * s + 1
        if v not in adj.setdefault(u, []):
            adj[u].append(v)
        if u not in adj.setdefault(v, []):
            adj[v].append(u)
    label = {v: v for v in adj}
    for _ in range(N_LPA_ITER):
        new = {}
        for v, nbrs in adj.items():
            votes: dict[int, int] = {}
            for n in nbrs:
                votes[label[n]] = votes.get(label[n], 0) + 1
            new[v] = min(votes, key=lambda l: (-votes[l], l))
        label = new
    comm: dict[int, list[int]] = {}
    for v, l in label.items():
        comm.setdefault(l, []).append(v)

    def fmt(x: int) -> str:
        return f"c:{x // 2}" if x % 2 == 0 else f"s:{(x - 1) // 2}"

    expect = sorted(
        (
            fmt(l),
            len(vs),
            sum(1 for v in vs if v % 2 == 0),
            sum(1 for v in vs if v % 2 == 1),
        )
        for l, vs in comm.items()
    )
    assert got == expect
    # the planted structure survives: the two cliques never merge into
    # one community (the bridge is outvoted in every round)
    assert len(got) >= 2


def test_chunk_spans_match_python_reference(spark, tmp_path_factory):
    # RAG chunk geometry + md5 content hashes recomputed with plain
    # Python slices on docs straddling every boundary case: shorter
    # than one chunk, exactly one chunk, exact multiple of the stride,
    # and one token past it.
    from molgraphdb_spark.queries.text import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        doc_chunk_spans,
    )

    path = str(tmp_path_factory.mktemp("thirdimpl_chunks"))
    rng = random.Random(5)
    vocab = ["tok%d" % i for i in range(50)]
    lengths = [1, 5, CHUNK_SIZE - 1, CHUNK_SIZE, CHUNK_SIZE + 1,
               CHUNK_SIZE + CHUNK_STRIDE, CHUNK_SIZE + CHUNK_STRIDE + 1,
               CHUNK_SIZE + 2 * CHUNK_STRIDE, 300]
    rows = [
        (did, " ".join(rng.choice(vocab) for _ in range(n)), "en", "s0")
        for did, n in enumerate(lengths)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = [
        (r.doc_id, r.chunk_ix, r.start_tok, r.end_tok, r.n_chunk_toks,
         r.chunk_md5)
        for r in doc_chunk_spans(spark, path).collect()
    ]

    import hashlib

    expect = []
    for did, text, _l, _s in rows:
        toks = text.split()
        n = len(toks)
        m = 1 if n <= CHUNK_SIZE else (n - CHUNK_SIZE + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        for i in range(m):
            start = i * CHUNK_STRIDE
            end = min(start + CHUNK_SIZE, n)
            expect.append(
                (did, i, start, end, end - start,
                 hashlib.md5(" ".join(toks[start:end]).encode()).hexdigest())
            )
    assert got == expect
    # every token is covered and consecutive chunks overlap by
    # size − stride (except a shorter final chunk)
    for did, text, _l, _s in rows:
        spans = [(s, e) for d, _i, s, e, _n, _h in expect if d == did]
        assert spans[0][0] == 0 and spans[-1][1] == len(text.split())
        for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
            assert s2 == s1 + CHUNK_STRIDE and s2 < e1  # genuine overlap


def test_gini_matches_python_reference(spark, tmp_path_factory):
    # Sorted-cumulative Gini recomputed with plain Python on (a) a
    # perfectly equal corpus — closed form EXACTLY 0 — and (b) a
    # concentrated one, exact float-for-float replication of the one
    # final IEEE expression.
    from molgraphdb_spark.queries.relational import customer_spend_gini

    def run(prices):
        path = str(tmp_path_factory.mktemp("thirdimpl_gini"))
        rows = [(i, i % 97, float(p)) for i, p in enumerate(prices)]
        spark.createDataFrame(
            rows, "o_orderkey long, o_custkey long, o_totalprice double"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
        (r,) = customer_spend_gini(spark, path).collect()
        return r.n_customers, r.gini_milli

    # equal spend: every customer one order of 100.00
    n_cust, g = run([100.0] * 97)
    assert (n_cust, g) == (97, 0)

    # concentrated: customer k spends (k+1)² dollars, recompute
    prices = [float((i % 97 + 1) ** 2) for i in range(300)]
    n_cust, g = run(prices)
    spend: dict[int, int] = {}
    for i, p in enumerate(prices):
        spend[i % 97] = spend.get(i % 97, 0) + math.floor(p * 100 + 0.5)
    xs = [s for _c, s in sorted(spend.items(), key=lambda kv: (kv[1], kv[0]))]
    n, sx = len(xs), sum(xs)
    six = sum((i + 1) * x for i, x in enumerate(xs))
    expect = math.floor(
        (2.0 * six / float(n * sx) - float(n + 1) / float(n)) * 1000 + 0.5
    )
    assert (n_cust, g) == (n, expect)
    assert g > 0  # concentration is visible


def test_zipf_slope_matches_python_reference(spark, tmp_path_factory):
    # Plant an exact Zipf corpus (token k appears ⌊400/k⌋ times) and
    # recompute the milli-floored OLS slope with plain Python — integer
    # moments, one final division. The slope must sit near −1000.
    from molgraphdb_spark.queries.text import vocab_zipf_slope

    path = str(tmp_path_factory.mktemp("thirdimpl_zipf"))
    toks = []
    for k in range(1, 60):
        toks.extend([f"w{k:03d}"] * (400 // k))
    rng = random.Random(2)
    rng.shuffle(toks)
    # split into docs of ~40 tokens
    rows = [
        (i, " ".join(toks[i * 40 : (i + 1) * 40]), "en", "s0")
        for i in range((len(toks) + 39) // 40)
        if toks[i * 40 : (i + 1) * 40]
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    (r,) = vocab_zipf_slope(spark, path).collect()

    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(math.log(float(i + 1)) * 1000 + 0.5) for i in range(len(ranked))]
    ys = [math.floor(math.log(float(c)) * 1000 + 0.5) for _t, c in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num = (n * sxy - sx * sy) * 1000
    den = n * sxx - sx * sx
    expect = math.floor(float(num) / float(den))
    assert (r.n_types, r.n_tokens, r.zipf_slope_milli) == (n, len(toks), expect)
    assert -1150 <= r.zipf_slope_milli <= -850  # the Zipf line


def test_assortativity_matches_python_and_networkx(spark, tmp_path_factory):
    # Degree assortativity recomputed two independent ways: exact
    # integer Pearson moments in plain Python, and networkx's
    # degree_assortativity_coefficient on the same bipartite graph.
    import networkx as nx

    from molgraphdb_spark.queries.graph_queries import graph_assortativity

    path = str(tmp_path_factory.mktemp("thirdimpl_assort"))
    rng = random.Random(13)
    purchases = set()
    # one hub supplier + a spread of leaves: hub-and-spoke (negative)
    for c in range(40):
        purchases.add((c, 0))
        if rng.random() < 0.4:
            purchases.add((c, 1 + rng.randrange(12)))
    purchases = sorted(purchases)
    rows = [(i, c, s) for i, (c, s) in enumerate(purchases)]
    spark.createDataFrame(
        [(o, c) for o, c, _s in rows], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    spark.createDataFrame(
        [(o, s) for o, _c, s in rows], "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")

    (r,) = graph_assortativity(spark, path).collect()

    # python recompute over the directed both-direction edge list
    deg: dict[int, int] = {}
    edges = []
    for _o, c, s in rows:
        u, v = 2 * c, 2 * s + 1
        edges.append((u, v))
        edges.append((v, u))
    for u, _v in edges:
        deg[u] = deg.get(u, 0) + 1
    n = len(edges)
    xs = [deg[u] for u, _v in edges]
    ys = [deg[v] for _u, v in edges]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    expect = math.floor(float(num) / math.sqrt(float(dx) * float(dy)) * 1000 + 0.5)
    assert (r.n_edges, r.assortativity_milli) == (n, expect)
    assert r.assortativity_milli < 0  # hub-and-spoke is disassortative

    # independent formula check: networkx on the undirected graph
    g = nx.Graph()
    g.add_edges_from((u, v) for u, v in edges if u < v)
    nx_val = nx.degree_assortativity_coefficient(g)
    assert abs(nx_val - expect / 1000.0) < 2e-3


def test_cdc_chunks_match_python_reference(spark, tmp_path_factory):
    # Content-defined chunking recomputed with hashlib + loops, and
    # the CDC selling point pinned: a long region SHARED between two
    # docs at DIFFERENT offsets must produce identical interior chunk
    # hashes (fixed-stride windows cannot align across a shift).
    from molgraphdb_spark.queries.text import CDC_DIVISOR, doc_cdc_chunks

    path = str(tmp_path_factory.mktemp("thirdimpl_cdc"))
    rng = random.Random(17)
    vocab = ["v%d" % i for i in range(200)]
    shared = [rng.choice(vocab) for _ in range(120)]  # the shared region
    doc_a = [rng.choice(vocab) for _ in range(7)] + shared
    doc_b = [rng.choice(vocab) for _ in range(30)] + shared
    doc_c = [rng.choice(vocab) for _ in range(50)]
    rows = [
        (0, " ".join(doc_a), "en", "s0"),
        (1, " ".join(doc_b), "en", "s0"),
        (2, " ".join(doc_c), "en", "s0"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = [
        (r.doc_id, r.chunk_ix, r.start_tok, r.end_tok, r.n_chunk_toks,
         r.chunk_md5)
        for r in doc_cdc_chunks(spark, path).collect()
    ]

    import hashlib

    def bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % CDC_DIVISOR

    expect = []
    hashes: dict[int, set[str]] = {}
    for did, text, _l, _s in rows:
        toks = text.split()
        chunks: list[list[tuple[int, str]]] = [[]]
        for pos, t in enumerate(toks):
            chunks[-1].append((pos, t))
            if bucket(t) == 0:
                chunks.append([])
        if not chunks[-1]:
            chunks.pop()
        for ix, ch in enumerate(chunks):
            h = hashlib.md5(" ".join(t for _p, t in ch).encode()).hexdigest()
            expect.append((did, ix, ch[0][0], ch[-1][0] + 1, len(ch), h))
            hashes.setdefault(did, set()).add(h)
    assert got == expect
    # shift invariance: docs 0 and 1 share interior chunks despite the
    # 7- vs 30-token prefixes; the unrelated doc 2 shares none
    assert len(hashes[0] & hashes[1]) >= 2
    assert not (hashes[0] & hashes[2])


def test_cusum_matches_sequential_python_reference(spark, tmp_path_factory):
    # The distributed CUSUM uses the prefix-min closed form
    # s_i = g_i - min(0, min_{j<=i} g_j); the third implementation runs
    # Page's recurrence DIRECTLY (s = max(0, s + x - mu - k)) - an
    # independent derivation, so a closed-form algebra bug cannot hide.
    # Planted drift: type "drift" doubles its level halfway through,
    # which MUST alarm; type "flat" stays at its mean and must not.
    from molgraphdb_spark.queries.temporal import events_cusum_alarms

    path = str(tmp_path_factory.mktemp("thirdimpl_cusum"))
    rng = random.Random(29)
    rows = []
    eid = 0
    for i in range(400):
        for typ in ("flat", "drift"):
            base = 10.0 if typ == "flat" or i < 200 else 20.0
            rows.append(
                (
                    eid,
                    1_600_000_000_000_000 + i * 60_000_000,
                    eid % 7,
                    typ,
                    round(base + rng.uniform(-1, 1), 2),
                    None,
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")

    got = {
        r.event_type: (r.n_events, r.n_alarms, r.max_cusum_micro,
                       r.mu_micro, r.alarm_threshold_micro)
        for r in events_cusum_alarms(spark, path).collect()
    }

    by_type: dict[str, list[tuple[int, int]]] = {}
    for eid_, ts_us, _u, typ, v, _p in rows:
        by_type.setdefault(typ, []).append((ts_us, eid_, math.floor(v * 1e6 + 0.5)))
    expect = {}
    for typ, evs in by_type.items():
        evs.sort()
        xs = [x for _t, _e, x in evs]
        mu = sum(xs) // len(xs)
        k = mu // 20
        d, h = mu + k, k * 5
        s = 0
        alarms = 0
        mx = None
        for x in xs:
            s = max(0, s + (x - d))
            mx = s if mx is None else max(mx, s)
            if s > h:
                alarms += 1
        expect[typ] = (len(xs), alarms, mx, mu, h)
    assert got == expect
    assert got["drift"][1] > 0      # the planted level shift alarms
    assert got["flat"][1] == 0      # in-control stream stays silent


def test_chunk_dup_rate_matches_python_reference(spark, tmp_path_factory):
    # Shifted boilerplate planted across sources: src "mirror" docs
    # embed the same 80-token block behind different-length prefixes,
    # src "fresh" docs share nothing. Recompute with hashlib loops and
    # assert the planted asymmetry (mirror dup rate high, fresh 0).
    from molgraphdb_spark.queries.text import (
        CDC_DIVISOR,
        source_chunk_dup_rate,
    )

    path = str(tmp_path_factory.mktemp("thirdimpl_chunkdup"))
    rng = random.Random(31)
    vocab = ["u%d" % i for i in range(300)]
    boiler = [rng.choice(vocab) for _ in range(80)]
    rows = []
    for did in range(24):
        if did % 2 == 0:
            toks = [rng.choice(vocab) for _ in range(did + 3)] + boiler
            src = "mirror"
        else:
            toks = [rng.choice(vocab) for _ in range(60)]
            src = "fresh"
        rows.append((did, " ".join(toks), "en", src))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = {
        r.source: (r.n_chunks, r.n_distinct_chunks, r.n_dup_chunks,
                   r.dup_rate_bp)
        for r in source_chunk_dup_rate(spark, path).collect()
    }

    import hashlib

    def bucket(t: str) -> int:
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % CDC_DIVISOR

    occ = []  # (source, doc_id, chunk_md5)
    for did, text, _l, src in rows:
        chunk: list[str] = []
        for t in text.split():
            chunk.append(t)
            if bucket(t) == 0:
                if len(chunk) > 1:
                    occ.append((src, did, hashlib.md5(" ".join(chunk).encode()).hexdigest()))
                chunk = []
        if len(chunk) > 1:
            occ.append((src, did, hashlib.md5(" ".join(chunk).encode()).hexdigest()))
    df_docs: dict[str, set[int]] = {}
    for _s, did, h in occ:
        df_docs.setdefault(h, set()).add(did)
    expect = {}
    for src in ("fresh", "mirror"):
        rows_s = [(d, h) for s, d, h in occ if s == src]
        n = len(rows_s)
        dup = sum(1 for _d, h in rows_s if len(df_docs[h]) > 1)
        expect[src] = (n, len({h for _d, h in rows_s}), dup, dup * 10000 // n)
    assert got == expect
    assert got["mirror"][3] > 5000  # the shifted boilerplate dominates
    assert got["fresh"][2] == 0


def test_hard_negatives_match_python_reference(spark, tmp_path_factory):
    # FaceNet-style triplet mining recomputed with plain-Python loops
    # on planted clusters: two tight label clusters plus one "imposter"
    # vector sitting INSIDE the other cluster — it must surface as the
    # hard negative with a violating (negative) margin for its hosts.
    from molgraphdb_spark.queries.similarity import embedding_hard_negatives

    path = str(tmp_path_factory.mktemp("thirdimpl_hardneg"))
    rng = random.Random(37)
    dim = 8
    vecs = []
    # label 0 around +e0, label 1 around +e1; vec 99 has label 1 but
    # sits in cluster 0 (the imposter)
    for vid in range(40):
        lab = vid % 2
        base = [0.0] * dim
        base[lab] = 1.0
        v = [base[j] + rng.uniform(-0.05, 0.05) for j in range(dim)]
        vecs.append((vid, v, lab))
    imposter = [1.0] + [0.0] * (dim - 1)
    vecs.append((99, [x + rng.uniform(-0.01, 0.01) for x in imposter], 1))
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in vecs],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")

    got = {
        r.vec_id: (r.label, r.hard_neg_id, r.hard_neg_cos_ubp,
                   r.hard_pos_id, r.hard_pos_cos_ubp, r.margin_ubp)
        for r in embedding_hard_negatives(spark, path).collect()
    }

    # python recompute — NOTE: cosines must replicate the engine float
    # path: float32 storage, DOUBLE arithmetic
    import struct as _struct

    def f32(x):
        return _struct.unpack("f", _struct.pack("f", x))[0]

    stored = {i: ([f32(x) for x in v], l) for i, v, l in vecs}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(y * y for y in b))
        return math.floor(num / (da * db) * 1_000_000 + 0.5)

    expect = {}
    for i, (vi, li) in stored.items():
        negs = [(cos(vi, vj), j) for j, (vj, lj) in stored.items() if j != i and lj != li]
        poss = [(cos(vi, vj), j) for j, (vj, lj) in stored.items() if j != i and lj == li]
        nc, nid = max(((c, -j) for c, j in negs))
        pc, pid = min(((c, j) for c, j in poss))
        expect[i] = (li, -nid, nc, pid, pc, pc - nc)
    assert got == expect
    # the imposter is SOME cluster-0 anchor's hard negative, and every
    # cluster-0 anchor that picked it has a violating margin
    hosts = [i for i, t in got.items() if t[1] == 99]
    assert hosts and all(got[i][5] < 0 for i in hosts)


def test_fertility_matches_python_reference(spark, tmp_path_factory):
    # Fertility recomputed with Python re on a corpus where one
    # language is deliberately high-fertility (punctuation-riddled
    # words split into many subwords) and one is 1:1.
    import re

    from molgraphdb_spark.queries.text import (
        BPE_PATTERN,
        lang_token_fertility,
    )

    path = str(tmp_path_factory.mktemp("thirdimpl_fert"))
    rows = [
        (0, "plain words stay whole here", "en", "s0"),
        (1, "more plain words", "en", "s0"),
        (2, "don't-split, über-words: e.g. 'quoted'", "de", "s0"),
        (3, "x1,y2;z3 a.b.c", "de", "s0"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = {
        r.lang: (r.n_docs, r.n_ws_tokens, r.n_bpe_tokens, r.n_chars,
                 r.fertility_bp, r.chars_per_bpe_milli)
        for r in lang_token_fertility(spark, path).collect()
    }

    agg: dict[str, list[int]] = {}
    for _d, text, lang, _s in rows:
        ws = len(text.strip().split())
        bpe = len(re.findall(BPE_PATTERN, text))
        chars = len(re.sub(r"[ \t\n\r\f]+", "", text))
        a = agg.setdefault(lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += ws
        a[2] += bpe
        a[3] += chars
    expect = {
        lang: (n, ws, bpe, ch, bpe * 10000 // ws, ch * 1000 // bpe)
        for lang, (n, ws, bpe, ch) in agg.items()
    }
    assert got == expect
    # the punctuation-heavy language runs hotter
    assert got["de"][4] > got["en"][4] >= 10000


def test_lsh_multiprobe_finds_hamming1_twin(spark, tmp_path_factory):
    # The multi-probe selling point as a closed form: a near-identical
    # twin whose ONLY difference is a tiny sign flip in one bucket
    # dimension lands in a Hamming-1 bucket — single-probe structurally
    # misses it, multi-probe must recover it as the exact top-1.
    from molgraphdb_spark.queries.similarity import similarity_lsh_recall

    path = str(tmp_path_factory.mktemp("thirdimpl_multiprobe"))
    dim = 16
    rng = random.Random(41)
    vecs = []
    # query 0: positive in all 8 bucket dims
    q = [0.5] * 8 + [rng.uniform(-1, 1) for _ in range(dim - 8)]
    vecs.append((0, q, 0))
    # its twin: sign of dim 3 flipped by a hair — cosine ≈ 0.99+,
    # bucket differs in exactly one bit
    twin = list(q)
    twin[3] = -0.001
    vecs.append((100, twin, 1))
    # 30 far-away distractors that share NO bucket with the query
    # (negative in every bucket dim, so Hamming distance 8)
    for i in range(30):
        v = [-0.5] * 8 + [rng.uniform(-1, 1) for _ in range(dim - 8)]
        vecs.append((200 + i, v, 2))
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in vecs],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")

    got = {r.method: (r.n_queries, r.n_found, r.n_correct, r.recall_bp)
           for r in similarity_lsh_recall(spark, path).collect()}
    # only vec_id 0 is a query (< 50). Single-probe: its bucket holds
    # nothing else -> no candidate at all. Multi-probe: the twin sits
    # one flip away and IS the exact top-1.
    assert got["single_probe"] == (1, 0, 0, 0)
    assert got["multi_probe"] == (1, 1, 1, 10000)


def test_lsh_multiprobe_dominates_single_on_corpus(spark, sf_dir):
    # On the real corpus the 9-bucket probe set must never do worse
    # than its own single-bucket subset - both in coverage and recall.
    from molgraphdb_spark.queries.similarity import similarity_lsh_recall

    got = {r.method: r for r in similarity_lsh_recall(spark, sf_dir).collect()}
    s, m = got["single_probe"], got["multi_probe"]
    assert m.n_found >= s.n_found
    assert m.n_correct >= s.n_correct


def test_curation_funnel_matches_python_reference(spark, tmp_path_factory):
    # The composed pipeline recomputed stage by stage in plain Python,
    # on a corpus engineered so EVERY stage drops something: token
    # weights are derived from the md5 formula at test time to build
    # known-positive and known-negative texts; exact dups share
    # normalized text; doc_ids 0/97 are the eval slice; one survivor
    # copies an eval doc's 3-grams (contaminated).
    import hashlib

    from molgraphdb_spark.queries.text import (
        DECONTAM_EVAL_MOD,
        DECONTAM_MIN_OVERLAP,
        QC_DIMS,
        QC_MIX,
        pipeline_curation_funnel,
    )

    def w(tok: str) -> int:
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % QC_DIMS
        return b * QC_MIX % 2147483648 % 2001 - 1000

    cands = [f"tok{i}" for i in range(400)]
    pos = [t for t in cands if w(t) > 200][:6]
    neg = [t for t in cands if w(t) < -200][:6]
    assert len(pos) == 6 and len(neg) == 6

    good = " ".join(pos)           # strongly positive score
    bad = " ".join(neg)            # strongly negative score
    eval_text = " ".join(pos[:3] + ["evalmark1", "evalmark2", "evalmark3"])
    # contaminated: shares >= 2 word-3-grams with eval_text's tail
    contam_text = " ".join(["evalmark1", "evalmark2", "evalmark3"] + pos[:3])

    rows = [
        (0, eval_text, "en", "s0"),        # eval slice member
        (1, good, "en", "s0"),             # survives everything
        (2, good, "en", "s0"),             # exact dup of 1 -> dropped at dedup
        (3, "  " + good + "  ", "en", "s0"),  # normalized dup of 1
        (4, bad, "en", "s0"),              # fails quality
        (5, contam_text, "en", "s0"),      # contaminated survivor
        (97, good + " extra", "en", "s0"),  # eval member that would survive
        (6, " ".join(pos[3:]) , "en", "s0"),  # independent survivor
    ]
    path = str(tmp_path_factory.mktemp("thirdimpl_funnel"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = [
        (r.stage_ix, r.stage, r.docs_in, r.docs_out, r.dropped)
        for r in pipeline_curation_funnel(spark, path).collect()
    ]

    # plain-Python funnel
    def score(text: str) -> int:
        return sum(w(t) for t in text.strip().split())

    def norm(text: str) -> str:
        import re
        return re.sub(r"[ \t\n\r\f]+", " ", text.strip()).lower()

    def grams(text: str) -> set:
        t = text.strip().split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    ing = [(d, t) for d, t, _l, _s in rows]
    s1 = [(d, t) for d, t in ing if score(t) >= 0]
    by_hash: dict[str, int] = {}
    for d, t in sorted(s1):
        by_hash.setdefault(norm(t), d)
    s2 = [(d, t) for d, t in s1 if by_hash[norm(t)] == d]
    s3 = [(d, t) for d, t in s2 if d % DECONTAM_EVAL_MOD != 0]
    # the doc_decontaminate_overlap rule: overlap counted PER
    # (train, eval-doc) PAIR, never against the pooled eval grams
    ev_docs = [
        grams(t) for d, t in ing
        if d % DECONTAM_EVAL_MOD == 0 and len(t.split()) >= 3
    ]
    s4 = [
        (d, t) for d, t in s3
        if not any(len(grams(t) & eg) >= DECONTAM_MIN_OVERLAP for eg in ev_docs)
    ]
    n0, n1, n2, n3, n4 = len(ing), len(s1), len(s2), len(s3), len(s4)
    expect = [
        (1, "quality", n0, n1, n0 - n1),
        (2, "exact_dedup", n1, n2, n1 - n2),
        (3, "eval_holdout", n2, n3, n2 - n3),
        (4, "decontamination", n3, n4, n3 - n4),
    ]
    assert got == expect
    # every stage visibly drops at least one document
    assert all(r[4] >= 1 for r in got)


def test_hard_negatives_single_label_keeps_anchor_label(spark, tmp_path_factory):
    # An anchor with NO different-label counterpart must still report
    # its own (known) label with NULL negative columns — the one-pass
    # conditional-aggregate form carries the label through; the old
    # two-leg outer join lost it.
    from molgraphdb_spark.queries.similarity import embedding_hard_negatives

    path = str(tmp_path_factory.mktemp("thirdimpl_hn_onelabel"))
    spark.createDataFrame(
        [(i, [float(i + j) for j in range(4)], 7) for i in range(5)],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    rows = embedding_hard_negatives(spark, path).collect()
    assert len(rows) == 5
    assert all(r.label == 7 for r in rows)
    assert all(r.hard_neg_id is None and r.hard_neg_cos_ubp is None for r in rows)
    assert all(r.hard_pos_id is not None for r in rows)


def test_kl_divergence_matches_python_reference(spark, tmp_path_factory):
    # KL(source || corpus) in integer micro-nats recomputed with dict
    # loops and math.log on a corpus with one deliberately drifted
    # source (its vocabulary is disjoint from the blend), which must
    # carry the largest divergence.
    from molgraphdb_spark.queries.text import source_token_divergence

    path = str(tmp_path_factory.mktemp("thirdimpl_kl"))
    rng = random.Random(43)
    blend = ["the", "data", "table", "row", "fast"]
    drift = ["zq1", "zq2", "zq3"]
    rows = []
    for did in range(80):
        if did % 4 == 3:
            src, words = "drifted", drift
        else:
            src, words = f"src{did % 3}", blend
        toks = [rng.choice(words) for _ in range(rng.randrange(5, 15))]
        rows.append((did, " ".join(toks), "en", src))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = {
        r.source: (r.n_distinct_tokens, r.kl_micro)
        for r in source_token_divergence(spark, path).collect()
    }

    st: dict[tuple, int] = {}
    for _d, text, _l, src in rows:
        for t in text.split():
            st[(src, t)] = st.get((src, t), 0) + 1
    ns: dict[str, int] = {}
    gt: dict[str, int] = {}
    for (src, t), c in st.items():
        ns[src] = ns.get(src, 0) + c
        gt[t] = gt.get(t, 0) + c
    n_g = sum(ns.values())
    expect: dict[str, list] = {}
    for (src, t), c in st.items():
        term = math.floor(
            (c / ns[src]) * math.log((c * n_g) / (ns[src] * gt[t])) * 1e6 + 0.5
        )
        e = expect.setdefault(src, [0, 0])
        e[0] += 1
        e[1] += term
    assert got == {s: tuple(v) for s, v in expect.items()}
    # the drifted source dominates the divergence table
    assert got["drifted"][1] == max(v[1] for v in got.values())


def test_hhi_matches_python_reference(spark, tmp_path_factory):
    # Herfindahl-Hirschman in integer basis points: a monopoly corpus
    # must score the closed-form 10000^2 and an equal split n*(10000//n)^2.
    from molgraphdb_spark.queries.relational import supplier_concentration_hhi

    def run(rows):
        path = str(tmp_path_factory.mktemp("thirdimpl_hhi"))
        spark.createDataFrame(
            rows, "l_suppkey long, l_extendedprice double"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
        (r,) = supplier_concentration_hhi(spark, path).collect()
        return r.n_suppliers, r.hhi, r.top_share_bp

    # monopoly: one supplier
    assert run([(1, 500.0)]) == (1, 10000 * 10000, 10000)
    # four equal suppliers: shares 2500bp, hhi = 4 * 2500^2
    assert run([(s, 100.0) for s in range(4)]) == (4, 4 * 2500 * 2500, 2500)
    # python recompute on a skewed book
    rows = [(s, float((s % 7 + 1) * 10)) for s in range(20) for _ in range(s % 3 + 1)]
    got = run(rows)
    rev: dict[int, int] = {}
    for s, p in rows:
        rev[s] = rev.get(s, 0) + math.floor(p * 100 + 0.5)
    total = sum(rev.values())
    shares = [r * 10000 // total for r in rev.values()]
    assert got == (len(shares), sum(x * x for x in shares), max(shares))


def test_lorenz_deciles_match_python_reference(spark, tmp_path_factory):
    # NTILE(10) Lorenz table recomputed with the standard NTILE size
    # rule (first n%k tiles get one extra row) over spend ranked
    # descending - cumulative top-down shares in basis points.
    from molgraphdb_spark.queries.relational import customer_lorenz_deciles

    path = str(tmp_path_factory.mktemp("thirdimpl_lorenz"))
    rng = random.Random(47)
    rows = [(i, i % 73, round(rng.uniform(10, 5000), 2)) for i in range(300)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")

    got = [
        (r.decile, r.n_customers, r.share_bp, r.cum_share_bp)
        for r in customer_lorenz_deciles(spark, path).collect()
    ]

    spend: dict[int, int] = {}
    for _o, c, p in rows:
        spend[c] = spend.get(c, 0) + math.floor(p * 100 + 0.5)
    ranked = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))
    n, k = len(ranked), 10
    base, rem = n // k, n % k

    def tile(r):  # 1-based rank -> 1-based NTILE
        if r <= (base + 1) * rem:
            return (r + base) // (base + 1)
        return rem + (r - (base + 1) * rem + base - 1) // base

    total = sum(spend.values())
    agg: dict[int, list] = {}
    for r_, (_c, s) in enumerate(ranked, 1):
        e = agg.setdefault(tile(r_), [0, 0])
        e[0] += 1
        e[1] += s
    expect = []
    cum = 0
    for d in sorted(agg):
        nc, rev = agg[d]
        cum += rev
        expect.append((d, nc, rev * 10000 // total, cum * 10000 // total))
    assert got == expect
    # Lorenz sanity: decile 1 (top spenders) holds the largest share
    assert got[0][2] == max(r[2] for r in got)


def test_twap_matches_python_reference(spark, mini_events_dir):
    # Hold-until-next TWAP recomputed with sorted lists: per user,
    # weight each reading by the duration to its successor (last
    # reading weightless); integer micro-unit products, one final
    # float division replicated float-for-float.
    from molgraphdb_spark.queries.temporal import events_twap

    path, rows = mini_events_dir
    got = [
        (r.user_id, r.n_intervals, r.total_dur_us, r.twap_u)
        for r in events_twap(spark, path).collect()
    ]

    by_user: dict[int, list] = {}
    for eid, ts_us, uid, _t, v, _p in rows:
        by_user.setdefault(uid, []).append((ts_us, eid, math.floor(v * 1e6 + 0.5)))
    expect = []
    for uid in sorted(by_user):
        evs = sorted(by_user[uid])
        if len(evs) < 2:
            continue
        durs = [
            (evs[i + 1][0] - evs[i][0], evs[i][2]) for i in range(len(evs) - 1)
        ]
        total = sum(d for d, _v in durs)
        sp = sum(d * v for d, v in durs)
        expect.append(
            (uid, len(durs), total, math.floor(float(sp) / total))
        )
    assert got == expect


def test_ngram_novelty_matches_python_reference(spark, tmp_path_factory):
    # First-occurrence shingle attribution recomputed with dict loops:
    # doc 0 is fully novel, a verbatim copy at doc 5 is fully stale,
    # and a half-remix scores in between.
    from molgraphdb_spark.queries.dedup import doc_ngram_novelty

    path = str(tmp_path_factory.mktemp("thirdimpl_novelty"))
    rng = random.Random(53)
    vocab = ["n%d" % i for i in range(60)]
    texts = {}
    texts[0] = " ".join(rng.choice(vocab) for _ in range(30))
    texts[1] = " ".join(rng.choice(vocab) for _ in range(30))
    texts[5] = texts[0]                       # verbatim restatement
    half = texts[1].split()[:15]
    texts[7] = " ".join(half + [rng.choice(vocab) + "x" for _ in range(15)])
    rows = [(d, t, "en", "s0") for d, t in sorted(texts.items())]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = sorted(  # output order is unspecified (presentation sorts dropped r11)
        (r.doc_id, r.n_shingles, r.n_novel, r.novelty_bp)
        for r in doc_ngram_novelty(spark, path).collect()
    )

    import re

    def shingles(text: str) -> set:
        toks = re.sub(r"[ \t\n\r\f]+", " ", text.strip()).lower().split(" ")
        cnt = max(len(toks) - 2, 1)
        return {" ".join(toks[i : i + 3]) for i in range(cnt)}

    sh = {d: shingles(t) for d, t, _l, _s in rows}
    first: dict[str, int] = {}
    for d in sorted(sh):
        for g in sh[d]:
            first.setdefault(g, d)
    expect = []
    for d in sorted(sh):
        n = len(sh[d])
        novel = sum(1 for g in sh[d] if first[g] == d)
        expect.append((d, n, novel, novel * 10000 // n))
    assert got == expect
    by_doc = {r[0]: r for r in got}
    assert by_doc[0][3] == 10000 and by_doc[5][3] == 0
    assert 0 < by_doc[7][3] < 10000


def test_decoded_features_match_python_reference(spark, tmp_path_factory):
    # mm_decoded_features goes text -> synthesized PPM/WAV -> REAL
    # decode -> features. The third implementation here computes the
    # same features STRAIGHT from the text bytes with plain Python
    # loops (no codecs module, no numpy) — if the encode/decode pair
    # lost or shifted a single byte, these numbers split.
    from molgraphdb_spark.queries.multimodal_queries import mm_decoded_features

    path = str(tmp_path_factory.mktemp("thirdimpl_decoded"))
    rows = [
        (0, "abc", "en", "s0"),                      # image, tiny: raster cycles a lot
        (1, "audio sample text with spread", "en", "s0"),
        (3, "x" * 100, "en", "s0"),                  # image, uniform bytes
        (4, "mixed 123 PUNCT!?", "en", "s0"),        # audio
        (6, "The quick brown fox jumps over the lazy dog", "en", "s0"),
        (2, "video modality must not appear", "en", "s0"),
        (7, "another audio doc", "en", "s0"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = {r.doc_id: tuple(r)[1:] for r in mm_decoded_features(spark, path).collect()}

    expect = {}
    for doc_id, text, _l, _s in rows:
        b = text.encode()
        n = len(b)
        if doc_id % 3 == 0:
            w, h = n % 64 + 1, n % 48 + 1
            npix = w * h
            lum_sum = 0
            peak = 0
            for k in range(npix):
                r_, g_, b_ = b[(3 * k) % n], b[(3 * k + 1) % n], b[(3 * k + 2) % n]
                lum_sum += (2126 * r_ + 7152 * g_ + 722 * b_) // 10000
                peak = max(peak, r_, g_, b_)
            expect[doc_id] = (
                "image", w, h, None, npix, None,
                lum_sum * 1000 // npix, None, peak,
            )
        elif doc_id % 3 == 1:
            samples = [(c - 128) * 256 for c in b]
            expect[doc_id] = (
                "audio", None, None, 8000, n, n * 1000 // 8000, None,
                sum(s * s for s in samples), max(abs(s) for s in samples),
            )
    assert got == expect
    assert 2 not in got  # video stays at the compressed-codec boundary


def test_multipass_sn_matches_python_and_beats_single_pass(spark, tmp_path_factory):
    # Planted corpus: "zzz alpha widget" vs "aaa alpha widget" differ
    # only in the FIRST token (edit distance 3) — the forward sort puts
    # them at opposite ends of the dictionary (padding names fill the
    # gap far beyond SN_WINDOW), so the single forward pass MUST miss
    # the pair; the reverse-name sort makes them adjacent. Recompute
    # the full multipass result with plain Python sorting + a textbook
    # DP Levenshtein.
    from molgraphdb_spark.queries.linkage import (
        MAX_EDIT_DIST,
        SN_WINDOW,
        fuzzy_name_multipass,
        fuzzy_name_sorted_neighborhood,
    )

    path = str(tmp_path_factory.mktemp("thirdimpl_multipass"))
    names = ["aaa alpha widget", "zzz alpha widget"]
    # 30 middle-alphabet fillers, mutually distant (> ED 3) and far
    # from both planted names in both sort orders' WINDOWED sense
    names += [f"m{i:02d} filler item number {i * 37}" for i in range(30)]
    rows = [(i, n, "B1", "M1") for i, n in enumerate(names)]
    spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_mfgr string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/part.parquet")

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def sn_pairs(keyed):
        order = [n for _k, n in sorted(keyed)]
        out = set()
        for i, a in enumerate(order):
            for j in range(i + 1, min(i + SN_WINDOW, len(order))):
                out.add((min(a, order[j]), max(a, order[j])))
        return out

    fwd = sn_pairs([(n, n) for n in names])
    rev = sn_pairs([(n[::-1], n) for n in names])
    expect = sorted(
        (a, b, lev(a, b), int((a, b) in fwd), int((a, b) in rev))
        for (a, b) in fwd | rev
        if lev(a, b) <= MAX_EDIT_DIST
    )
    got = sorted(tuple(r) for r in fuzzy_name_multipass(spark, path).collect())
    assert got == expect

    planted = ("aaa alpha widget", "zzz alpha widget")
    by_pair = {(a, b): (f, r) for a, b, _d, f, r in got}
    assert by_pair[planted] == (0, 1)  # reverse-only: the pass-2 catch
    # and the single forward pass really does miss it
    single = {(r.name_a, r.name_b) for r in
              fuzzy_name_sorted_neighborhood(spark, path).collect()}
    assert planted not in single


@pytest.fixture(scope="module")
def tie_events_dir(spark, tmp_path_factory):
    """600 events, 7 users, 4 types, values in [-20, 80] (negatives
    included), timestamps in 3-event groups sharing one ts and types in
    2-event runs — so same-(bar, type) timestamp TIES exist (eids 6m
    and 6m+1) and the (ts, event_id) ordering keys actually decide."""
    path = str(tmp_path_factory.mktemp("thirdimpl_ties"))
    rng = random.Random(1234)
    rows = []
    for eid in range(600):
        rows.append(
            (
                eid,
                1_600_000_000_000_000 + (eid // 3) * 60_000_000,
                eid % 7,
                ["click", "view", "error", "purchase"][(eid // 2) % 4],
                round(rng.uniform(-20, 80), 1),
                None,
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
    return path, rows


def test_markov_transitions_match_python_reference(spark, tie_events_dir):
    # dict-loop recompute: per-user (ts, event_id) sort, lag pairs,
    # (from, to) counts, row-normalized basis points by integer //.
    from molgraphdb_spark.queries.events import events_markov_transitions

    path, rows = tie_events_dir
    got = [tuple(r) for r in events_markov_transitions(spark, path).collect()]

    by_user: dict[int, list] = {}
    for eid, ts_us, uid, typ, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts_us, eid, typ))
    counts: dict[tuple, int] = {}
    for evs in by_user.values():
        evs.sort()
        for (_t1, _e1, a), (_t2, _e2, b) in zip(evs, evs[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    row_tot: dict[str, int] = {}
    for (a, _b), n in counts.items():
        row_tot[a] = row_tot.get(a, 0) + n
    expect = sorted(
        (a, b, n, n * 10000 // row_tot[a]) for (a, b), n in counts.items()
    )
    assert got == expect
    # every non-first event contributes exactly one transition
    assert sum(n for _a, _b, n, _p in expect) == 600 - 7
    assert len(expect) >= 8  # the deterministic type cycle's 8 kinds


def test_ohlc_resample_matches_python_reference(spark, tie_events_dir):
    # 15-minute bars recomputed with dict loops; open/close pick by the
    # same (ts, event_id) scalar key, so the planted same-(bar, type)
    # ts ties are decided by event_id on both implementations.
    from molgraphdb_spark.queries.temporal import events_ohlc_resample

    path, rows = tie_events_dir
    got = [tuple(r) for r in events_ohlc_resample(spark, path).collect()]

    bars: dict[tuple, list] = {}
    for eid, ts_us, _u, typ, v, _p in rows:
        hour_us = (ts_us // 3_600_000_000) * 3_600_000_000
        minute = (ts_us % 3_600_000_000) // 60_000_000
        bar = hour_us + (minute // 15) * 15 * 60_000_000
        bars.setdefault((bar, typ), []).append((ts_us, eid, v))
    expect = []
    for (bar, typ), evs in sorted(bars.items()):
        evs.sort()
        vals = [v for _t, _e, v in evs]
        expect.append(
            (bar, typ, round(evs[0][2], 2), round(max(vals), 2),
             round(min(vals), 2), round(evs[-1][2], 2), len(evs))
        )
    assert got == expect
    # the tie actually fired: some bar has two same-type events at one ts
    assert any(
        len({t for t, _e, _v in evs}) < len(evs) for evs in bars.values()
    )


def test_winsorized_stats_match_python_reference(spark, tie_events_dir):
    # exact interpolated p05/p95 (lower + frac*(higher-lower), the
    # same IEEE expression Spark's percentile evaluates), clamp, and
    # integer micro-sums recomputed with sorted lists.
    from molgraphdb_spark.queries.temporal import events_winsorized_stats

    path, rows = tie_events_dir
    got = {
        r.event_type: (r.n, r.lo_u, r.hi_u, r.n_clip_low, r.n_clip_high,
                       r.mean_clipped_u)
        for r in events_winsorized_stats(spark, path).collect()
    }

    by_type: dict[str, list] = {}
    for _e, _t, _u, typ, v, _p in rows:
        by_type.setdefault(typ, []).append(v)

    def pct(xs, q):
        pos = q * (len(xs) - 1)
        f = math.floor(pos)
        if f + 1 >= len(xs):
            return xs[-1]
        return xs[f] + (pos - f) * (xs[f + 1] - xs[f])

    expect = {}
    for typ, vs in by_type.items():
        vs.sort()
        lo, hi = pct(vs, 0.05), pct(vs, 0.95)
        clipped = [min(max(v, lo), hi) for v in vs]
        s = sum(math.floor(c * 1_000_000 + 0.5) for c in clipped)
        expect[typ] = (
            len(vs),
            math.floor(lo * 1_000_000 + 0.5),
            math.floor(hi * 1_000_000 + 0.5),
            sum(1 for v in vs if v < lo),
            sum(1 for v in vs if v > hi),
            math.floor(s / len(vs)),
        )
    assert got == expect
    # negatives actually flowed through the clamp
    assert any(e[1] < 0 for e in expect.values())


def test_basket_rules_match_python_reference(spark, tmp_path_factory):
    # Apriori trio (support / confidence / lift in integer bp)
    # recomputed with set-and-dict loops on a planted basket corpus:
    # parts 1+2 co-occur in 4 of 8 orders (strong lift), 1+3 in 1
    # (dilution), 4 appears alone (no pair row).
    from molgraphdb_spark.queries.relational import parts_basket_rules

    path = str(tmp_path_factory.mktemp("thirdimpl_basket"))
    baskets = {
        100: [1, 2], 101: [1, 2, 3], 102: [1, 2], 103: [1, 2, 5],
        104: [3, 5], 105: [4], 106: [2, 3, 5], 107: [1, 5],
    }
    rows = []
    ln = 0
    for ok, parts in baskets.items():
        for pk in parts:
            # duplicate one line to prove the DISTINCT in the query
            for _ in range(2 if (ok == 100 and pk == 1) else 1):
                ln += 1
                rows.append((ok, ln, pk, 1.0, 100.0, 0.0, "N", "O", "1996-01-01", 0, 0))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_returnflag string, "
        "l_orderstatus string, l_shipdate string, l_suppkey long, l_tax long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")

    got = [tuple(r) for r in parts_basket_rules(spark, path).collect()]

    n_orders = len(baskets)
    n_pk: dict[int, int] = {}
    sup: dict[tuple, int] = {}
    for parts in baskets.values():
        ps = sorted(set(parts))
        for p in ps:
            n_pk[p] = n_pk.get(p, 0) + 1
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                sup[(a, b)] = sup.get((a, b), 0) + 1
    scored = [
        (a, b, s, s * 10000 // n_pk[a], s * n_orders * 10000 // (n_pk[a] * n_pk[b]))
        for (a, b), s in sup.items()
    ]
    scored.sort(key=lambda r: (-r[2], -r[4], r[0], r[1]))
    assert got == scored[:10]
    by_pair = {(a, b): (s, c, l) for a, b, s, c, l in got}
    # hand checks: support(1,2)=4; n_1=5, n_2=5; conf=4*10000//5=8000;
    # lift=4*8*10000//25=12800 (>10000: genuinely associated)
    assert by_pair[(1, 2)] == (4, 8000, 12800)
    assert (1, 4) not in by_pair and (4, 5) not in by_pair  # singleton part


def test_dau_wau_match_python_reference(spark, tmp_path_factory):
    # Trailing-7-day distinct actives recomputed with per-day set
    # unions on a planted visit pattern: user 0 visits every day
    # (drives stickiness up), users 1..6 visit exactly one weekday
    # each, user 7 appears once (drops out of WAU after 7 days).
    from molgraphdb_spark.queries.events import events_dau_wau

    path = str(tmp_path_factory.mktemp("thirdimpl_dauwau"))
    day_us = 86_400_000_000
    base = 1_600_000_000_000_000 - (1_600_000_000_000_000 % day_us)
    visits = []  # (day_index, user)
    for d in range(14):
        visits.append((d, 0))
        visits.append((d, 1 + d % 7))
    visits.append((2, 7))
    rows = [
        (i, base + d * day_us + (i % 5) * 3_600_000_000, u, "view", 1.0, None)
        for i, (d, u) in enumerate(visits)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", "event_type", "value", "props",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")

    got = [tuple(r) for r in events_dau_wau(spark, path).collect()]

    by_day: dict[int, set] = {}
    for d, u in visits:
        by_day.setdefault(d, set()).add(u)
    expect = []
    for d in sorted(by_day):
        dau = len(by_day[d])
        wau_set = set()
        for d2 in range(max(0, d - 6), d + 1):
            wau_set |= by_day.get(d2, set())
        wau = len(wau_set)
        expect.append((base + d * day_us, dau, wau, dau * 10000 // wau))
    assert got == expect
    # planted structure actually exercised: day 2 has the one-off user
    by = {(r[0] - base) // day_us: r for r in got}
    assert by[2][1] == 3                      # users {0, 3, 7}
    assert by[8][2] == 8                      # full week: 0,1..6 + user 7 at d=2... gone
    assert by[9][2] == 8                      # 0 + weekday users, 7 aged out


def test_weighted_sample_matches_python_reference(spark, tmp_path_factory):
    # Mark-crossing systematic sampling recomputed with a plain integer
    # cumsum loop: a giant doc (half the corpus weight) must catch
    # ~half the marks; tiny docs mostly select nothing.
    from molgraphdb_spark.queries.mixing import WSAMPLE_TARGET, doc_weighted_sample

    path = str(tmp_path_factory.mktemp("thirdimpl_wsample"))
    rows = []
    for i in range(99):
        rows.append((i, "x" * (10 + i % 17), "en", f"s{i % 3}"))
    rows.append((99, "y" * 1500, "en", "giant"))  # ~half the total weight
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    got = {r.source: (r.n_selected, r.w_selected, r.marks_hit)
           for r in doc_weighted_sample(spark, path).collect()}

    tw = sum(len(t) for _i, t, _l, _s in rows)
    cum = 0
    agg: dict[str, list[int]] = {}
    for _i, text, _l, src in sorted(rows):
        w = len(text)
        cum += w
        n_marks = (cum * WSAMPLE_TARGET) // tw - ((cum - w) * WSAMPLE_TARGET) // tw
        if n_marks > 0:
            a = agg.setdefault(src, [0, 0, 0])
            a[0] += 1
            a[1] += w
            a[2] += n_marks
    expect = {src: tuple(v) for src, v in agg.items()}
    assert got == expect
    # the giant doc holds ~half the marks in one row
    assert got["giant"][0] == 1
    assert got["giant"][2] >= WSAMPLE_TARGET * 2 // 5
    # total marks hit == WSAMPLE_TARGET (every mark crossed exactly once)
    assert sum(v[2] for v in got.values()) == WSAMPLE_TARGET


# ---------------------------------------------------------------------------
# BM25 + RRF on the REAL sf corpus (r10 verdict item 5): the two
# retrieval flagships recomputed with plain Python reading the parquet
# directly via pyarrow — fully independent of Spark AND of the DuckDB
# oracle (which shares each query's SQL formula by design), so a
# both-sides-wrong formula bug cannot survive. Unlike the mini-corpus
# references in tests/test_retrieval.py, these run the production
# tokenizer contract (split(trim(text), \s+)) against real documents.
# ---------------------------------------------------------------------------
def _pa_docs(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return [
        (int(d), t_)
        for d, t_ in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        if t_ is not None
    ]


def test_bm25_matches_python_on_real_corpus(spark, sf_dir):
    import re as _re

    from molgraphdb_spark.queries.text import (
        BM25_B,
        BM25_K1,
        BM25_QUERIES,
        doc_bm25_topk,
    )

    docs = {d: _re.split(r"[ \t\n\r\f]+", t.strip()) for d, t in _pa_docs(sf_dir)}
    n = len(docs)
    tot = max(sum(len(v) for v in docs.values()), 1)
    terms = sorted({t for _, ts in BM25_QUERIES for t in ts})
    df = {t: sum(1 for v in docs.values() if t in v) for t in terms}
    expect = []
    for qid, qterms in BM25_QUERIES:
        scored = []
        for d, toks in docs.items():
            s, hit = 0, False
            for t in qterms:
                tf = toks.count(t)
                if tf == 0:
                    continue
                hit = True
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                denom = tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * len(toks) * n / tot)
                s += math.floor(1000 * idf * tf * (BM25_K1 + 1.0) / denom + 0.5)
            if hit:
                scored.append((d, s))
        scored.sort(key=lambda p: (-p[1], p[0]))
        expect.extend(
            (qid, d, s, rk) for rk, (d, s) in enumerate(scored[:10], start=1)
        )
    got = [
        (r.query_id, r.doc_id, r.score_milli, r.rank)
        for r in doc_bm25_topk(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(expect)
    assert len(got) > 0


def test_rrf_matches_python_on_real_corpus(spark, sf_dir):
    import re as _re

    import pyarrow.parquet as pq

    from molgraphdb_spark.queries.similarity import (
        RRF_K,
        RRF_LEG_K,
        RRF_N_QUERIES,
        RRF_TOPK,
        retrieval_rrf_hybrid,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    embs = {
        int(i): [float(x) for x in v]  # float32 -> float64, same as Spark's cast
        for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
        if v is not None
    }

    def cos_micro(a, b):
        # sequential left-fold, same accumulation order as _dot
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1_000_000 + 0.5)

    toksets = {
        d: set(_re.split(r"[ \t\n\r\f]+", txt.strip())) for d, txt in _pa_docs(sf_dir)
    }
    fused: dict[tuple[int, int], int] = {}
    for q in range(RRF_N_QUERIES):
        legs = []
        if q in embs:
            dense = sorted(
                ((i, cos_micro(embs[q], v)) for i, v in embs.items() if i != q),
                key=lambda p: (-p[1], p[0]),
            )
            legs.append(dense)
        if q in toksets:
            qt = toksets[q]
            sparse = []
            for i, s in toksets.items():
                if i == q:
                    continue
                inter = len(qt & s)
                if inter:
                    sparse.append((i, inter * 1_000_000 // (len(qt) + len(s) - inter)))
            sparse.sort(key=lambda p: (-p[1], p[0]))
            legs.append(sparse)
        for leg in legs:
            for rk, (i, _) in enumerate(leg[:RRF_LEG_K], start=1):
                fused[(q, i)] = fused.get((q, i), 0) + 1_000_000_000 // (RRF_K + rk)
    expect = []
    for q in range(RRF_N_QUERIES):
        cands = sorted(
            ((i, s) for (qq, i), s in fused.items() if qq == q),
            key=lambda p: (-p[1], p[0]),
        )
        expect.extend(
            (q, i, s, rk) for rk, (i, s) in enumerate(cands[:RRF_TOPK], start=1)
        )
    got = [
        (r.query_id, r.neighbor_id, r.rrf_score_nano, r.rank)
        for r in retrieval_rrf_hybrid(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(expect)
    assert len(got) == RRF_N_QUERIES * RRF_TOPK


def test_html_extract_matches_stdlib_html_parser(spark, sf_dir):
    """Third implementation of doc_html_extract: build the SAME wrapper
    page in plain Python and extract it with stdlib html.parser (an
    actual HTML tokenizer — a genuinely different algorithm from the
    regex pipeline), then compare every output column on the real
    corpus."""
    import re as _re
    from html.parser import HTMLParser

    from molgraphdb_spark.queries.text import (
        _HTML_HEAD,
        _HTML_MID1,
        _HTML_MID2,
        _HTML_TAIL,
        doc_html_extract,
    )

    class Extract(HTMLParser):
        def __init__(self):
            super().__init__()  # convert_charrefs=True unescapes entities
            self.chunks, self.main, self.links = [], [], []
            self.skip = 0
            self.in_p = 0
            self.in_a = 0
            self.n_links = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self.skip += 1
            if tag == "p":
                self.in_p += 1
            if tag == "a":
                self.in_a += 1
                self.n_links += 1

        def handle_endtag(self, tag):
            if tag in ("script", "style"):
                self.skip -= 1
            if tag == "p":
                self.in_p -= 1
            if tag == "a":
                self.in_a -= 1

        def handle_data(self, data):
            if self.skip:
                return
            self.chunks.append(data)
            if self.in_p:
                self.main.append(data)
            if self.in_a:
                self.links.append(data)

    def norm(parts):
        # explicit class + space-only strip: Python \s (Unicode ws,
        # NBSP) is wider than Java \s and RE2 \s — the engine/oracle
        # collapse on exactly [ \t\n\r\f] (ADVICE r11)
        return _re.sub(r"[ \t\n\r\f]+", " ", " ".join(parts)).strip(" ")

    expect = {}
    for did, text in _pa_docs(sf_dir):
        esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        page = f"{_HTML_HEAD}{did}{_HTML_MID1}{did}{_HTML_MID2}{esc}{_HTML_TAIL}"
        p = Extract()
        p.feed(page)
        p.close()
        full, main = norm(p.chunks), norm(p.main)
        link_chars = sum(len(x) for x in p.links)
        expect[did] = (
            p.n_links,
            len(full),
            len(main),
            link_chars * 1000 // max(len(full), 1),
            len(main) * 1000 // max(len(full), 1),
            main,
        )

    got = {
        r.doc_id: (
            r.n_links,
            r.full_len,
            r.main_len,
            r.link_density_milli,
            r.main_ratio_milli,
            r.main_text,
        )
        for r in doc_html_extract(spark, sf_dir).collect()
    }
    assert got == expect
    assert len(got) > 0


# ------------------------------------------------------------------
# chem_subgraph_display: full independent recompute (r12 verdict item
# 5 — the last constant-VALUES chem oracles gain third impls). Zero
# chem-package imports: own SMILES reader (_alkane_graph), brute-force
# induced-subgraph enumeration (_subgraph_keys), permutation-minimal
# canonical keys (_canon_key). The engine's CHOICE of display string
# is the only thing not recomputed — instead each displayed SMILES is
# re-parsed independently and must land on exactly the recomputed
# isomorphism class, bijectively, with the recomputed frequency.
# ------------------------------------------------------------------


def test_subgraph_display_matches_independent_enumeration(spark):
    from collections import Counter

    from molgraphdb_spark.queries.chem_queries import (
        EXAMPLES,
        chem_subgraph_display,
    )

    # independent table: frequency = number of PARENT molecules whose
    # induced-subgraph class set contains the class
    freq: Counter = Counter()
    for _name, smi in EXAMPLES:
        freq.update(_subgraph_keys(_alkane_graph(smi)))

    got = chem_subgraph_display(spark, "unused").collect()
    got_map = {}
    for r in got:
        adj = _alkane_graph(r.display_smiles)
        key = _canon_key(tuple(range(len(adj))), adj)
        # display string parses to a CONNECTED graph of the claimed size
        assert key[0] == r.size and sum(key[1]) == r.n_edges, r
        # distinct rows are distinct isomorphism classes
        assert key not in got_map, r
        got_map[key] = r.frequency
    assert got_map == dict(freq)
    assert len(got_map) == 9  # the fixture corpus's unique classes


# ------------------------------------------------------------------
# Render digest: SECOND IMPLEMENTATION of the full raster pipeline
# (r12 verdict item 5). The test re-derives layout (BFS zig-zag hex
# lattice), integer bounding-box scaling, Bresenham bond lines with
# double/triple parallel offsets, 3×3 CPK atom blocks, the P6 PPM
# header, and the md5 — importing NOTHING from chem/render.py or
# functions/codecs.py — and must reproduce the engine digests
# bit-for-bit on chains, branches, rings, a double bond, and a
# heteroatom.
# ------------------------------------------------------------------

_TP_DIRS = [(4, 0), (2, -4), (-2, -4), (-4, 0), (-2, 4), (2, 4)]
_TP_CPK = {"C": (64, 64, 64), "O": (224, 0, 0)}
_TP_CANVAS, _TP_MARGIN, _TP_BOND = 300, 12, (16, 16, 16)


def _tp_parse(smi: str):
    """Independent minimal SMILES reader (C/O atoms, = and # bonds,
    branches, one-digit ring closures)."""
    elements: list = []
    bonds: dict = {}
    prev, stack, ring, order = None, [], {}, 1.0
    for ch in smi:
        if ch in ("C", "O"):
            elements.append(ch)
            cur = len(elements) - 1
            if prev is not None:
                bonds[(min(prev, cur), max(prev, cur))] = order
            order, prev = 1.0, cur
        elif ch == "=":
            order = 2.0
        elif ch == "#":
            order = 3.0
        elif ch == "(":
            stack.append(prev)
        elif ch == ")":
            prev = stack.pop()
        elif ch.isdigit():
            if ch in ring:
                o = ring.pop(ch)
                bonds[(min(o, prev), max(o, prev))] = order
                order = 1.0
            else:
                ring[ch] = prev
        else:  # pragma: no cover - test SMILES never reach here
            raise ValueError(ch)
    return elements, bonds


def _tp_render_md5(smi: str):
    import hashlib as _hl

    elements, bonds = _tp_parse(smi)
    n = len(elements)
    nbrs = {
        i: sorted({b if a == i else a for a, b in bonds if i in (a, b)})
        for i in range(n)
    }
    # layout: BFS from atom 0, zig-zag direction preference from the
    # parent's incoming direction, doubling probe scale until free
    coords = {0: (0, 0)}
    taken = {(0, 0)}
    in_dir = {0: 0}
    queue, seen = [0], {0}
    while queue:
        u = queue.pop(0)
        ux, uy = coords[u]
        d_in = in_dir[u]
        pref = [
            (d_in + 1) % 6, (d_in + 5) % 6, d_in,
            (d_in + 2) % 6, (d_in + 4) % 6, (d_in + 3) % 6,
        ]
        for v in nbrs[u]:
            if v in seen:
                continue
            placed = False
            for scale in range(1, 64):
                for d in pref:
                    dx, dy = _TP_DIRS[d]
                    p = (ux + dx * scale, uy + dy * scale)
                    if p not in taken:
                        coords[v], in_dir[v] = p, d
                        taken.add(p)
                        placed = True
                        break
                if placed:
                    break
            seen.add(v)
            queue.append(v)
    # integer bounding-box scale into the margined canvas
    xs = [p[0] for p in coords.values()]
    ys = [p[1] for p in coords.values()]
    xmin, xmax, ymin, ymax = min(xs), max(xs), min(ys), max(ys)
    span = _TP_CANVAS - 2 * _TP_MARGIN

    def s(v, lo, hi):
        return (
            _TP_CANVAS // 2 if hi == lo else _TP_MARGIN + (v - lo) * span // (hi - lo)
        )

    pix = {i: (s(x, xmin, xmax), s(y, ymin, ymax)) for i, (x, y) in coords.items()}
    canvas = bytearray(b"\xff" * (_TP_CANVAS * _TP_CANVAS * 3))

    def put(x, y, rgb):
        if 0 <= x < _TP_CANVAS and 0 <= y < _TP_CANVAS:
            o = (y * _TP_CANVAS + x) * 3
            canvas[o : o + 3] = bytes(rgb)

    def bres(x0, y0, x1, y1):
        dx, dy = abs(x1 - x0), -abs(y1 - y0)
        sx = 1 if x0 < x1 else -1
        sy = 1 if y0 < y1 else -1
        err = dx + dy
        while True:
            yield x0, y0
            if x0 == x1 and y0 == y1:
                return
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x0 += sx
            if e2 <= dx:
                err += dx
                y0 += sy

    for (a, b), order in sorted(bonds.items()):
        (x0, y0), (x1, y1) = pix[a], pix[b]
        off = (0, 1) if abs(x1 - x0) >= abs(y1 - y0) else (1, 0)
        lines = [(0, 0)]
        if order == 2.0:
            lines.append(off)
        elif order == 3.0:
            lines.append(off)
            lines.append((-off[0], -off[1]))
        for ox, oy in lines:
            for x, y in bres(x0 + ox, y0 + oy, x1 + ox, y1 + oy):
                put(x, y, _TP_BOND)
    for i, (x, y) in pix.items():
        rgb = _TP_CPK[elements[i]]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                put(x + dx, y + dy, rgb)
    ink, colors = 0, set()
    for o in range(0, len(canvas), 3):
        px = bytes(canvas[o : o + 3])
        if px != b"\xff\xff\xff":
            ink += 1
            colors.add(px)
    ppm = b"P6\n%d %d\n255\n" % (_TP_CANVAS, _TP_CANVAS) + bytes(canvas)
    return ink, len(colors), _hl.md5(ppm).hexdigest()


def test_render_digest_matches_second_implementation():
    from molgraphdb_spark.chem.render import render_ppm

    for smi in ("CCC", "C1CCC1", "CC(C)C", "C=CC", "CCO", "CC(C)(C)C"):
        _na, _nb, ink, nc, md5, _data = render_ppm(smi)
        ink2, nc2, md52 = _tp_render_md5(smi)
        assert (ink, nc, md5) == (ink2, nc2, md52), smi


def test_render_subgraph_golden_digests_match_second_implementation():
    # the constant-VALUES oracle rows of chem_render_subgraphs,
    # re-derived by the independent pipeline (no engine import at all)
    golden = {
        "CC": (291, "35c48ac69f90735e9b4909ef14b0e181"),
        "CCC": (573, "10d47829bb51811df3ac373144412213"),
        "C1CCC1": (1127, "39381a3602b561ff104449962ca2a0ab"),
        "CC(C)C": (487, "96e41f1ffc3749b16cf4208f7dd1c23e"),
        "CCCC": (487, "bfa4207efcd73db936828a938cc4a620"),
        "CC(C)(C)C": (631, "9b85d5cdc622f19332015002773a5695"),
        "CCC(C)C": (493, "7d9decc4907f8169e831854f1b566357"),
        "CCCCC": (585, "0c09b71005e27c9d8c3e842316ec67a8"),
    }
    for smi, (ink, md5) in golden.items():
        ink2, _nc, md52 = _tp_render_md5(smi)
        assert (ink2, md52) == (ink, md5), smi


def test_pagerank_top_matches_python_power_iteration():
    # r13 verdict item 5: graph_pagerank_top was the last non-chem
    # VALUES oracle with no independent recompute on the real table.
    # This is that recompute — pyarrow + plain-Python power iteration
    # (independent of BOTH Spark and DuckDB) over the gate-scale
    # sf0.01 parquet, reproducing the oracle literal exactly: same
    # graph (distinct customer-supplier purchase pairs, bidirectional,
    # packed ids), same 10 damped iterations (d=0.85, init 1.0,
    # rank = 0.15 + 0.85*sum(in-contribs rank/deg)), same
    # micro-basis-point floor and (rank_ubp DESC, id ASC) top-20.
    # Float order differs from Spark's partial aggregation, so an
    # exact ubp match additionally evidences the documented summation
    # headroom (~1e-9 of a ubp).
    import math
    import os
    import re

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(os.path.join(sf, "orders.parquet")):
        pytest.skip("gate-scale sf0.01 testdata not present")
    orders = pq.read_table(
        os.path.join(sf, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    li = pq.read_table(
        os.path.join(sf, "lineitem.parquet"), columns=["l_orderkey", "l_suppkey"]
    )
    cust = dict(
        zip(orders["o_orderkey"].to_pylist(), orders["o_custkey"].to_pylist())
    )
    pairs = set()
    for ok, sk in zip(li["l_orderkey"].to_pylist(), li["l_suppkey"].to_pylist()):
        ck = cust.get(ok)
        if ck is not None:
            pairs.add((2 * ck, 2 * sk + 1))
    edges = []
    for c, s in pairs:
        edges.append((c, s))
        edges.append((s, c))
    deg: dict[int, int] = {}
    for src, _ in edges:
        deg[src] = deg.get(src, 0) + 1
    verts = sorted(deg)
    rank = {v: 1.0 for v in verts}
    d = 0.85
    for _ in range(10):
        contrib = {v: 0.0 for v in verts}
        for src, dst in edges:
            contrib[dst] += rank[src] / deg[src]
        rank = {v: (1 - d) + d * contrib[v] for v in verts}
    rows = []
    for v, r in rank.items():
        rid = f"c:{v // 2}" if v % 2 == 0 else f"s:{(v - 1) // 2}"
        rows.append((math.floor(r * 1_000_000 + 0.5), rid))
    rows.sort(key=lambda t: (-t[0], t[1]))
    got = [(rid, ubp) for ubp, rid in rows[:20]]

    from molgraphdb_spark.queries.graph_queries import GRAPH_PAGERANK_SQL

    want = [
        (i, int(u)) for i, u in re.findall(r"\('([cs]:\d+)',\s*(\d+)\)", GRAPH_PAGERANK_SQL)
    ]
    assert len(want) == 20 and got == want
