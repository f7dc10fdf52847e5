"""Golden tests for the edge-table graph layer on the FIXTURES.md §3
synthetic graph (path A–B–C–D plus isolated pair X–Y, bidirectional).

Pins the reference's BFS return convention (nodes on path: self=1, one
edit=2, unreachable=−1 — verified against /root/reference/main.py:272–305
per SURVEY.md §3.1) and the idempotent-insert semantics
(/root/reference/main.py:151,203)."""

from __future__ import annotations

import pytest

from molgraphdb_spark.operators.graph import (
    append_edges,
    bfs_query,
    connected_components,
    edges_from_rows,
    empty_edges,
    graph_stats,
    vertices,
)

FIXTURE_EDGES = [
    ("A", "B", 1, 1, 0),
    ("B", "A", -1, -1, 0),
    ("B", "C", 1, 1, 0),
    ("C", "B", -1, -1, 0),
    ("C", "D", 1, 1, 0),
    ("D", "C", -1, -1, 0),
    ("X", "Y", 0, 0, 1),
    ("Y", "X", 0, 0, 1),
]


@pytest.fixture(scope="module")
def edges(spark):
    return edges_from_rows(spark, FIXTURE_EDGES).cache()


def test_bfs_self_is_one(edges):
    assert bfs_query(edges, "A", "A") == 1


def test_bfs_one_edit_is_two(edges):
    assert bfs_query(edges, "A", "B") == 2


def test_bfs_two_edits_is_three(edges):
    assert bfs_query(edges, "A", "C") == 3


def test_bfs_three_edits_is_four(edges):
    assert bfs_query(edges, "A", "D") == 4


def test_bfs_unreachable_is_minus_one(edges):
    assert bfs_query(edges, "A", "X") == -1


def test_bfs_depth_cap(edges):
    # depth caps the number of waves (main.py:213,224): D is 3 edges out.
    assert bfs_query(edges, "A", "D", max_depth=2) == -1


def test_stats_unique_molecules(edges):
    stats = graph_stats(edges)
    assert stats["unique_molecules"] == 6
    assert stats["n_edges"] == 8


def test_vertices(edges):
    assert {r.id for r in vertices(edges).collect()} == {"A", "B", "C", "D", "X", "Y"}


def test_append_idempotent(spark, edges):
    # Re-inserting an existing (src, dst) is a no-op (INSERT OR IGNORE,
    # main.py:203); a genuinely new edge lands exactly once even when
    # submitted twice in the same batch (UNIQUE, main.py:151).
    dup = edges_from_rows(spark, [("A", "B", 9, 9, 9)])
    assert append_edges(edges, dup).count() == 8
    new = edges_from_rows(spark, [("D", "E", 1, 0, 0), ("D", "E", 1, 0, 0)])
    merged = append_edges(edges, new)
    assert merged.count() == 9
    assert merged.filter("src = 'D' AND dst = 'E'").count() == 1


def test_append_to_empty(spark, edges):
    assert append_edges(empty_edges(spark), edges).count() == 8


def test_pagerank_symmetry_and_mass(edges):
    from molgraphdb_spark.operators.graph import pagerank

    ranks = {r.id: r.rank for r in pagerank(edges, n_iter=20).collect()}
    # total rank mass ≈ vertex count
    assert abs(sum(ranks.values()) - 6.0) < 1e-6
    # symmetric positions get identical rank
    assert abs(ranks["A"] - ranks["D"]) < 1e-9
    assert abs(ranks["B"] - ranks["C"]) < 1e-9
    assert abs(ranks["X"] - ranks["Y"]) < 1e-9
    # chain interiors outrank endpoints
    assert ranks["B"] > ranks["A"]


def test_approx_distinct_within_tolerance(spark, sf_dir):
    from molgraphdb_spark.queries.graph_queries import approx_distinct_parts
    from molgraphdb_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    row = approx_distinct_parts(spark, sf_dir).first()
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(
        F.countDistinct("l_partkey").alias("p"), F.countDistinct("l_orderkey").alias("o")
    ).first()
    # The query now emits exact counts + in-band booleans (so both
    # engines hash identically); the <5% HLL tolerance is the booleans.
    assert row.exact_parts == exact.p and row.exact_orders == exact.o
    assert row.parts_within_band and row.orders_within_band


def test_connected_components(edges):
    comp = {r.id: r.component for r in connected_components(edges).collect()}
    assert comp == {"A": "A", "B": "A", "C": "A", "D": "A", "X": "X", "Y": "X"}


def test_connected_components_star_matches_min_label(edges):
    from molgraphdb_spark.operators.graph import connected_components_star

    comp = {r.id: r.component for r in connected_components_star(edges).collect()}
    assert comp == {"A": "A", "B": "A", "C": "A", "D": "A", "X": "X", "Y": "X"}


def test_connected_components_star_logarithmic_on_path(spark):
    # A planted path graph is the adversarial case for min-label
    # propagation (O(diameter) = 199 rounds here, beyond its max_iter);
    # the alternating star algorithm must solve it in O(log n) rounds.
    from molgraphdb_spark.operators.graph import connected_components_star

    n = 200
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels = {r.id: r.component for r in connected_components_star(path).collect()}
    assert labels == {i: 0 for i in range(n)}
    assert connected_components_star.last_rounds <= 12, (
        connected_components_star.last_rounds
    )


def test_connected_components_star_random_graph_parity(spark):
    # Star and min-label agree on an arbitrary multi-component graph
    # (fixed seed; includes self-loops, isolated-by-self-loop vertices,
    # duplicate and reversed edges).
    import random

    from molgraphdb_spark.operators.graph import connected_components_star

    rng = random.Random(7)
    rows = [(rng.randrange(80), rng.randrange(80)) for _ in range(120)]
    rows += [(77, 77), (200, 201)]
    # min-label propagates src->dst only (contract: bidirectional edge
    # table, as append_edges writes); star symmetrizes internally
    rows += [(b, a) for a, b in rows]
    g = spark.createDataFrame(rows, "src long, dst long")
    a = {r.id: r.component for r in connected_components(g).collect()}
    b = {r.id: r.component for r in connected_components_star(g).collect()}
    assert a == b


def test_connected_components_auto_dispatch_and_parity(spark):
    # auto matches both underlying algorithms and records which path ran
    import random

    from molgraphdb_spark.operators.graph import (
        connected_components_auto,
        connected_components_star,
    )

    rng = random.Random(11)
    rows = [(rng.randrange(60), rng.randrange(60)) for _ in range(90)]
    rows += [(b, a) for a, b in rows]
    g = spark.createDataFrame(rows, "src long, dst long")
    want = {r.id: r.component for r in connected_components_star(g).collect()}

    small = {r.id: r.component for r in connected_components_auto(g).collect()}
    assert connected_components_auto.last_strategy == "minlabel"
    assert small == want

    # force the star path with a zero threshold
    big = {r.id: r.component for r in connected_components_auto(g, small_graph_edges=0).collect()}
    assert connected_components_auto.last_strategy == "star"
    assert big == want


def test_connected_components_auto_escalates_on_unconverged(spark):
    # a path graph with max_small_iter=1 cannot converge via min-label;
    # auto must escalate to star instead of returning wrong labels
    from molgraphdb_spark.operators.graph import connected_components_auto

    n = 12
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n)] + [(i + 1, i) for i in range(n)],
        "src long, dst long",
    )
    labels = {r.id: r.component for r in connected_components_auto(path, max_small_iter=1).collect()}
    assert connected_components_auto.last_strategy == "minlabel→star"
    assert set(labels.values()) == {0} and len(labels) == n + 1


def test_approx_quantiles_within_band(spark, sf_dir):
    # same pattern as the HLL twin: the emitted booleans ARE the
    # GK-sketch error pin — verify them true per group and the exact
    # cents against a direct percentile computation
    from molgraphdb_spark.queries.reshape import approx_quantiles_price
    from molgraphdb_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    rows = approx_quantiles_price(spark, sf_dir).collect()
    assert rows, "lineitem has at least one return flag"
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.floor(F.percentile("l_extendedprice", F.lit(0.5)) * 100 + 0.5).alias("p50"),
            F.floor(F.percentile("l_extendedprice", F.lit(0.95)) * 100 + 0.5).alias("p95"),
        )
        .collect()
    }
    for r in rows:
        assert r["p50_within_band"] and r["p95_within_band"], r["l_returnflag"]
        assert r["p50_cents"] == exact[r["l_returnflag"]]["p50"]
        assert r["p95_cents"] == exact[r["l_returnflag"]]["p95"]


def _nx_cores(edge_list):
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(edge_list)
    return dict(nx.core_number(g))


def _sym(spark, edge_list):
    sym = edge_list + [(b, a) for a, b in edge_list]
    return spark.createDataFrame(sym, "src long, dst long")


def test_core_numbers_golden(spark):
    from molgraphdb_spark.operators.graph import core_numbers

    # K4 clique (core 3) with a pendant path (cores 1)
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    got = {r.id: r.core for r in core_numbers(_sym(spark, edges)).collect()}
    assert got == _nx_cores(edges)
    assert got[0] == 3 and got[4] == 1
    assert core_numbers.last_converged


def test_core_numbers_random_agreement(spark):
    import random

    from molgraphdb_spark.operators.graph import core_numbers

    rnd = random.Random(7)
    for _ in range(3):
        edges = list(
            {
                (a, b)
                for a, b in (
                    (rnd.randrange(30), rnd.randrange(30)) for _ in range(120)
                )
                if a != b
            }
        )
        got = {r.id: r.core for r in core_numbers(_sym(spark, edges)).collect()}
        assert got == _nx_cores(edges)


def _duck_edges(sql: str) -> list[tuple[int, int]]:
    import duckdb

    return [(int(a), int(b)) for a, b in duckdb.sql(sql).fetchall()]


def test_kcore_query_histogram_matches_networkx_on_real_data(spark):
    """Data-matched golden (r6 verdict item 7): the registry query's
    FULL core histogram on the real sf0.01 co-purchase projection must
    equal networkx ``core_number`` on the identical edge set — not
    just the row count the driver's rows-only check sees. (At sf0.01
    the supplier projection happens to be the complete graph K100, so
    the exact histogram is {99: 100} — pinning it still catches any
    off-by-one in degree init / H-operator convergence; the sparser
    part projection below exercises a 12-value histogram.)"""
    from collections import Counter

    import networkx as nx

    from molgraphdb_spark.queries.graph_queries import graph_kcore_summary

    sf01 = "/root/testdata/sf0.01"
    got = {
        r["core"]: r["n_vertices"]
        for r in graph_kcore_summary(spark, sf01).collect()
    }
    edges = _duck_edges(f"""
        WITH cs AS (
          SELECT DISTINCT o_custkey AS cust, l_suppkey AS sup
          FROM '{sf01}/lineitem.parquet' l
          JOIN '{sf01}/orders.parquet' o ON l_orderkey = o_orderkey
        )
        SELECT DISTINCT a.sup, b.sup
        FROM cs a JOIN cs b ON a.cust = b.cust AND a.sup <> b.sup
    """)
    g = nx.Graph()
    g.add_edges_from(edges)
    expected = dict(Counter(nx.core_number(g).values()))
    assert got == expected


def test_core_numbers_part_projection_matches_networkx(spark, sf_dir):
    """The operator on a REAL sparse graph: the part co-order
    projection at test scale has a many-valued core histogram (unlike
    the dense supplier projection), so this golden discriminates
    between correct and almost-correct fixpoints on actual data."""
    from collections import Counter

    import networkx as nx

    from molgraphdb_spark.operators.graph import core_numbers

    edges = _duck_edges(f"""
        WITH cs AS (
          SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
          FROM '{sf_dir}/lineitem.parquet'
        )
        SELECT DISTINCT a.p, b.p
        FROM cs a JOIN cs b ON a.ok = b.ok AND a.p <> b.p
    """)
    # edges query already emits both directions (a <> b, unordered join)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = Counter(r.core for r in core_numbers(df).collect())
    g = nx.Graph()
    g.add_edges_from(edges)
    expected = Counter(nx.core_number(g).values())
    assert dict(got) == dict(expected)
    assert len(got) > 5  # non-degenerate: a genuinely multi-valued histogram


def test_multi_bfs_matches_per_seed_single_source(spark):
    # multi-source BFS (one wave loop, frontier keyed by (seed, id))
    # must agree exactly with K independent single-source runs
    from molgraphdb_spark.operators.graph import bfs_distances, multi_bfs_distances

    # path 0-1-2-3-4 plus a disjoint pair 10-11
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)]
    e = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    seeds = [0, 2, 10]
    multi = {
        (r.seed, r.id): r.dist
        for r in multi_bfs_distances(e, seeds, max_depth=10).collect()
    }
    single = {}
    for s in seeds:
        for r in bfs_distances(e, s, max_depth=10).collect():
            single[(s, r.id)] = r.dist
    assert multi == single
    assert multi[(0, 4)] == 4 and multi[(2, 0)] == 2 and multi[(10, 11)] == 1
    # seed 0 never reaches the disjoint component
    assert (0, 10) not in multi


def test_multi_bfs_duplicate_seeds_not_double_counted(spark):
    # duplicate seed entries must collapse: un-deduped, every (seed,id)
    # row doubles and downstream counts silently inflate (r6 advice)
    from molgraphdb_spark.operators.graph import multi_bfs_distances

    pairs = [(0, 1), (1, 2)]
    e = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    rows = multi_bfs_distances(e, [0, 0, 2, 0], max_depth=10).collect()
    assert len(rows) == len({(r.seed, r.id) for r in rows})
    assert {r.seed for r in rows} == {0, 2}


def test_multi_bfs_depth_cap(spark):
    from molgraphdb_spark.operators.graph import multi_bfs_distances

    pairs = [(i, i + 1) for i in range(6)]
    e = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )
    got = {r.id for r in multi_bfs_distances(e, [0], max_depth=2).collect()}
    assert got == {0, 1, 2}


def test_adamic_adar_hand_graph(spark, tmp_path_factory):
    """Exact hand-computed AA on a 3-customer bipartite graph: c1 buys
    from s1,s2 (deg 2 → w=floor(1e6/ln2)=1442695), c2 from s1,s2,s3
    (deg 3 → 910239), c3 from s1 only (deg 1 — dropped: unshareable).
    Third implementation (math.log by hand), independent of both the
    Spark expression and the DuckDB oracle."""
    import math

    from molgraphdb_spark.queries.graph_queries import graph_adamic_adar

    path = str(tmp_path_factory.mktemp("aa_mini"))
    orders = [(10, 1), (11, 2), (12, 3)]  # o_orderkey, o_custkey
    lines = [(10, 101), (10, 102), (11, 101), (11, 102), (11, 103), (12, 101)]
    spark.createDataFrame(orders, "o_orderkey long, o_custkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    spark.createDataFrame(lines, "l_orderkey long, l_suppkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    w2 = math.floor(1_000_000 / math.log(2))
    w3 = math.floor(1_000_000 / math.log(3))
    got = [
        (r.sup_a, r.sup_b, r.shared_customers, r.aa_micro)
        for r in graph_adamic_adar(spark, path).collect()
    ]
    assert got == [
        (101, 102, 2, w2 + w3),
        (101, 103, 1, w3),
        (102, 103, 1, w3),
    ]


def test_triangle_count_dispatch_strategies_agree(spark):
    # r8 verdict item 7: the billion-node co-partition path is a real
    # dispatch, not a docstring promise — both strategies must return
    # the exact networkx count, and the threshold must pick sides.
    import random

    import networkx as nx

    from molgraphdb_spark.operators.graph import triangle_count

    random.seed(11)
    n = 80
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (random.sample(range(n), 2) for _ in range(600))
        }
    )
    df = spark.createDataFrame(edges, "x long, y long")
    want = sum(nx.triangles(nx.Graph(edges)).values()) // 3
    got_b = triangle_count(df, n_vertices=n).collect()[0][0]
    assert triangle_count.last_strategy == "broadcast"
    got_c = triangle_count(df, n_vertices=n, broadcast_max_vertices=16).collect()[0][0]
    assert triangle_count.last_strategy == "copartition"
    assert got_b == got_c == want
