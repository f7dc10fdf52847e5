"""Chemistry queries over the reference's fixture molecules
(FIXTURES.md §2; /root/reference/src/mcs.py:700–706,
main.py:377–391), exposed through the driver contract.

Oracles: DuckDB cannot enumerate subgraphs or hash graphs, so the
oracle SQL for these queries is a CONSTANT golden table (VALUES)
derived from the reference's algorithm semantics. The anchor values
(subgraph counts 3/5/3/4/5; Neopentane↔Hexane shared=2, union=7,
Tanimoto=0.286, approx-GED=3.0) are independently verified in
FIXTURES.md §2.1 by re-executing the reference's exact algorithms; the
remaining pairs extend the same verified implementation
(tests/test_chem.py pins the anchors). The edit-graph expansion query
has no SQL equivalent and takes the driver's rows-only check.

The sf_dir argument is unused — these operate on the reference's own
demo corpus, the only molecule fixture that exists (SURVEY.md §5).
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from molgraphdb_spark.chem.spark_ops import (
    expand_relations,
    named_molecule_subgraphs,
    pairwise_overlap_metrics,
    parse_molecules,
    subgraph_catalog,
)
from molgraphdb_spark.session import tune

#: The GED-pipeline example molecules (mcs.py:700–706).
EXAMPLES = [
    ("Butane", "CCCC"),
    ("Isopentane", "CCC(C)C"),
    ("Cyclobutane", "C1CCC1"),
    ("Neopentane", "CC(C)(C)C"),
    ("Hexane", "CCCCCC"),
]

#: Simple edit-graph seeds (main.py:377–380).
EDIT_SEEDS = ["CCC", "CC", "C(C)C"]


def _example_mols(spark: SparkSession) -> DataFrame:
    tune(spark)
    # coalesce(1): 5 molecules across 32 default partitions explode
    # into thousands of empty tasks through the downstream self-joins;
    # a fixture-sized input belongs in one partition.
    name_map = F.create_map(
        *[F.lit(x) for name, smi in EXAMPLES for x in (smi, name)]
    )
    mols = parse_molecules(spark, [smi for _, smi in EXAMPLES]).coalesce(1)
    return mols.filter("valid").withColumn("name", name_map[F.col("smiles")])


#: Per-session cache of the checkpointed fixture subgraph relation —
#: the three chem queries share one Python stage instead of three.
#: Keyed by a WeakKeyDictionary on the session object itself: a stopped
#: and garbage-collected SparkSession drops its entry, so a new session
#: reusing the same id() can never receive a DataFrame bound to a dead
#: session.
_SG_CACHE: "weakref.WeakKeyDictionary[SparkSession, DataFrame]" = weakref.WeakKeyDictionary()


def _fixture_subgraphs(spark: SparkSession) -> DataFrame:
    """(parent=NAME, subgraph_hash, size, n_edges, adjacency,
    parent_atoms), parse+enumerate fused into one mapInPandas pass and
    localCheckpoint-ed once per session."""
    tune(spark)
    if spark not in _SG_CACHE:
        _SG_CACHE[spark] = named_molecule_subgraphs(spark, EXAMPLES).localCheckpoint()
    return _SG_CACHE[spark]


def chem_subgraph_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique connected subgraphs (size >=2, WL-deduped) per fixture
    molecule — G6 through the fused mapInPandas UDTF."""
    sg = _fixture_subgraphs(spark)
    return (
        sg.groupBy(F.col("parent").alias("name"))
        .agg(F.count(F.lit(1)).alias("n_subgraphs"))
        .orderBy("name")
    )


CHEM_SUBGRAPH_COUNTS_SQL = """
SELECT * FROM (VALUES
  ('Butane', 3), ('Cyclobutane', 3), ('Hexane', 5),
  ('Isopentane', 5), ('Neopentane', 4)
) AS t(name, n_subgraphs)
ORDER BY name
"""


def chem_tanimoto_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tanimoto + approx GED for all C(5,2)=10 fixture pairs (the
    reference's all-pairs demo, mcs.py:744-751) via the join/agg
    pipeline — no per-pair Python loop."""
    sg = _fixture_subgraphs(spark)
    atoms = sg.groupBy("parent").agg(F.first("parent_atoms").alias("n_atoms"))
    metrics = pairwise_overlap_metrics(
        sg, atoms.select(F.col("parent").alias("smiles"), "n_atoms")
    )
    return metrics.select(
        "mol_a", "mol_b", "n_shared", "n_union",
        F.floor(F.col("tanimoto") * 1000 + 0.5).alias("tanimoto_mbp"),
        F.floor(F.col("ged_approx") * 1000 + 0.5).alias("ged_approx_mbp"),
    ).orderBy("mol_a", "mol_b")


# Golden values derived by executing the verified implementation over
# all 10 pairs (anchors cross-checked in FIXTURES.md §2.1).
CHEM_TANIMOTO_SQL = """
SELECT * FROM (VALUES
  ('Butane', 'Cyclobutane', 2, 4, 500, 1333),
  ('Butane', 'Hexane', 3, 5, 600, 0),
  ('Butane', 'Isopentane', 3, 5, 600, 0),
  ('Butane', 'Neopentane', 2, 5, 400, 1667),
  ('Cyclobutane', 'Hexane', 2, 6, 333, 2000),
  ('Cyclobutane', 'Isopentane', 2, 6, 333, 1667),
  ('Cyclobutane', 'Neopentane', 2, 5, 400, 1667),
  ('Hexane', 'Isopentane', 3, 7, 429, 2400),
  ('Hexane', 'Neopentane', 2, 7, 286, 3000),
  ('Isopentane', 'Neopentane', 3, 6, 500, 1250)
) AS t(mol_a, mol_b, n_shared, n_union, tanimoto_mbp, ged_approx_mbp)
ORDER BY mol_a, mol_b
"""


def chem_subgraph_catalog_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog the fixture corpus (G7 -> S6 aggregation) and histogram
    distinct subgraph hashes by size — 9 unique subgraphs across the 5
    molecules."""
    sg = _fixture_subgraphs(spark)
    cat = subgraph_catalog(sg)
    return (
        cat.groupBy("size")
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.sum("frequency").alias("total_observations"),
            F.sum(F.size("parent_molecules")).alias("total_parents"),
        )
        .orderBy("size")
    )


CHEM_CATALOG_SQL = """
SELECT * FROM (VALUES
  (2, 1, 5, 5), (3, 1, 5, 5), (4, 3, 6, 6), (5, 3, 3, 3), (6, 1, 1, 1)
) AS t(size, n_hashes, total_observations, total_parents)
ORDER BY size
"""


def chem_exact_ged_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact graph edit distance (F16, /root/reference/src/mcs.py:338–346)
    for all C(5,2)=10 fixture pairs — branch-and-bound over injective
    node mappings inside one mapInPandas pass, size-guarded exactly
    like the reference's try/except contract (None when skipped).
    No SQL oracle (exponential graph algorithm): driver rows-only check;
    tests/test_chem.py pins hand-verified cases."""
    import pandas as pd

    tune(spark)
    from itertools import combinations

    from molgraphdb_spark.functions.literals import literal_df

    pair_rows = [
        (na, sa, nb, sb) for (na, sa), (nb, sb) in combinations(EXAMPLES, 2)
    ]

    def gen(batches):
        from molgraphdb_spark.chem.mol import parse_smiles
        from molgraphdb_spark.chem.subgraphs import exact_ged

        for pdf in batches:
            rows = []
            for na, sa, nb, sb in zip(pdf["na"], pdf["sa"], pdf["nb"], pdf["sb"]):
                g = exact_ged(parse_smiles(sa), parse_smiles(sb))
                rows.append((na, nb, None if g is None else float(g)))
            yield pd.DataFrame(rows, columns=["mol_a", "mol_b", "exact_ged"])

    return (
        literal_df(spark, pair_rows, ["na", "sa", "nb", "sb"])
        .coalesce(1)
        .mapInPandas(gen, schema="mol_a string, mol_b string, exact_ged double")
        .orderBy("mol_a", "mol_b")
    )


def chem_edit_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-graph construction (G9) from the simple seeds
    (main.py:377–380) to a fixed point at depth 3: per-wave novelty via
    anti-joins, lineage cut per wave. Emits the resulting graph's
    summary row. No SQL oracle (iterative, non-relational) — driver
    runs the rows-only check; tests/test_chem.py pins semantics."""
    tune(spark)
    edges, vertices = expand_relations(spark, EDIT_SEEDS, depth=3)
    # Single-job summary: no driver-side actions here — both aggregates
    # and the vertex count land in one plan the driver collects once.
    stats = edges.select(
        F.countDistinct("src").alias("unique_molecules"),
        F.count(F.lit(1)).alias("n_edges"),
    )
    nv = vertices.select(F.count(F.lit(1)).alias("n_vertices"))
    return stats.crossJoin(nv)


QUERIES = {
    "chem_subgraph_counts": chem_subgraph_counts,
    "chem_tanimoto_pairs": chem_tanimoto_pairs,
    "chem_subgraph_catalog_hist": chem_subgraph_catalog_hist,
    "chem_edit_expansion": chem_edit_expansion,
    "chem_exact_ged_pairs": chem_exact_ged_pairs,
}

ORACLES = {
    "chem_subgraph_counts": CHEM_SUBGRAPH_COUNTS_SQL,
    "chem_tanimoto_pairs": CHEM_TANIMOTO_SQL,
    "chem_subgraph_catalog_hist": CHEM_CATALOG_SQL,
}
