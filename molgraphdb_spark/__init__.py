"""molgraphdb_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference Tom271/MolGraphDB (a SQLite-backed molecular edit-graph +
subgraph-overlap GED calculator), re-expressed Spark-first:

- Relational core: DataFrame/SQL over Parquet (SURVEY.md §2.1–2.8).
- Graph layer: edge-table DataFrame + iterative BFS shortest path
  (reference main.py:272–305), designed as batch analytics, not OLTP.
- Chemistry layer: pure-Python molecular-graph model (reference
  src/mcs.py 27–346) behind Arrow-batched pandas UDFs / mapInPandas —
  RDKit is not available in this environment, so a graph-theoretic
  model is used: element-labeled graphs with bond orders, a SMILES
  subset wide enough for the reference's own demo molecules (aromatic
  rings, brackets, charges; chem/mol.py), and WL-hash identity.
- Scale extensions: dedup (exact / MinHash-LSH / SimHash / n-gram
  Jaccard / embedding cosine), similarity search, text analysis,
  multimodal binary columns, Structured Streaming windows.

Everything is built on public PySpark APIs only.
"""

__version__ = "0.1.0"
