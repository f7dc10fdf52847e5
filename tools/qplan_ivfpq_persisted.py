"""Dump the formatted plan of ivfpq_search over a PERSISTED index (the
deployment shape whose rerank source round 14 changed) — evidence writer
for plans/r14/ivfpq_persisted_search_{before,after}.txt.

    python tools/qplan_ivfpq_persisted.py [sf_dir] OUTFILE
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from molgraphdb_spark.operators.kmeans import kmeans_fit
from molgraphdb_spark.operators.pq import (
    ivfpq_index,
    ivfpq_search,
    pq_train,
    read_ivfpq_index,
    write_ivfpq_index,
)
from molgraphdb_spark.session import get_spark, tune


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    out = args[0]
    spark = get_spark("qplan-ivfpq-persisted")
    tune(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", F.col("embedding").alias("v"))
    coarse = kmeans_fit(emb, "v", "vec_id", k=8, n_iter=2)
    books = pq_train(emb, "v", "vec_id", m=4, k=16, n_iter=2)
    idx_path = os.path.join(tempfile.gettempdir(), "qplan_ivfpq_idx")
    write_ivfpq_index(ivfpq_index(emb, "v", coarse, books), idx_path)
    loaded = read_ivfpq_index(spark, idx_path)
    qrows = emb.filter(F.col("vec_id") < 3).collect()
    queries = [(r["vec_id"], list(r["v"])) for r in qrows]
    res = ivfpq_search(
        emb, "v", "vec_id", queries, coarse, books, k=3, nprobe=2, indexed=loaded
    )
    plan = res._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        res._jdf.queryExecution(), "formatted"
    )
    with open(out, "w") as fh:
        fh.write(plan)
    n_scans = plan.count("Scan parquet")
    n_pruned = plan.count("PartitionFilters: [cid")
    base = "embeddings.parquet" in plan
    print(f"wrote {out}: scans={n_scans} pruned={n_pruned} base_table_scan={base}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
