"""Dump the UNCUT pagerank loop plan — measurement-only tool.

localCheckpoint is monkeypatched to identity so the returned DataFrame
carries the FULL n_iter-iteration lazy plan; the committed before/after
pair (plans/r15/pagerank_loop_{before,after}.txt) then shows the
per-iteration shape the final registry plan hides behind
Scan ExistingRDD: the r14 operator re-evaluates the 2x|E|-row vertex
union-distinct (one extra Aggregate pair per iteration's re-attach
join) and scans a second materialized 'weighted' edge relation; the
r15 operator re-attaches against the single materialized verts_w
relation. NOT on any query/bench path.

    python tools/qplan_pagerank_loop.py [sf_dir] [-o OUT] [-n N_ITER]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame


def main() -> int:
    args = sys.argv[1:]
    out = None
    n_iter = 2
    if "-o" in args:
        i = args.index("-o")
        out = args[i + 1]
        del args[i : i + 2]
    if "-n" in args:
        i = args.index("-n")
        n_iter = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"

    # identity checkpoint: keep the whole loop lazy so the plan is
    # visible (patch the CLASSIC runtime class — Spark 4's
    # pyspark.sql.DataFrame re-export is the abstract parent and the
    # instance method resolves on the subclass)
    DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF

        _CDF.localCheckpoint = lambda self, eager=True: self  # type: ignore[method-assign]
    except ImportError:
        pass

    from molgraphdb_spark.operators.graph import pagerank
    from molgraphdb_spark.queries.graph_queries import purchase_edges
    from molgraphdb_spark.session import get_spark, tune

    spark = get_spark("qplan-pagerank-loop")
    tune(spark)
    df = pagerank(purchase_edges(spark, sf_dir), n_iter=n_iter)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    if out:
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
    else:
        print(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
