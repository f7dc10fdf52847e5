"""Isolated per-query timer with the bench's exact methodology (cold
catalog cache per run, noop sink, median + min of N runs) — guide §1.1's
empirical loop for single queries without paying a full registry sweep.

    python tools/qtime.py [sf_dir] [-n RUNS] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from molgraphdb_spark.registry import all_queries
from molgraphdb_spark.session import get_spark, tune


def main() -> int:
    args = sys.argv[1:]
    n_runs = 5
    if "-n" in args:
        i = args.index("-n")
        n_runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    spark = get_spark("qtime")
    tune(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Same steady-state warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()

    def _boot(it):
        import molgraphdb_spark.chem.mol  # noqa: F401

        yield from it

    spark.range(32).repartition(32).mapInPandas(_boot, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()
    qs = all_queries()
    for name in args:
        fn = qs.get(name)
        if fn is None:
            print(f"{name}: NOT REGISTERED")
            continue
        spark.sparkContext.setJobDescription(f"qtime: {name}")
        runs = []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        runs.sort()
        med = runs[len(runs) // 2]
        print(
            f"{name}: median={med:.3f}s min={runs[0]:.3f}s max={runs[-1]:.3f}s "
            f"n={len(runs)} all={[round(r, 3) for r in runs]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
