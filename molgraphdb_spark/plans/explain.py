"""Physical-plan inspection helpers (SURVEY.md §4): programmatic access
to the properties we design for — predicate pushdown, column pruning,
broadcast joins, whole-stage codegen spans, shuffle counts — so tests
can ASSERT the plan is the plan we want, not just that results match.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_summary(df: DataFrame) -> dict:
    """Parse the formatted physical plan into the scale-relevant facts."""
    plan = formatted_plan(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols: set[str] = set()
    for rs in read_schemas:
        for fieldspec in rs.split(","):
            if ":" in fieldspec:
                read_cols.add(fieldspec.split(":")[0].strip())
    def n_nodes(name: str) -> int:
        # formatted explain shows each node in the tree AND as a
        # numbered detail header — count only the headers
        return len(re.findall(rf"^\(\d+\) {name}", plan, re.M))

    return {
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_columns": sorted(read_cols),
        "n_scans": n_nodes("Scan parquet"),
        "n_exchanges": n_nodes("Exchange"),
        "n_broadcast_joins": n_nodes("BroadcastHashJoin"),
        "n_sortmerge_joins": n_nodes("SortMergeJoin"),
        "has_python_worker": "BatchEvalPython" in plan or "ArrowEvalPython" in plan,
        "plan": plan,
    }
