"""Full-registry plan-build smoke: every registered query must at least
ANALYZE against the current testdata.

Round 3's lesson: the driver regenerated events.parquet with a new
timestamp encoding between rounds, and three queries that were green in
round 2 (and therefore rotated out of round 3's 50-entry verification
window) broke without any code change. Rotation policy can only reason
about code staleness; this gate covers environment staleness.

Cost: plan-build only — ``fn(spark, sf_dir).schema`` forces analysis
(footer reads + Catalyst resolution) but runs no job, so the whole
81-query sweep is seconds, not minutes. Any AnalysisException (missing
column, type mismatch, rejected parquet type) fails here the round it
appears, not the round the rotation window happens to revisit it.
"""

from __future__ import annotations

import pytest

from molgraphdb_spark.registry import all_oracles, all_queries

QUERIES = all_queries()


#: The registry-wide funnel ban (r6 verdict item 2, closed round 7):
#: NO query's physical plan may contain a partitionless (or global-
#: unordered) Window node — the single-partition funnel. Audited to
#: zero across all 179 queries after the ranking-operator rewrites;
#: any future query needing a global order must go through
#: operators/ranking.py. A query may be allowlisted here ONLY with a
#: proof its windowed relation is bounded (none currently qualifies —
#: the bounded windows that remain, e.g. doc_lang_confusion's
#: confusion-matrix rollup, are partitioned or unordered and pass the
#: detector as-is).
FUNNEL_ALLOWLIST: set[str] = set()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_builds(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.schema is not None and len(df.schema.fields) > 0
    if name not in FUNNEL_ALLOWLIST:
        from molgraphdb_spark.plans.explain import n_partitionless_windows

        assert n_partitionless_windows(df) == 0, (
            f"{name}: partitionless Window funnel — use operators/ranking.py"
        )


def test_priority_window_names_are_real():
    """A typo in _PRIORITY silently drops the entry from the first-50
    verification window (reorder keeps only names present in the
    registry) — exactly the kind of quiet coverage shrink the rotation
    policy can't see."""
    from molgraphdb_spark.registry import _PRIORITY

    unknown = sorted(set(_PRIORITY) - set(QUERIES))
    assert unknown == [], f"_PRIORITY entries not in registry: {unknown}"
    assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate _PRIORITY entries"
    assert len(_PRIORITY) <= 50, "window overflow: driver verifies only first 50"


#: Queries that are rows-only ON PURPOSE (iterative fixpoints with no
#: single-statement SQL twin; correctness pinned by golden suites).
#: Anything else missing an oracle is a silent downgrade — still fails.
#: r9: empty — graph_kcore_summary (the last rows-only entry) gained a
#: recursive-CTE peel oracle; the registry is now 100% value-hash
#: checked. Kept as a set so a future genuinely-non-SQL query has a
#: place to declare itself.
ROWS_ONLY_BY_DESIGN: set[str] = set()


def test_every_query_has_oracle():
    """The driver's strong (value-hash) gate needs an oracle per query;
    a registry entry silently missing its oracle downgrades to the weak
    rows-only check without anyone noticing."""
    missing = sorted(set(QUERIES) - set(all_oracles()) - ROWS_ONLY_BY_DESIGN)
    assert missing == [], f"queries without oracle SQL: {missing}"
    assert ROWS_ONLY_BY_DESIGN <= set(QUERIES)
