"""Cross-engine integer-division edge cases (r9 ADVICE items).

Spark's ``DIV`` and DuckDB's ``//`` both truncate toward zero
(measured: DuckDB ``-7 // 2 = -3``), while Python's ``//`` — the third
implementation in every golden — floors. For non-negative operands all
three agree; a negative sum silently splits Python from the two
engines. The fix pins FLOOR semantics explicitly on both engines via a
pmod-style remainder (``(a - pmod(a, b)) DIV b``). These tests plant
the divergent inputs — a negative-mean event type for CUSUM, a
whitespace-only-language corpus (SUM(bpe) = 0 divisor) for token
fertility — and assert full value-hash parity between the Spark query
and its DuckDB oracle, plus the sequential plain-Python CUSUM.
"""

from __future__ import annotations

import math
import os
import random
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from parity import value_hash  # noqa: E402


def _compare(spark_df, con, sql):
    scols = spark_df.columns
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows)
    assert sorted(scols) == sorted(dcols)
    assert value_hash(scols, srows) == value_hash(dcols, drows)
    return srows


def test_cusum_negative_mean_matches_oracle_and_python(spark, tmp_path_factory):
    # Type "debit" has strictly negative values, so sx < 0 and every
    # division in mu/k must FLOOR on both engines to match the Python
    # recurrence (the old `sx DIV n` / `sx // n` pair truncated and
    # silently diverged from any floor-based recompute here).
    from molgraphdb_spark.queries.temporal import (
        EVENTS_CUSUM_SQL,
        events_cusum_alarms,
    )

    path = str(tmp_path_factory.mktemp("cusum_neg"))
    rng = random.Random(7)
    rows = []
    eid = 0
    for i in range(300):
        for typ, base in (("debit", -10.0), ("credit", 10.0)):
            # debit drifts upward (toward zero) halfway through: the
            # one-sided upward CUSUM must alarm on a negative-mean
            # stream too.
            lvl = base if typ == "credit" or i < 150 else base + 5.0
            rows.append(
                (
                    eid,
                    1_600_000_000_000_000 + i * 60_000_000,
                    eid % 5,
                    typ,
                    round(lvl + rng.uniform(-0.5, 0.5), 2),
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

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/events.parquet/*.parquet')"
    )
    got_rows = _compare(events_cusum_alarms(spark, path), con, EVENTS_CUSUM_SQL)
    got = {r[0]: tuple(r[1:]) for r in got_rows}

    # Third implementation: Page's recurrence directly, Python // floors.
    by_type: dict[str, list[tuple[int, int, int]]] = {}
    for eid_, ts_us, _u, typ, v, _p in rows:
        by_type.setdefault(typ, []).append(
            (ts_us, eid_, math.floor(v * 1e6 + 0.5))
        )
    expect = {}
    for typ, evs in by_type.items():
        evs.sort()
        xs = [x for _t, _e, x in evs]
        mu = sum(xs) // len(xs)          # floor division, sign-safe
        k = mu // 20
        d, h = mu + k, k * 5
        s, alarms, mx = 0, 0, None
        for x in xs:
            s = max(0, s + (x - d))
            mx = s if mx is None else max(mx, s)
            if s > h:
                alarms += 1
        expect[typ] = (len(xs), alarms, mx, mu, h)
    assert got == expect
    assert got["debit"][1] > 0    # planted drift alarms on negative mean
    # sanity: the divergence is real — truncation would give a different mu
    sx = sum(x for _t, _e, x in by_type["debit"])
    n = len(by_type["debit"])
    assert sx < 0 and sx // n != int(sx / n)


def test_fertility_whitespace_only_language(spark, tmp_path_factory):
    # Language "ws" has only whitespace text: SUM(bpe) = 0 — the old
    # unguarded divisor was NULL on Spark's DIV but a hard
    # division-by-zero on DuckDB. GREATEST(·,1) pins ratio 0 on both.
    from molgraphdb_spark.queries.text import (
        LANG_FERTILITY_SQL,
        lang_token_fertility,
    )

    path = str(tmp_path_factory.mktemp("fert_ws"))
    rows = [
        (0, "plain words stay whole", "en", "s0"),
        (1, "more plain words here", "en", "s0"),
        (2, "   \t  \n  ", "ws", "s0"),
        (3, " \n\n\t ", "ws", "s0"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/documents.parquet/*.parquet')"
    )
    got_rows = _compare(lang_token_fertility(spark, path), con, LANG_FERTILITY_SQL)
    got = {r[0]: tuple(r[1:]) for r in got_rows}
    assert got["ws"][2] == 0          # n_bpe_tokens
    assert got["ws"][4] == 0          # fertility_bp: 0, not NULL/error
    assert got["ws"][5] == 0          # chars_per_bpe_milli
    assert got["en"][4] >= 10000      # real language unaffected by guard
