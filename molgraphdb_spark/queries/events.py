"""Event-table queries: time windows, JSON extraction, sessionization.

The reference has no time/date surface (SURVEY.md §2.8 "Date/time
functions: none") and no streaming (§2.10); these queries define the
batch semantics that the streaming module (molgraphdb_spark.streaming)
reuses verbatim — the same ``window()`` aggregation runs under
``readStream`` with a watermark.

Scale notes: tumbling-window aggs shuffle once on (window, key);
sessionization via gaps-and-islands is one window shuffle on user_id —
both hold at 100 TB with time-partitioned input (partition pruning on
the ts predicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from molgraphdb_spark.session import tune
from molgraphdb_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events, normalizing ``ts`` to Spark's microsecond
    TIMESTAMP regardless of how the parquet writer encoded it.

    The driver has shipped this table in two formats so far, and the
    reader must accept both (plus the trivial third):

    - INT64 TIMESTAMP(NANOS): Spark's vectorized reader rejects it
      ([PARQUET_TYPE_ILLEGAL]) unless ``nanosAsLong`` maps it to
      bigint; we then floor-divide to micros — the same µs truncation
      DuckDB applies for parquet ns, so both engines see identical
      instants.
    - µs TIMESTAMP_NTZ (``isAdjustedToUTC=false``): Spark infers
      ``timestamp_ntz``; the session timezone is pinned UTC (see
      :func:`molgraphdb_spark.session.tune`), so the NTZ→TZ cast is
      instant-preserving and matches DuckDB's naive-as-UTC reading.
    - µs TIMESTAMP (UTC-adjusted): already what we want; no-op.
    """
    tune(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    dtype = dict(ev.dtypes).get("ts")
    if dtype == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def events_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event_type (batch form of the
    streaming tumbling-window agg)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY hour, event_type
"""


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window via ``F.window`` — the exact expression
    Structured Streaming uses; exposed here in batch so the oracle can
    check it (window start == floor(epoch/300)*300)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


EVENTS_TUMBLING_SQL = """
SELECT make_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) * 1000000) AS window_start,
       event_type, COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 analogue: JSON decode at the boundary (reference smuggles
    nested data through TEXT, mcs.py:138–139; here props is a JSON
    string column)."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        )
        .filter(F.col("prop_k").isNotNull())
    )


EVENTS_JSON_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap, as
    gaps-and-islands (lag + conditional cumulative sum). This is the
    batch-checkable twin of ``session_window()`` in streaming.
    Session id = (user_id, session_seq); emits per-session stats."""
    ev = _events(spark, sf_dir)
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap in microseconds (unix_micros) so the 30-min threshold compares
    # at full timestamp precision on both engines (DuckDB: epoch_us).
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(by_user)
    new_session = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    sessions = ev.withColumn("new_s", new_session).withColumn(
        "session_seq", F.sum("new_s").over(by_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Emit epoch-µs longs, not raw timestamps: the only r1
            # hash-mismatch came from sub-µs isoformat drift between
            # Spark's ns→µs floor and the driver's TIMESTAMP_NS path.
            # Integer micros are normalizer-proof (same rule the rest
            # of the module applies).
            F.unix_micros(F.min("ts")).alias("session_start_us"),
            F.unix_micros(F.max("ts")).alias("session_end_us"),
        )
        .orderBy("user_id", "session_seq")
    )


EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us
FROM numbered
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def events_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: lag/lead value deltas per user."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        (F.lead("value").over(w) - F.col("value")).alias("delta_next"),
    )


EVENTS_LAG_LEAD_SQL = """
SELECT user_id, event_id,
       value - LAG(value) OVER w AS delta_prev,
       LEAD(value) OVER w - value AS delta_next
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def funnel_stages(ev: DataFrame) -> DataFrame:
    """Per-user funnel stage relation: (user_id, view_ts, click_ts,
    purchase_ts) — first view, first click AFTER that view, first
    purchase AFTER that click. Shared by the batch query below and the
    streaming twin's equality test (streaming/windows.py::
    funnel_stage_stream must reproduce exactly this table)."""
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "view_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "click_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("view_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("click_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return staged.groupBy("user_id").agg(
        F.max("view_ts").alias("view_ts"),
        F.max("click_ts").alias("click_ts"),
        F.max("purchase_ts").alias("purchase_ts"),
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged funnel analysis: per user, the first view, the first
    click AFTER that view, the first purchase AFTER that click —
    ordered-sequence matching, the canonical event-analytics op that a
    naive self-join cubes. Three conditional-min window passes over
    the SAME user_id partitioning (one shuffle total — Spark reuses
    the exchange/sort for identical window specs), then a global
    rollup of stage-reach counts with a basis-point conversion."""
    per_user = funnel_stages(_events(spark, sf_dir))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("view_ts").isNotNull().cast("long")).alias("n_view"),
        F.sum(F.col("click_ts").isNotNull().cast("long")).alias("n_view_click"),
        F.sum(F.col("purchase_ts").isNotNull().cast("long")).alias("n_full_funnel"),
        # Zero guard: with no 'view' rows at all the divisor is 0 —
        # unguarded, Spark yields NULL while DuckDB computes 0/0 = NaN
        # and diverges at floor+CAST. Both sides pin the result to NULL
        # (oracle uses NULLIF(..., 0)).
        F.when(
            F.sum(F.col("view_ts").isNotNull().cast("long")) > 0,
            F.floor(
                F.sum(F.col("purchase_ts").isNotNull().cast("long"))
                * 10000.0
                / F.sum(F.col("view_ts").isNotNull().cast("long"))
                + 0.5
            ).cast("long"),
        ).alias("conversion_bp"),
    )


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'view' THEN ts END)
             OVER (PARTITION BY user_id) AS view_ts
  FROM events
), c AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > view_ts THEN ts END)
            OVER (PARTITION BY user_id) AS click_ts
  FROM v
), p AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > click_ts THEN ts END)
            OVER (PARTITION BY user_id) AS purchase_ts
  FROM c
), u AS (
  SELECT user_id, MAX(view_ts) AS view_ts, MAX(click_ts) AS click_ts,
         MAX(purchase_ts) AS purchase_ts
  FROM p GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN view_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(SUM(CASE WHEN purchase_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel,
       CAST(floor(SUM(CASE WHEN purchase_ts IS NOT NULL THEN 1 ELSE 0 END) * 10000.0
                  / NULLIF(SUM(CASE WHEN view_ts IS NOT NULL THEN 1 ELSE 0 END), 0) + 0.5) AS BIGINT) AS conversion_bp
FROM u
"""


# --------------------------------------------------------------------------
# Event-type Markov transition matrix: sequence-modeling prep.
# --------------------------------------------------------------------------
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types over each
    user's time-ordered stream — the behavioral summary that feeds
    next-action models and surfaces broken funnels (a fat
    error→error diagonal) without training anything.

    One shuffle on user_id (the lag window), then a map-side-combined
    count on the tiny (from, to) key space; probabilities are integer
    basis points of the from-type's outgoing total (exact integer
    division). Ties in event ordering resolve by event_id — the
    repo-wide total-order rule."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_from = Window.partitionBy("from_type")
    return (
        counts.withColumn("row_total", F.sum("n").over(w_from))
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("n * 10000 DIV row_total").cast("long").alias("p_bp"),
        )
        .orderBy("from_type", "to_type")
    )


EVENTS_MARKOV_SQL = """
WITH p AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
), c AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM p WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_bp
FROM c
ORDER BY from_type, to_type
"""


# --------------------------------------------------------------------------
# DAU / trailing-WAU stickiness: the engagement ratio.
# --------------------------------------------------------------------------
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day weekly actives, and the
    DAU/WAU stickiness ratio per day — the engagement health metric
    every product pipeline tracks (stickiness → 10000 bp means daily
    habit; → ~1400 bp means weekly visits).

    Exact trailing-window DISTINCT users cannot ride a window frame
    (COUNT(DISTINCT) OVER RANGE isn't supported in either engine), so
    the WAU side is the day-spine pattern: the tiny distinct-day
    relation broadcast-joins the (day, user) relation on the 7-day
    band, then one countDistinct per day — cost |days|·7·DAU rows,
    independent of raw event volume after the first distinct."""
    ev = _events(spark, sf_dir)
    ud = ev.select(
        F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    # localCheckpoint (NOT cache): referenced by the DAU agg, the spine,
    # and the band join; frees on GC instead of pinning the CacheManager
    # across queries in a long-lived session (r6 advice)
    ud = ud.localCheckpoint()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    days = ud.select("d").distinct()
    band = F.broadcast(days.select(F.col("d").alias("day"))).join(
        ud,
        (F.col("d") <= F.col("day")) & (F.col("d") >= F.date_sub(F.col("day"), 6)),
    )
    wau = band.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, dau.d == wau.day)
        .select(
            F.unix_micros("d").alias("day_us"),
            "dau",
            "wau",
            F.expr("dau * 10000 DIV wau").cast("long").alias("stickiness_bp"),
        )
        .orderBy("day_us")
    )


EVENTS_DAU_WAU_SQL = """
WITH ud AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events),
dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
days AS (SELECT DISTINCT d AS day FROM ud),
wau AS (
  SELECT days.day, COUNT(DISTINCT ud.user_id) AS wau
  FROM days JOIN ud ON ud.d <= days.day AND ud.d >= days.day - INTERVAL 6 DAY
  GROUP BY days.day
)
SELECT epoch_us(dau.d) AS day_us, CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       CAST(dau.dau * 10000 // wau.wau AS BIGINT) AS stickiness_bp
FROM dau JOIN wau ON wau.day = dau.d
ORDER BY day_us
"""


# --------------------------------------------------------------------------
# VARIANT-typed semi-structured path (Spark 4's open JSON type).
# --------------------------------------------------------------------------
def events_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type stats over a VARIANT-typed property: ``props`` parses
    ONCE into Spark 4's binary VARIANT encoding (``parse_json``) and
    fields extract via ``variant_get`` path expressions — the
    schema-on-read path for semi-structured columns that, unlike
    per-field ``get_json_object``, re-parses nothing per extraction
    and keeps the encoded value shreddable at the storage layer (the
    Parquet VARIANT spec). At 100 TB this is how freeform properties
    ride a typed pipeline without a schema migration per new key.

    The oracle reaches the same numbers through DuckDB's JSON
    extraction — the engines' different physical encodings must agree
    on the logical values (the point of an open type). Cast
    semantics are normalized on BOTH sides to try-cast (r6 advice):
    Spark ``try_variant_get(...,'int')`` nulls out an uncastable
    value, and the oracle's TRY_CAST does the same, so a stray
    ``"1.5"`` / ``"true"`` in props.k drops from both engines
    identically instead of crashing the oracle. (The generator emits
    integer k only; the normalization removes the data assumption.)"""
    ev = _events(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").cast("int").alias("k_min"),
            F.max("k").cast("int").alias("k_max"),
            F.count_distinct("k").cast("long").alias("k_distinct"),
        )
        .orderBy("event_type")
    )


EVENTS_VARIANT_SQL = """
WITH e AS (
  SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       CAST(MIN(k) AS INT) AS k_min,
       CAST(MAX(k) AS INT) AS k_max,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS k_distinct
FROM e
WHERE k IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Error-rate window flags: the ops burn-rate alarm.
# --------------------------------------------------------------------------
ERROR_RATE_ALARM_BP = 2000  #: flag windows where >20% of events error


def events_error_rate_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 15-minute window: event volume, error count, error share in
    basis points, and the alarm flag — the burn-rate window an
    SRE-style monitor evaluates (only windows that HAVE events exist;
    silence is a different alarm, covered by events_gap_fill).

    One shuffle on the window key with map-side combine; the share is
    exact integer division."""
    ev = _events(spark, sf_dir)
    win = (F.floor(F.unix_micros("ts") / (900 * 1_000_000)) * 900).cast("long")
    return (
        ev.select(win.alias("win_start_s"), "event_type")
        .groupBy("win_start_s")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long"))
            .cast("long")
            .alias("n_errors"),
        )
        .select(
            "win_start_s",
            "n_events",
            "n_errors",
            F.expr("n_errors * 10000 DIV n_events").cast("long").alias("error_bp"),
        )
        .withColumn(
            "alarm", (F.col("error_bp") >= ERROR_RATE_ALARM_BP).cast("int")
        )
        .orderBy("win_start_s")
    )


EVENTS_ERROR_RATE_SQL = f"""
WITH w AS (
  SELECT CAST(floor(epoch_us(ts) / (900 * 1000000)) * 900 AS BIGINT) AS win_start_s,
         event_type
  FROM events
), g AS (
  SELECT win_start_s, COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
  FROM w GROUP BY win_start_s
)
SELECT win_start_s, n_events, n_errors,
       CAST(n_errors * 10000 // n_events AS BIGINT) AS error_bp,
       CAST(n_errors * 10000 // n_events >= {ERROR_RATE_ALARM_BP} AS INT) AS alarm
FROM g
ORDER BY win_start_s
"""


# --------------------------------------------------------------------------
# Exact per-type value percentiles: the ops latency-SLO table.
# --------------------------------------------------------------------------
LATENCY_PCTS_BP = [5000, 9500, 9900]


def events_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p50/p95/p99 of ``value`` per event type — the
    latency-SLO table an ops dashboard quotes, deterministic to the
    micro-unit (no t-digest error bound): the p-th percentile of a
    type with n events is the value at per-type rank ⌈p·n⌉ under the
    total order (value, event_id).

    Scale shape: event types are FEW and each grows with the corpus —
    the textbook per-group funnel — so the per-type rank rides
    with_grouped_order_stats (operators/ranking.py: one global range
    order over (type, value, id), broadcast per-type offsets; no task
    ever holds a whole type). The three target ranks come from an
    exploded literal list and one integer-DIV filter."""
    from molgraphdb_spark.operators.ranking import with_grouped_order_stats

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias("value_u"),
    )
    ranked = with_grouped_order_stats(
        base,
        ["event_type"],
        [F.asc("value_u"), F.asc("event_id")],
        rank_col="_rn",
        count_col="_n",
    )
    pcts = F.explode(
        F.array(*[F.lit(p).cast("long") for p in LATENCY_PCTS_BP])
    ).alias("pct_bp")
    return (
        ranked.select("event_type", "value_u", "_rn", "_n", pcts)
        # ceil(p·n) in POSITIVE-operand form: Spark DIV and DuckDB //
        # truncate toward zero, so -((-a) DIV b) floors instead of
        # ceiling — (a + 9999) DIV 10000 is exact ceil for positives
        .filter(F.expr("_rn = (pct_bp * _n + 9999) DIV 10000"))
        .select(
            "event_type",
            "pct_bp",
            F.col("_rn").cast("long").alias("rank_i"),
            F.col("_n").cast("long").alias("n_events"),
            "value_u",
        )
        .orderBy("event_type", "pct_bp")
    )


EVENTS_LATENCY_PCTL_SQL = f"""
WITH e AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_u
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT event_type, value_u,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY value_u ASC, event_id ASC) AS BIGINT) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e
), t AS (SELECT UNNEST(ARRAY{LATENCY_PCTS_BP}) AS pct_bp)
SELECT r.event_type, CAST(t.pct_bp AS BIGINT) AS pct_bp,
       CAST(r.i AS BIGINT) AS rank_i, CAST(r.n AS BIGINT) AS n_events,
       r.value_u
FROM t JOIN r ON r.i = (t.pct_bp * r.n + 9999) // 10000
ORDER BY event_type, pct_bp
"""


QUERIES = {
    "events_latency_percentiles": events_latency_percentiles,
    "events_hourly_counts": events_hourly_counts,
    "events_tumbling_window": events_tumbling_window,
    "events_json_extract": events_json_extract,
    "events_sessionize": events_sessionize,
    "events_lag_lead_delta": events_lag_lead_delta,
    "events_funnel": events_funnel,
    "events_markov_transitions": events_markov_transitions,
    "events_dau_wau": events_dau_wau,
    "events_variant_stats": events_variant_stats,
    "events_error_rate_windows": events_error_rate_windows,
}

ORACLES = {
    "events_latency_percentiles": EVENTS_LATENCY_PCTL_SQL,
    "events_hourly_counts": EVENTS_HOURLY_SQL,
    "events_tumbling_window": EVENTS_TUMBLING_SQL,
    "events_json_extract": EVENTS_JSON_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_lag_lead_delta": EVENTS_LAG_LEAD_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_markov_transitions": EVENTS_MARKOV_SQL,
    "events_dau_wau": EVENTS_DAU_WAU_SQL,
    "events_variant_stats": EVENTS_VARIANT_SQL,
    "events_error_rate_windows": EVENTS_ERROR_RATE_SQL,
}
