"""Temporal join queries over ``events``: as-of join and interval
(range) join — operators absent from the reference (SURVEY.md §2.3
lists them as the extension surface) and from vanilla SQL-92, each
oracle-checked against an equivalent DuckDB window/theta formulation.

Scale notes are on the operators themselves
(molgraphdb_spark.operators.asof): one shuffle per side, no range
explosion, AQE-splittable skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from molgraphdb_spark.operators.asof import asof_join, interval_point_join
from molgraphdb_spark.queries.events import _events


def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the user's most recent click at or
    before the purchase (backward as-of, exact matches allowed; ties
    at equal ts resolve to the largest click event_id), plus the gap
    in microseconds. Purchases with no prior click keep NULLs."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        right_cols=["event_id"],
        tiebreak="event_id",
        suffix="_click",
    )
    return joined.select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("event_id_click").alias("click_id"),
        (F.unix_micros("ts") - F.unix_micros("asof_ts_click")).alias("gap_us"),
    ).orderBy("purchase_id")


EVENTS_ASOF_SQL = """
WITH u AS (
  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'click'
), filled AS (
  SELECT user_id, ts, event_id, side,
         LAST_VALUE(CASE WHEN side = 1 THEN event_id END IGNORE NULLS)
           OVER w AS click_id,
         LAST_VALUE(CASE WHEN side = 1 THEN ts END IGNORE NULLS)
           OVER w AS click_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, side DESC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id AS purchase_id, click_id,
       epoch_us(ts) - epoch_us(click_ts) AS gap_us
FROM filled WHERE side = 0
ORDER BY purchase_id
"""


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks per user falling inside the 5-minute half-open window
    after each error event — an interval join via time-bucket
    equi-join. Errors with zero follow-up clicks are kept (count 0)."""
    ev = _events(spark, sf_dir)
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("start"),
            F.timestamp_micros(F.unix_micros("ts") + 300 * 1_000_000).alias("end"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = interval_point_join(
        errors, clicks, on=["user_id"], bucket_micros=300 * 1_000_000, how="left"
    )
    return (
        joined.groupBy("error_id")
        .agg(F.count("click_id").alias("n_clicks"))
        .orderBy("error_id")
    )


EVENTS_RANGE_SQL = """
SELECT er.event_id AS error_id, COUNT(c.event_id) AS n_clicks
FROM events er
LEFT JOIN events c
  ON c.user_id = er.user_id
 AND c.event_type = 'click'
 AND c.ts >= er.ts
 AND c.ts < er.ts + INTERVAL 5 MINUTE
WHERE er.event_type = 'error'
GROUP BY 1
ORDER BY 1
"""


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series: a generated hour spine (sequence +
    explode) cross-joined with the event-type dimension, left-joined to
    the observed hourly counts so silent hours appear as zeros — the
    date-spine pattern every time-series pipeline needs. The spine is
    generated, never scanned; the only shuffle is the hourly groupBy."""
    ev = _events(spark, sf_dir)
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(hourly, ["hour", "event_type"], "left")
        .select("hour", "event_type", F.coalesce("n_events", F.lit(0)).alias("n_events"))
        .orderBy("hour", "event_type")
    )


EVENTS_GAP_FILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
), types AS (SELECT DISTINCT event_type FROM events)
SELECT s.hour, t.event_type, COALESCE(h.n_events, 0) AS n_events
FROM spine s CROSS JOIN types t
LEFT JOIN hourly h ON h.hour = s.hour AND h.event_type = t.event_type
ORDER BY s.hour, t.event_type
"""


def events_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling: per event-type 15-minute bars with open
    (first value by event time), high, low, close (last value) — the
    canonical timeseries resample, expressed with ``min_by``/``max_by``
    over a (ts, event_id) ordering key (zero-padded string: DuckDB's
    arg_min takes scalar keys only, and lexicographic order over the
    padding equals numeric order) so timestamp ties resolve
    deterministically on both engines. One shuffle on (bar, type);
    values are rounded to 2dp for cross-engine float identity."""
    ev = _events(spark, sf_dir)
    order_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_part"),
            (F.floor(F.minute("ts") / 15) * 15).cast("int").alias("minute_part"),
            "event_type",
        )
        .agg(
            F.round(F.min_by("value", order_key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", order_key), 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            (F.unix_micros("hour_part") + F.col("minute_part").cast("long") * 60_000_000)
            .alias("bar_start_us"),
            "event_type", "open", "high", "low", "close", "n_events",
        )
        .orderBy("bar_start_us", "event_type")
    )


EVENTS_OHLC_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) + (CAST(floor(minute(ts) / 15) * 15 AS BIGINT)) * 60000000 AS bar_start_us,
       event_type,
       ROUND(arg_min(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || lpad(CAST(event_id AS VARCHAR), 12, '0')), 2) AS open,
       ROUND(MAX(value), 2) AS high,
       ROUND(MIN(value), 2) AS low,
       ROUND(arg_max(value, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || lpad(CAST(event_id AS VARCHAR), 12, '0')), 2) AS close,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
ORDER BY bar_start_us, event_type
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 10-minute windows every 5 minutes via
    ``F.window(ts, '10 minutes', '5 minutes')`` — each event lands in
    exactly two windows; the same expression runs incrementally under
    Structured Streaming. Oracle: each event's two window starts are
    floor(epoch/300)*300 and that minus 300, generated by unnest.

    Scale: the window generator doubles rows map-side, then one
    shuffle on (window, type) with partial aggregation — state at
    stream scale is O(open windows x types), bounded by the
    watermark."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


EVENTS_SLIDING_SQL = """
WITH starts AS (
  SELECT event_type,
         unnest([CAST(floor(epoch(ts) / 300) * 300 AS BIGINT),
                 CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT)]) AS start_s
  FROM events
)
SELECT make_timestamp(start_s * 1000000) AS window_start, event_type,
       COUNT(*) AS n_events
FROM starts
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def events_rolling_hour_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE rolling aggregate: per event, the count and mean of
    the same user's events in the trailing hour — RANGE BETWEEN (a
    time interval) rather than ROWS BETWEEN, the window shape ROWS
    can't express when events are irregularly spaced. One shuffle on
    user_id; the frame is evaluated with a sliding-range scan inside
    each partition (no self-join, no explode).

    Micros-integer frame bound on both engines so the hour boundary is
    exact; mean emitted in integer micro-units (floor) for
    cross-engine float identity."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000 + 1, 0)  # (ts - 1h, ts]
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
            F.floor(F.avg("value").over(w) * 1_000_000 + 0.5).cast("long").alias("avg_value_u"),
        )
        .orderBy("event_id")
    )


EVENTS_ROLLING_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(floor(AVG(value) OVER w * 1000000 + 0.5) AS BIGINT) AS avg_value_u
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user — the telemetry/finance
    aggregate where each reading holds until the next one, so sparse
    readings must not be diluted and bursts must not dominate: weight
    = duration to the successor event (the last reading carries no
    weight).

    Determinism engineering: readings become integer micro-units and
    the (value × duration) products accumulate as DECIMAL(38,0) —
    exact, order-free arithmetic, unlike float sums which vary with
    partition reduce order. The single final division is one IEEE
    double op on two exact aggregates, identical in both engines.

    One shuffle on user_id; the lead() window and the groupBy share
    the partitioning."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v_u = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    dur = F.lead(F.unix_micros(F.col("ts"))).over(w) - F.unix_micros(F.col("ts"))
    weighted = ev.select(
        "user_id",
        v_u.alias("v_u"),
        dur.alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur_us").alias("total_dur_us"),
            F.sum(F.col("v_u").cast("decimal(38,0)") * F.col("dur_us")).alias("_sp"),
        )
        .select(
            "user_id",
            "n_intervals",
            "total_dur_us",
            F.floor(F.col("_sp").cast("double") / F.col("total_dur_us"))
            .cast("long")
            .alias("twap_u"),
        )
        .orderBy("user_id")
    )


EVENTS_TWAP_SQL = """
WITH d AS (
  SELECT user_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_u,
         LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS dur_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
       CAST(floor(CAST(SUM(CAST(v_u AS DECIMAL(38,0)) * dur_us) AS DOUBLE)
                  / SUM(dur_us)) AS BIGINT) AS twap_u
FROM d
WHERE dur_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


#: Minimum events per user before the 2-sigma rule applies.
MIN_ANOMALY_N = 5


def events_anomaly_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user statistical outliers: events whose value deviates from
    the user's own mean by more than two population standard
    deviations — the telemetry anomaly flag (fraud spikes, sensor
    glitches, bot bursts) every event pipeline runs.

    Determinism engineering: floats never enter the comparison. With
    integer micro-unit readings, |v - mean| > 2*sigma is equivalent to

        (n*v - S)^2 > 4*(n*Q - S^2)        (multiply through by n^2)

    where S = sum(v_u), Q = sum(v_u^2) over the user's events — all
    exact DECIMAL(38,0) integer arithmetic (HUGEINT on the DuckDB
    side), order-free and partition-invariant; no sqrt, no division,
    no float ulp at the decision boundary. Headroom: v_u up to ~1e12
    with 1e8 events/user stays under the 38-digit cap.

    Strict '>' makes zero-variance users (all readings equal)
    outlier-free by construction; users with fewer than MIN_ANOMALY_N
    events are excluded (a 2-sigma rule over 3 points is noise).

    One shuffle on user_id: the three aggregates ride one window
    partitioning, reused by the filter."""
    ev = _events(spark, sf_dir)
    v_u = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    base = ev.select("event_id", "user_id", v_u.alias("v_u")).filter(
        F.col("v_u").isNotNull()
    )

    def dec(c):
        return c.cast("decimal(38,0)")

    w = Window.partitionBy("user_id")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(dec(F.col("v_u"))).over(w)
    q = F.sum(dec(F.col("v_u")) * F.col("v_u")).over(w)
    stats = base.select(
        "event_id", "user_id", "v_u",
        n.alias("n"), s.alias("s"), q.alias("q"),
    )
    dev = dec(F.col("n") * F.col("v_u")) - F.col("s")
    thr = 4 * (dec(F.col("n")) * F.col("q") - F.col("s") * F.col("s"))
    return (
        stats.filter((F.col("n") >= MIN_ANOMALY_N) & (dev * dev > thr))
        .select("event_id", "user_id", "v_u", F.col("n").alias("n_user"))
        .orderBy("event_id")
    )


EVENTS_ANOMALY_SQL = f"""
WITH b AS (
  SELECT event_id, user_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_u
  FROM events WHERE value IS NOT NULL
), s AS (
  SELECT event_id, user_id, v_u,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         SUM(CAST(v_u AS HUGEINT)) OVER (PARTITION BY user_id) AS s,
         SUM(CAST(v_u AS HUGEINT) * v_u) OVER (PARTITION BY user_id) AS q
  FROM b
)
SELECT event_id, user_id, v_u, CAST(n AS BIGINT) AS n_user
FROM s
WHERE n >= {{min_n}}
  AND (n * v_u - s) * (n * v_u - s) > 4 * (n * q - s * s)
ORDER BY event_id
""".format(min_n=MIN_ANOMALY_N)


def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorized value statistics — the outlier-clipping
    step a feature pipeline runs before aggregating heavy-tailed
    metrics: values clamp to the type's exact [p05, p95] band, and the
    emitted row carries the clipped mean (integer micro-units —
    order-free sums), the band, and how many rows clipped on each side.

    Scale: one groupBy for the per-type bounds (exact percentile —
    the documented trade vs approx_percentile at extreme group
    cardinality, see quantiles_price_by_flag), one broadcast join back
    (the type dimension is tiny), one aggregation. The value stream
    crosses exactly two shuffles."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    micro = F.floor(clipped * 1_000_000 + 0.5).cast("long")
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.min("lo") * 1_000_000 + 0.5).cast("long").alias("lo_u"),
            F.floor(F.min("hi") * 1_000_000 + 0.5).cast("long").alias("hi_u"),
            F.sum((F.col("value") < F.col("lo")).cast("long")).alias("n_clip_low"),
            F.sum((F.col("value") > F.col("hi")).cast("long")).alias("n_clip_high"),
            F.sum(micro).alias("sum_clipped_u"),
        )
        .select(
            "event_type",
            "n",
            "lo_u",
            "hi_u",
            "n_clip_low",
            "n_clip_high",
            F.floor(F.col("sum_clipped_u") / F.col("n")).cast("long").alias("mean_clipped_u"),
        )
        .orderBy("event_type")
    )


EVENTS_WINSOR_SQL = """
WITH ev AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
), b AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM ev GROUP BY event_type
)
SELECT e.event_type,
       COUNT(*) AS n,
       CAST(floor(MIN(b.lo) * 1000000 + 0.5) AS BIGINT) AS lo_u,
       CAST(floor(MIN(b.hi) * 1000000 + 0.5) AS BIGINT) AS hi_u,
       CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
       CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
       CAST(floor(CAST(SUM(CAST(floor(LEAST(GREATEST(e.value, b.lo), b.hi) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
            / COUNT(*)) AS BIGINT) AS mean_clipped_u
FROM ev e JOIN b USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) of each event
    type's value stream over a 16-row horizon — the smoothing pass a
    monitoring pipeline applies before thresholding noisy telemetry
    (the decay-weighted twin of events_rolling_hour_avg's flat mean).

    Integer-exact formulation: per-event values floor to micro-units
    FIRST; with α = 1/2 the lag-ℓ weight is exactly 2^(H-1-ℓ), built
    as an INTEGER shiftleft so every weighted term stays in long
    arithmetic end to end — matching the oracle's exact BIGINT
    products for ANY value magnitude (the r6 advice closed the old
    long×double path, which rounded for |value_u| ≥ 2^38); the
    denominator is 2^n − 1 — both engines divide the same two
    integers, so the floored quotient is bit-portable. The frame is
    ROWS (15 PRECEDING, CURRENT) ordered by (ts, event_id): the
    event_id tiebreak makes frame membership deterministic.

    Scale shape (round 7): event TYPES are few and each grows with the
    corpus, so a type-partitioned window would sort every type's whole
    stream in one task — the per-group funnel. The ≤16-element frames
    instead come from operators/ranking.py::with_group_rows_frame (the
    grouped two-pass rank turns the ROWS frame into a distributed
    equi-join with a 16× bounded blowup — bounded by the FRAME, never
    the group); the fold over each frame array is unchanged and
    map-side."""
    from molgraphdb_spark.operators.ranking import with_group_rows_frame

    ev = _events(spark, sf_dir).filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    vu = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    base = ev.select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("_ts_us"),
        vu.alias("_vu"),
    )
    stepped = with_group_rows_frame(
        base, ["event_type"], [F.asc("_ts_us"), F.asc("event_id")], 15, "_vu", "arr"
    ).select("event_id", "event_type", "arr")
    num = F.aggregate(
        F.zip_with(
            F.col("arr"),
            F.sequence(F.lit(1), F.size("arr")),
            # integer weight 2^(j-1) via shiftleft: long*long, exact
            # (F.shiftleft the wrapper takes only literal shifts, so
            # call_function with a column shift — the bloom.py idiom)
            lambda v, j: v
            * F.call_function(
                "shiftleft", F.lit(1).cast("long"), (j - 1).cast("int")
            ),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    den = (
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.size("arr").cast("int")
        )
        - 1
    )
    return (
        stepped.select(
            "event_id",
            "event_type",
            num.alias("ewma_num"),
            den.alias("ewma_den"),
        )
        .withColumn(
            "ewma_u",
            F.floor(F.col("ewma_num") / F.col("ewma_den")).cast("long"),
        )
        .orderBy("event_id")
    )


EVENTS_EWMA_SQL = """
WITH ev AS (
  SELECT event_id, event_type, ts,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_u
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
win AS (
  SELECT event_id, event_type, list(value_u) OVER w AS arr
  FROM ev
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
),
folded AS (
  SELECT event_id, event_type,
         CAST(list_sum(list_transform(range(1, len(arr) + 1),
              j -> arr[CAST(j AS INT)] * CAST(pow(2, j - 1) AS BIGINT))) AS BIGINT) AS ewma_num,
         CAST(pow(2, len(arr)) AS BIGINT) - 1 AS ewma_den
  FROM win
)
SELECT event_id, event_type, ewma_num, ewma_den,
       CAST(floor(ewma_num / ewma_den) AS BIGINT) AS ewma_u
FROM folded
ORDER BY event_id
"""


# --------------------------------------------------------------------------
# Per-group OLS trend: exact integer/decimal moment sums.
# --------------------------------------------------------------------------
def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope of ``value`` against time per event_type —
    the drift detector a metrics pipeline runs (is latency creeping
    up? is a counter decaying?). slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)
    from four moment sums — the classic single-pass distributed OLS:
    one map-side-combined aggregation, no sort, no iteration.

    Determinism engineering (the TWAP pattern): x = whole seconds
    since each group's first event (a window min on the same
    partitioning), y = micro-unit values; all four moments accumulate
    exactly (long / DECIMAL(38,0) — order-free), and the single final
    division is one IEEE double op on two exact aggregates. The time
    rebase keeps nΣx² within decimal range at any realistic span
    (epoch-microsecond moments would overflow even 38 digits).

    Output: (event_type, n, slope_upm_per_s) — micro-value-units per
    second, floored."""
    ev = _events(spark, sf_dir)
    raw = ev.select(
        "event_type",
        F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias("y"),
        F.unix_micros(F.col("ts")).alias("t_us"),
    )
    # per-type first-event time via groupBy + BROADCAST join, not an
    # unordered partitionBy(event_type) window: an unbounded-frame
    # window BUFFERS each type's whole stream in one task (types are
    # few and corpus-growing — the same funnel class as the r7 ewma
    # fix), while the aggregate is map-side combined and the per-type
    # minima are a broadcast dictionary.
    t0 = raw.groupBy("event_type").agg(F.min("t_us").alias("_t0_us"))
    base = raw.join(F.broadcast(t0), "event_type").select(
        "event_type",
        "y",
        ((F.col("t_us") - F.col("_t0_us")) / 1_000_000).cast("long").alias("x"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
        F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
    )
    num = (dec(F.col("n")) * F.col("sxy") - dec(F.col("sx")) * F.col("sy")) * F.lit(
        1_000_000
    ).cast("decimal(38,0)")
    den = dec(F.col("n")) * F.col("sxx") - dec(F.col("sx")) * F.col("sx")
    return (
        agg.withColumn("num", num)
        .withColumn("den", den)
        .select(
            "event_type",
            "n",
            F.when(F.col("den") == 0, F.lit(0))
            .otherwise(
                F.floor(F.col("num").cast("double") / F.col("den").cast("double"))
            )
            .cast("long")
            .alias("slope_upm_per_s"),
        )
        .orderBy("event_type")
    )


EVENTS_TREND_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS y,
         (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY event_type)) // 1000000 AS x
  FROM events
), m AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
  FROM b GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx = 0 THEN 0
            ELSE floor(
              CAST((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000 AS DOUBLE)
              / CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
            END AS BIGINT) AS slope_upm_per_s
FROM m
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Bot-regularity flag: inter-event-gap coefficient of variation.
# --------------------------------------------------------------------------
MIN_BOT_GAPS = 5
BOT_CV2_BP = 500  #: CV² below 5% of mean² → machine-regular cadence


def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user squared coefficient of variation of inter-event gaps —
    the traffic-curation heuristic that separates machine cadence from
    human burstiness: scripted clients fire on near-constant timers
    (CV² ≈ 0), humans are heavy-tailed (CV² ≫ 0). Users with ≥
    MIN_BOT_GAPS gaps and CV² < 5%% of mean² are flagged — the bot
    filter a pipeline runs before events feed any training corpus.

    CV² = (n·Σg² − (Σg)²) / (Σg)² needs no mean, no sqrt: the moment
    sums accumulate exactly (DECIMAL(38,0) — gap² overflows int64 past
    ~54-minute gaps), and the single final division is one IEEE double
    op (the TWAP rule). One shuffle on user_id; the lag window and the
    groupBy share it."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    gaps = ev.select("user_id", gap.alias("g")).filter(F.col("g").isNotNull())
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("g").alias("sg"),
        F.sum(dec(F.col("g")) * F.col("g")).alias("sgg"),
    )
    num = (dec(F.col("n_gaps")) * F.col("sgg") - dec(F.col("sg")) * F.col("sg")) * F.lit(
        10_000
    ).cast("decimal(38,0)")
    den = dec(F.col("sg")) * F.col("sg")
    return (
        agg.filter(F.col("n_gaps") >= MIN_BOT_GAPS)
        .withColumn("num", num)
        .withColumn("den", den)
        .select(
            "user_id",
            "n_gaps",
            F.when(F.col("den") == 0, F.lit(0))
            .otherwise(
                F.floor(F.col("num").cast("double") / F.col("den").cast("double"))
            )
            .cast("long")
            .alias("cv2_bp"),
        )
        .withColumn("is_bot", (F.col("cv2_bp") < BOT_CV2_BP).cast("int"))
        .orderBy("user_id")
    )


EVENTS_BOT_SQL = f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
  FROM events
), m AS (
  SELECT user_id, COUNT(*) AS n_gaps, SUM(g) AS sg,
         SUM(CAST(g AS DECIMAL(38,0)) * g) AS sgg
  FROM g WHERE g IS NOT NULL
  GROUP BY user_id
  HAVING COUNT(*) >= {MIN_BOT_GAPS}
), s AS (
  SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
         CAST(CASE WHEN CAST(sg AS DECIMAL(38,0)) * sg = 0 THEN 0
              ELSE floor(
                CAST((CAST(n_gaps AS DECIMAL(38,0)) * sgg - CAST(sg AS DECIMAL(38,0)) * sg) * 10000 AS DOUBLE)
                / CAST(CAST(sg AS DECIMAL(38,0)) * sg AS DOUBLE))
              END AS BIGINT) AS cv2_bp
  FROM m
)
SELECT user_id, n_gaps, cv2_bp,
       CAST(cv2_bp < {BOT_CV2_BP} AS INT) AS is_bot
FROM s
ORDER BY user_id
"""


def events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point monitoring (Page 1954) per event type: the
    one-sided upward CUSUM ``s_i = max(0, s_{i−1} + (x_i − μ − k))``
    with reference μ = the type's own mean, slack k = μ/20, alarm
    threshold h = 5k — the classic drift detector an event pipeline
    runs on latency/value streams.

    The sequential max-plus recurrence is NOT computed sequentially:
    with g_i = Σ_{j≤i}(x_j − μ − k) it closes to
    ``s_i = g_i − min(0, min_{j≤i} g_j)``, so the whole monitor is one
    grouped running SUM (the two-pass distributed cumsum) plus one
    grouped running MIN (:func:`operators.ranking.
    with_grouped_running_min` — min has no inverse, so its driver fold
    is per-group rather than offset-subtracted). Event types are few
    and huge — exactly the regime where ``Window.partitionBy(type)``
    funnels each type through one task and the two-pass operators do
    not.

    Determinism: readings floor to integer micro-units; μ and k are
    FLOOR divisions pinned explicitly on BOTH engines — Spark's ``DIV``
    and DuckDB's ``//`` each truncate toward zero (verified: DuckDB
    ``-7 // 2 = -3``), while the plain-Python reference's ``//`` floors,
    so a negative value sum would silently split the three
    implementations. Both engines therefore compute
    ``(a - pmod(a, b)) DIV b`` (pmod non-negative → the numerator is
    exactly divisible → the trailing DIV is sign-safe), keeping parity
    for event types whose value sum is negative; every running
    statistic is integer — no float anywhere. Output: one row per type
    (events, alarms, max CUSUM, the μ/h used)."""
    from molgraphdb_spark.operators.ranking import (
        with_grouped_order_stats,
        with_grouped_running_min,
    )

    ev = _events(spark, sf_dir)
    x = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    base = ev.select("event_type", "ts", "event_id", x.alias("x")).filter(
        F.col("x").isNotNull()
    )
    m = base.groupBy("event_type").agg(
        F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n")
    )
    # Floor-division (matches DuckDB `//` for signed operands; Spark's
    # bare DIV truncates toward zero and would diverge on negative sums).
    mu = "((sx - pmod(sx, n)) DIV n)"
    k = f"(({mu} - pmod({mu}, 20)) DIV 20)"
    p = m.select(
        "event_type",
        F.expr(f"{mu} + {k}").alias("d"),
        F.expr(f"{k} * 5").alias("h"),
        F.expr(mu).alias("mu_micro"),
    )
    j = base.join(F.broadcast(p), "event_type").withColumn(
        "xd", F.col("x") - F.col("d")
    )
    order = [F.asc("ts"), F.asc("event_id")]
    g = with_grouped_order_stats(j, ["event_type"], order, cumsum={"xd": "g"})
    r = with_grouped_running_min(g, ["event_type"], order, "g", "gmin")
    s = r.withColumn("s", F.col("g") - F.least(F.col("gmin"), F.lit(0).cast("long")))
    return (
        s.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("s") > F.col("h")).cast("long")).alias("n_alarms"),
            F.max("s").alias("max_cusum_micro"),
            F.max("mu_micro").alias("mu_micro"),
            F.max("h").alias("alarm_threshold_micro"),
        )
        .orderBy("event_type")
    )


def cusum_reference_params(spark: SparkSession, sf_dir: str) -> dict[str, tuple[int, int]]:
    """Calibration pass for the streaming CUSUM twin: event_type →
    (d, h) with the SAME floor-division arithmetic as the batch query
    (Python ``//`` floors, matching the engines' pinned pmod
    formulation). One tiny aggregate — |types| rows to the driver."""
    ev = _events(spark, sf_dir)
    x = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
    rows = (
        ev.select("event_type", x.alias("x"))
        .filter(F.col("x").isNotNull())
        .groupBy("event_type")
        .agg(F.sum("x").alias("sx"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    out: dict[str, tuple[int, int]] = {}
    for r in rows:
        mu = r.sx // r.n
        k = mu // 20
        out[r.event_type] = (mu + k, 5 * k)
    return out


EVENTS_CUSUM_SQL = """
WITH e AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL
), m AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY event_type
), p0 AS (
  -- floor division (DuckDB // truncates toward zero; pmod-style
  -- remainder makes the numerator exactly divisible, sign-safe)
  SELECT event_type,
         (sx - ((sx % n) + n) % n) // n AS mu_micro
  FROM m
), p AS (
  SELECT event_type,
         mu_micro + (mu_micro - ((mu_micro % 20) + 20) % 20) // 20 AS d,
         (mu_micro - ((mu_micro % 20) + 20) % 20) // 20 * 5 AS h,
         mu_micro
  FROM p0
), g AS (
  SELECT e.event_type, e.ts, e.event_id, p.h, p.mu_micro,
         SUM(e.x - p.d) OVER (
           PARTITION BY e.event_type ORDER BY e.ts, e.event_id
           ROWS UNBOUNDED PRECEDING) AS g
  FROM e JOIN p USING (event_type)
), s AS (
  SELECT event_type, h, mu_micro,
         g - LEAST(MIN(g) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING), 0) AS s
  FROM g
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(s > h AS BIGINT)) AS BIGINT) AS n_alarms,
       CAST(MAX(s) AS BIGINT) AS max_cusum_micro,
       CAST(MAX(mu_micro) AS BIGINT) AS mu_micro,
       CAST(MAX(h) AS BIGINT) AS alarm_threshold_micro
FROM s GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "events_cusum_alarms": events_cusum_alarms,
    "events_ohlc_resample": events_ohlc_resample,
    "events_ewma": events_ewma,
    "events_asof_join": events_asof_join,
    "events_range_join": events_range_join,
    "events_gap_fill": events_gap_fill,
    "events_sliding_window": events_sliding_window,
    "events_rolling_hour_avg": events_rolling_hour_avg,
    "events_twap": events_twap,
    "events_anomaly_outliers": events_anomaly_outliers,
    "events_winsorized_stats": events_winsorized_stats,
    "events_value_trend": events_value_trend,
    "events_bot_regularity": events_bot_regularity,
}

ORACLES = {
    "events_cusum_alarms": EVENTS_CUSUM_SQL,
    "events_ohlc_resample": EVENTS_OHLC_SQL,
    "events_ewma": EVENTS_EWMA_SQL,
    "events_asof_join": EVENTS_ASOF_SQL,
    "events_range_join": EVENTS_RANGE_SQL,
    "events_gap_fill": EVENTS_GAP_FILL_SQL,
    "events_sliding_window": EVENTS_SLIDING_SQL,
    "events_rolling_hour_avg": EVENTS_ROLLING_SQL,
    "events_twap": EVENTS_TWAP_SQL,
    "events_anomaly_outliers": EVENTS_ANOMALY_SQL,
    "events_winsorized_stats": EVENTS_WINSOR_SQL,
    "events_value_trend": EVENTS_TREND_SQL,
    "events_bot_regularity": EVENTS_BOT_SQL,
}
