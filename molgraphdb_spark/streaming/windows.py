"""Structured Streaming over the events table (SURVEY.md §2.10: the
reference has NO streaming — this is the extension surface planned in
§7 M4, reusing the batch window semantics of queries/events.py
verbatim under ``readStream``).

Design: the batch queries in queries/events.py define the semantics
(tumbling window counts, sessionization); here the SAME aggregation
expressions run incrementally with watermarks. The driver's
correctness gate checks the batch twins; tests/test_streaming.py
checks stream-equals-batch on the same input.

Scale notes (100 TB/day stream):
- watermark bounds state: tumbling-window state is O(windows × keys)
  only within the lateness horizon; session state evicts on gap close.
- ``maxFilesPerTrigger`` / rate limits keep micro-batches sized to the
  cluster; sink is idempotent by (window, key) upsert.
- custom stateful ops use applyInPandasWithState (Arrow-batched),
  never collect.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from molgraphdb_spark.session import tune
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

def _events_raw_schema(ts_type) -> StructType:
    """Events schema with ``ts`` in whatever physical type the parquet
    files actually carry (streaming reads need an explicit schema)."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


#: Legacy alias: the ns-as-long variant (kept for callers that stage
#: their own ns-format fixtures).
EVENTS_RAW_SCHEMA = _events_raw_schema(LongType())


def read_events_stream(spark: SparkSession, events_dir: str, max_files: int = 1) -> DataFrame:
    """File-source stream over a directory of events parquet files,
    normalizing ``ts`` to Spark micros exactly like the batch reader
    (queries/events.py::_events).

    The physical ``ts`` type is probed from the files' footers with a
    one-off batch read (cheap: schema only, no scan) — the driver has
    shipped both INT64 TIMESTAMP(NANOS) and µs TIMESTAMP_NTZ, and a
    hardcoded schema silently mis-scales one of them. readStream needs
    the schema declared up front, so probe-then-declare is the only
    format-robust shape.
    """
    tune(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probed = {f.name: f.dataType for f in spark.read.parquet(events_dir).schema.fields}
    ts_type = probed.get("ts", TimestampNTZType())
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_type))
        .option("maxFilesPerTrigger", max_files)
        .parquet(events_dir)
    )
    if isinstance(ts_type, LongType):
        # ns-as-bigint → floor to µs
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        # wall-clock µs; session tz is pinned UTC so the cast is
        # instant-preserving
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, window: str = "5 minutes", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window per-type counts — the streaming twin of
    queries/events.py::events_tumbling_window; watermark bounds state
    and admits late data within the horizon."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows (30-min inactivity gap) per user — the streaming
    twin of events_sessionize (same gap semantics; state evicts when
    the watermark passes a session's close)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


_STATE_SCHEMA = "user_id long, n long, total double"
_OUT_SCHEMA = "user_id long, n long, total double"


def _running_totals(key, pdf_iter, state: GroupState):
    """Custom stateful operator: per-user running count + value sum
    (applyInPandasWithState — the arbitrary-state API; the pattern for
    operators Spark's built-ins can't express, SURVEY.md custom-op
    rule (b))."""
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n": [n], "total": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running totals per user via applyInPandasWithState."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ohlc_bars(events: DataFrame, window: str = "15 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming OHLC bars — the streaming twin of
    queries/temporal.py::events_ohlc_resample. open/close are
    ``min_by``/``max_by`` over the same zero-padded (ts, event_id)
    ordering key as the batch query (deterministic tie-break on both
    execution modes); the watermark bounds bar state at one hour of
    late data. One stateful aggregation keyed on (window, event_type)."""
    order_key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.round(F.min_by("value", order_key), 2).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.round(F.max_by("value", order_key), 2).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("bar_start_us"),
            "event_type", "open", "high", "low", "close", "n_events",
        )
    )


_TWAP_STATE = "last_ts long, last_v long, n long, sum_dur long, sum_vdur string"
_TWAP_OUT = "user_id long, n_intervals long, total_dur_us long, twap_u long"


def _twap_state_fn(key, pdf_iter, state: GroupState):
    """Streaming TWAP per user (twin of queries/temporal.py::
    events_twap): each reading holds until its successor, weight =
    inter-event duration, the last reading carries no weight — which
    streaming-wise means an interval is emitted only when the NEXT
    event arrives, so state carries the open (last_ts, last_value)
    reading across micro-batches.

    Exactness: v_u×dur products accumulate in an unbounded Python int
    (serialized as a string in the state row — the batch twin uses
    DECIMAL(38,0) for the same order-free exact accumulation); the
    single final division is one IEEE double op, identical to the
    batch/oracle computation."""
    (user_id,) = key
    if state.exists:
        last_ts, last_v, n, sum_dur, sum_vdur_s = state.get
        sum_vdur = int(sum_vdur_s)
    else:
        last_ts, last_v, n, sum_dur, sum_vdur = None, None, 0, 0, 0
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_us = (pdf["ts"].astype("int64")).tolist()
        v_u = np.floor(pdf["value"].to_numpy() * 1_000_000 + 0.5).astype("int64").tolist()
        for t, v in zip(ts_us, v_u):
            if last_ts is not None:
                dur = t - last_ts
                n += 1
                sum_dur += dur
                sum_vdur += int(last_v) * dur
            last_ts, last_v = t, v
    state.update((last_ts, last_v, n, sum_dur, str(sum_vdur)))
    if sum_dur > 0:
        import math

        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_intervals": [n],
                "total_dur_us": [sum_dur],
                "twap_u": [math.floor(float(sum_vdur) / sum_dur)],
            }
        )


def twap_stream(events: DataFrame) -> DataFrame:
    """Streaming time-weighted average per user via
    applyInPandasWithState (LEAD over an unbounded stream is not
    expressible with built-ins: the weight of a reading is only known
    when its successor arrives — inherently stateful)."""
    # ts → int64 micros JVM-side: a datetime64 pandas column's integer
    # unit (ns vs us) depends on the Arrow/pandas version; unix_micros
    # pins the contract the state function assumes.
    return events.select(
        "user_id", F.unix_micros("ts").alias("ts"), "event_id", "value"
    ).groupBy("user_id").applyInPandasWithState(
        _twap_state_fn,
        outputStructType=_TWAP_OUT,
        stateStructType=_TWAP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_BOT_STATE = "last_ts long, n_gaps long, sg string, sgg string"
_BOT_OUT = "user_id long, n_gaps long, sg string, sgg string"


def _bot_state_fn(key, pdf_iter, state: GroupState):
    """Streaming per-user gap-moment accumulator — the stateful core
    of the bot-regularity flag (twin of queries/temporal.py::
    events_bot_regularity): CV² needs only (n, Σg, Σg²) over the
    inter-event gaps, and a gap materializes when the NEXT event
    arrives, so state carries the open last_ts plus the three moments
    (unbounded Python ints as strings — gap² overflows int64 past
    ~54-minute gaps, same reason the batch twin uses DECIMAL(38,0)).
    Within-batch rows sort by (ts, event_id) — the TWAP twin's
    sequencing contract."""
    (user_id,) = key
    if state.exists:
        last_ts, n, sg_s, sgg_s = state.get
        sg, sgg = int(sg_s), int(sgg_s)
    else:
        last_ts, n, sg, sgg = None, 0, 0, 0
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"])
        for t in pdf["ts"].astype("int64").tolist():
            if last_ts is not None:
                g = t - last_ts
                n += 1
                sg += g
                sgg += g * g
            last_ts = t
    state.update((last_ts, n, str(sg), str(sgg)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_gaps": [n], "sg": [str(sg)], "sgg": [str(sgg)]}
    )


def bot_regularity_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user gap moments via applyInPandasWithState;
    the CV²/flag derivation happens downstream from the emitted exact
    sufficient statistics (LAG over an unbounded stream is inherently
    stateful — a gap exists only once its closing event arrives)."""
    from pyspark.sql import functions as F

    return events.select(
        "user_id", F.unix_micros("ts").alias("ts"), "event_id"
    ).groupBy("user_id").applyInPandasWithState(
        _bot_state_fn,
        outputStructType=_BOT_OUT,
        stateStructType=_BOT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_FUNNEL_STATE = "view_us long, click_us long, purchase_us long"
_FUNNEL_OUT = "user_id long, view_us long, click_us long, purchase_us long"


def _funnel_state_fn(key, pdf_iter, state: GroupState):
    """Streaming funnel stages per user (twin of queries/events.py::
    funnel_stages): first view, first click strictly after that view,
    first purchase strictly after that click. Processing rows in ts
    order makes 'first qualifying' ≡ the batch twin's conditional MIN:
    view_ts is the min view; once set it never moves, so the min
    qualifying click is the first one encountered after it, and
    likewise for the purchase."""
    (user_id,) = key
    view_us, click_us, purchase_us = state.get if state.exists else (None, None, None)
    for pdf in pdf_iter:
        pdf = pdf.sort_values("ts")
        for t, et in zip(pdf["ts"].astype("int64").tolist(), pdf["event_type"].tolist()):
            if et == "view" and view_us is None:
                view_us = t
            elif et == "click" and click_us is None and view_us is not None and t > view_us:
                click_us = t
            elif et == "purchase" and purchase_us is None and click_us is not None and t > click_us:
                purchase_us = t
    state.update((view_us, click_us, purchase_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "view_us": [view_us],
            "click_us": [click_us],
            "purchase_us": [purchase_us],
        }
    )


def funnel_stage_stream(events: DataFrame) -> DataFrame:
    """Streaming funnel-stage tracker via applyInPandasWithState —
    ordered-sequence matching (A then B then C with strict time
    progression) needs per-user state across micro-batches; emits the
    current (view, click, purchase) stage timestamps per user in
    update mode. Downstream, a per-trigger aggregate of this table is
    the streaming conversion funnel."""
    # ts → int64 micros JVM-side (same unit-pinning rationale as
    # twap_stream).
    return events.select(
        "user_id", F.unix_micros("ts").alias("ts"), "event_type"
    ).groupBy("user_id").applyInPandasWithState(
        _funnel_state_fn,
        outputStructType=_FUNNEL_OUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_MOMENTS_STATE = "n long, s string, q string"
_MOMENTS_OUT = "user_id long, n long, s string, q string"


def _moments_state_fn(key, pdf_iter, state: GroupState):
    """Streaming per-user moment accumulator — the stateful core of the
    2-sigma anomaly flag (twin of queries/temporal.py::
    events_anomaly_outliers). An event's outlier verdict depends on the
    user's FULL history (n, S = sum v_u, Q = sum v_u^2 enter the
    decision inequality), so the streaming op maintains exactly those
    sufficient statistics; flags are derived by joining the latest
    moments back onto the events (see the stream==batch test). S and Q
    accumulate as unbounded Python ints serialized as strings — the
    same order-free exact arithmetic as the batch DECIMAL(38,0)."""
    (user_id,) = key
    if state.exists:
        n, s_s, q_s = state.get
        s, q = int(s_s), int(q_s)
    else:
        n, s, q = 0, 0, 0
    for pdf in pdf_iter:
        v_u = np.floor(pdf["value"].dropna().to_numpy() * 1_000_000 + 0.5).astype("int64")
        n += len(v_u)
        s += int(v_u.sum())
        q += int((v_u.astype(object) ** 2).sum())
    state.update((n, str(s), str(q)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n": [n], "s": [str(s)], "q": [str(q)]}
    )


def user_moments_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user (n, S, Q) moments via applyInPandasWithState;
    update mode emits each user's latest exact statistics per batch."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _moments_state_fn,
        outputStructType=_MOMENTS_OUT,
        stateStructType=_MOMENTS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_TREND_STATE = "n long, sx string, sy string, sxy string, sxx string"
_TREND_OUT = "event_type string, n long, sx string, sy string, sxy string, sxx string"


def _trend_state_fn(key, pdf_iter, state: GroupState):
    """Streaming per-type OLS moment accumulator — the stateful core of
    the value-trend drift detector (twin of queries/temporal.py::
    events_value_trend). The slope needs only the five sufficient
    statistics (n, Σx, Σy, Σxy, Σx²); they accumulate here as
    unbounded Python ints serialized as strings (order-free exact — no
    overflow at any history length), with x = UNSHIFTED epoch seconds:
    the OLS numerator and denominator are shift-invariant integer
    identities, so the derived slope never depends on when the group's
    first event was seen — the property that makes the accumulator
    correct under out-of-order arrival, where a batch-style
    rebase-to-first-seen would silently corrupt the moments."""
    (event_type,) = key
    if state.exists:
        n, sx_s, sy_s, sxy_s, sxx_s = state.get
        sx, sy, sxy, sxx = int(sx_s), int(sy_s), int(sxy_s), int(sxx_s)
    else:
        n, sx, sy, sxy, sxx = 0, 0, 0, 0, 0
    for pdf in pdf_iter:
        sub = pdf[["t_us", "value"]].dropna()
        x = (sub["t_us"].to_numpy().astype("int64") // 1_000_000).astype(object)
        y = np.floor(sub["value"].to_numpy() * 1_000_000 + 0.5).astype("int64").astype(object)
        n += len(sub)
        sx += int(x.sum()) if len(sub) else 0
        sy += int(y.sum()) if len(sub) else 0
        sxy += int((x * y).sum()) if len(sub) else 0
        sxx += int((x * x).sum()) if len(sub) else 0
    state.update((n, str(sx), str(sy), str(sxy), str(sxx)))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n": [n],
            "sx": [str(sx)],
            "sy": [str(sy)],
            "sxy": [str(sxy)],
            "sxx": [str(sxx)],
        }
    )


def value_trend_stream(events: DataFrame) -> DataFrame:
    """Streaming per-event-type OLS moments via applyInPandasWithState;
    update mode emits each type's latest exact statistics per batch.
    Slope derivation (floor((n·Σxy − ΣxΣy)·10⁶ / (n·Σx² − (Σx)²)))
    happens downstream from the emitted sufficient statistics."""
    from pyspark.sql import functions as F

    return (
        events.select("event_type", F.unix_micros("ts").alias("t_us"), "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _trend_state_fn,
            outputStructType=_TREND_OUT,
            stateStructType=_TREND_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_CUSUM_STATE = "s long, n long, alarms long, mx long"
_CUSUM_OUT = (
    "event_type string, n_events long, n_alarms long, "
    "max_cusum_micro long, cusum_micro long"
)


def make_cusum_state_fn(params: dict[str, tuple[int, int]]):
    """Build the per-type CUSUM state function (twin of
    queries/temporal.py::events_cusum_alarms). Page's one-sided upward
    recurrence ``s_i = max(0, s_{i−1} + (x_i − d))`` is exactly ONE
    integer state cell per event type (plus the running n/alarms/max
    counters) — the batch twin's prefix-sum-minus-running-min closed
    form exists precisely because this recurrence is sequential; the
    stream runs it directly.

    ``params`` maps event_type → (d, h): the drift offset d = μ + k
    and alarm threshold h = 5k from a CALIBRATION pass (a deployed
    CUSUM always monitors against a known in-control reference — the
    batch twin's self-μ is its calibration; see
    queries/temporal.py::cusum_reference_params). Types absent from
    the calibration have no reference mean and emit nothing.

    ORDER CONTRACT (pinned, not shift-invariant): CUSUM is
    order-DEFINED — s_i depends on the full prefix. ALL of a type's
    rows in a micro-batch are concatenated across Arrow chunks and
    sorted ONCE by (ts, event_id) before the recurrence runs (a group
    larger than arrow.maxRecordsPerBatch arrives as several chunks;
    sorting per chunk would leave cross-chunk order at arrival order),
    and batches must arrive in time order per type (the file source's
    mtime order in tests; a real deployment resequences upstream or
    accepts detection-latency skew). This is the documented exception
    to the module's shift-invariant-identity discipline."""

    def _cusum_state_fn(key, pdf_iter, state: GroupState):
        (event_type,) = key
        ref = params.get(event_type)
        if state.exists:
            s, n, alarms, mx = state.get
        else:
            s, n, alarms, mx = 0, 0, 0, 0
        # Drain the iterator unconditionally (the contract requires it),
        # concatenating chunks so the sort spans the WHOLE micro-batch.
        chunks = [pdf[pdf["value"].notna()] for pdf in pdf_iter]
        if ref is not None and chunks:
            d, h = ref
            sub = pd.concat(chunks).sort_values(["ts", "event_id"])
            xs = np.floor(sub["value"].to_numpy() * 1_000_000 + 0.5).astype("int64")
            for x in xs:
                s = max(0, s + int(x) - d)
                n += 1
                mx = max(mx, s)
                if s > h:
                    alarms += 1
        state.update((s, n, alarms, mx))
        if ref is not None and n:
            yield pd.DataFrame(
                {
                    "event_type": [event_type],
                    "n_events": [n],
                    "n_alarms": [alarms],
                    "max_cusum_micro": [mx],
                    "cusum_micro": [s],
                }
            )

    return _cusum_state_fn


def cusum_stream(events: DataFrame, params: dict[str, tuple[int, int]]) -> DataFrame:
    """Streaming CUSUM change-point monitor per event type via
    applyInPandasWithState; update mode emits each type's latest
    (n, alarms, max, current) per micro-batch. ``params`` comes from a
    calibration pass (cusum_reference_params)."""
    from pyspark.sql import functions as F

    return (
        events.select(
            "event_type", F.unix_micros("ts").alias("ts"), "event_id", "value"
        )
        .groupBy("event_type")
        .applyInPandasWithState(
            make_cusum_state_fn(params),
            outputStructType=_CUSUM_OUT,
            stateStructType=_CUSUM_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def click_purchase_join(
    events: DataFrame, horizon: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner self-join: each purchase matched to every
    click by the same user in the preceding ``horizon``. Watermarks on
    BOTH sides + the two-sided time-range predicate are what let the
    state store evict: a click's state is droppable once the watermark
    passes click_ts + horizon. Without both bounds the join state grows
    forever — the canonical stream-join pitfall."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return clicks.join(purchases, cond).select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id"
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on (user_id, event_type):
    ``dropDuplicatesWithinWatermark`` keeps the first occurrence and
    holds each key's state only until the watermark passes it — bounded
    state, unlike plain dropDuplicates on a stream which accumulates
    every key forever."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the stream
    joins against the (batch) dimension — no watermark or state needed
    for a stream-static inner join; Spark re-plans the static side per
    micro-batch, so a broadcast-sized dim costs one broadcast per
    trigger. The canonical 100 TB shape: fact stream enriched with a
    dimension snapshot (user → segment here)."""
    d = dim.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        events.join(F.broadcast(d), "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "complete"):
    """Drain a stream into an in-memory table (test/dev sink); returns
    the query handle after processing all available input."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    return q


def run_to_merge_sink(
    stream_df: DataFrame,
    root: str,
    keys: list[str],
    checkpoint_dir: str,
):
    """Drain a stream into the engine's MERGE snapshot store via
    ``foreachBatch`` — the production sink shape for windowed
    aggregates: each micro-batch upserts by ``keys``, so REPLAYED
    batches (restart after a crash between sink-commit and
    checkpoint-commit) overwrite rather than duplicate. Idempotent
    sink + checkpointed offsets = end-to-end exactly-once for
    deterministic aggregates — the standard Structured Streaming
    recipe, here against the same merge_upsert used by batch (one
    sink implementation, two execution modes).

    Update-mode output keeps micro-batches small: only windows whose
    aggregate changed are re-emitted (and re-merged)."""
    from molgraphdb_spark.sources.writers import merge_upsert

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(batch_df.sparkSession, root, batch_df, keys)

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


try:  # transformWithState landed in Spark 4.0; guard for older runtimes.
    # NOTE: running a TWS query additionally requires the
    # ``google.protobuf`` package (the Python driver worker speaks the
    # state-server protocol over protobuf) and the RocksDB state store;
    # in an environment without protobuf the query crashes at PRE_INIT
    # and the applyInPandasWithState twin below is the supported path.
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotalsProcessor(StatefulProcessor):
        """transformWithStateInPandas twin of _running_totals — the
        modern arbitrary-state API (typed state variables, timers,
        TTL support) that supersedes applyInPandasWithState. Both
        implementations are kept: same semantics, two state APIs,
        and the stream==batch test pins them to the batch answer."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    def running_user_totals_tws(events: DataFrame) -> DataFrame:
        """Streaming running totals per user via transformWithStateInPandas.

        transformWithState requires the RocksDB state store (the
        HDFS-backed default provider does not implement the
        multi-column-family layout typed state variables use); set per
        session before the query starts."""
        events.sparkSession.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_RunningTotalsProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover — pre-4.0 runtime
    running_user_totals_tws = None


def read_documents_stream(
    spark: SparkSession, docs_dir: str, max_files: int = 1
) -> DataFrame:
    """File-source stream over a documents parquet directory — the
    landing-zone shape for a continuously-ingested corpus (each dropped
    file is one micro-batch at ``maxFilesPerTrigger=1``)."""
    schema = spark.read.parquet(docs_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(docs_dir)
    )


def quality_classifier_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of queries.text.doc_quality_classifier: the
    hashed-feature linear scorer is STATELESS (the model rides the
    expression), so it runs map-side per micro-batch unchanged — the
    shared quality_score_col() is the single code path for the math —
    and only the per-source counters (docs, accepted, score sum) are a
    streaming aggregation (state = one row per source). This is the
    continuously-scored ingest gate a landing-zone corpus wants:
    scores land per file drop, the mixture report updates in place."""
    from molgraphdb_spark.queries.text import quality_score_col

    scored = docs.filter(F.col("text").isNotNull()).select(
        "source", quality_score_col().alias("score_milli")
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("score_milli") >= 0).cast("long")).alias("accepted"),
        F.sum("score_milli").alias("sum_score_milli"),
    )


def chunk_spans_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of queries.text.doc_chunk_spans: the RAG chunker
    is STATELESS map-only (tokenize → sequence → explode → slice →
    md5), so it streams per micro-batch unchanged in append mode — the
    shared queries.text.chunk_rows is the single code path for the
    geometry and the content hash. This is the continuously-chunked
    retrieval-index feed: chunks land as documents arrive, no state,
    no watermark."""
    from molgraphdb_spark.queries.text import chunk_rows

    return chunk_rows(docs.filter(F.col("text").isNotNull()))


def source_token_counts_stream(docs: DataFrame) -> DataFrame:
    """Streaming twin of source_token_divergence's corpus pass: running
    (source, token) counts via a streaming aggregation (update/complete
    mode; the dictionary-sized state is exactly the batch groupBy's
    output). The KL derivation itself is NOT streamed — it runs over
    the materialized counts with queries.text.kl_from_counts, so
    stream and batch share one code path for the math."""
    tok = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"[ \t\n\r\f]+")).alias("tok"),
    )
    return tok.groupBy("source", "tok").count().withColumnRenamed("count", "c_st")


_MG_STATE = "items string, weights string, n long"
_MG_OUT = "shard int, item string, weight long, n_shard long"

#: Streaming Misra–Gries geometry: items hash-shard across this many
#: state keys so no single state partition absorbs the whole stream.
MG_STREAM_SHARDS = 8


def _mg_state_fn(key, pdf_iter, state: GroupState):
    """Per-shard Misra–Gries summary carried across micro-batches.
    State is the ≤k counter dict (item list + weight list serialized as
    tab-joined strings — items are event_type tokens, tab-free) plus
    the shard's total row count. Each shard sees a disjoint hash-slice
    of the item space, so its summary undercounts any of ITS items by
    at most n_shard/(k+1) — the same MG algebra as the batch operator,
    sharded by item instead of by partition."""
    k = 8
    (shard,) = key
    if state.exists:
        items_s, weights_s, n = state.get
        counters = (
            dict(zip(items_s.split("\t"), map(int, weights_s.split("\t"))))
            if items_s
            else {}
        )
    else:
        counters, n = {}, 0
    for pdf in pdf_iter:
        for item in pdf["item"].dropna():
            n += 1
            if item in counters:
                counters[item] += 1
            elif len(counters) < k:
                counters[item] = 1
            else:
                dead = []
                for key_ in counters:
                    counters[key_] -= 1
                    if counters[key_] == 0:
                        dead.append(key_)
                for key_ in dead:
                    del counters[key_]
    state.update(
        (
            "\t".join(counters.keys()),
            "\t".join(str(w) for w in counters.values()),
            n,
        )
    )
    yield pd.DataFrame(
        {
            "shard": [shard] * len(counters),
            "item": list(counters.keys()),
            "weight": list(counters.values()),
            "n_shard": [n] * len(counters),
        }
    )


def heavy_hitters_stream(events: DataFrame, col: str = "event_type") -> DataFrame:
    """Streaming twin of operators/sketch.py::heavy_hitters: items
    hash-shard across MG_STREAM_SHARDS state keys, each keeping a
    constant-memory MG(k=8) summary across micro-batches (update mode
    re-emits a shard's summary whenever it changes). Frequent-item
    estimates derive from the LATEST summaries with the batch
    operator's algebra — see the stream==batch bound test."""
    items = events.select(
        F.col(col).cast("string").alias("item"),
        (F.abs(F.xxhash64(F.col(col).cast("string"))) % MG_STREAM_SHARDS)
        .cast("int")
        .alias("shard"),
    )
    return items.groupBy("shard").applyInPandasWithState(
        _mg_state_fn,
        outputStructType=_MG_OUT,
        stateStructType=_MG_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
