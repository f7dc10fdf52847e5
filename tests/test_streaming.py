"""Stream-equals-batch tests: the streaming twins must produce the
batch answers on the same (finite) input — the standard Structured
Streaming correctness harness."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from molgraphdb_spark.queries.events import _events, events_tumbling_window
from molgraphdb_spark.streaming.windows import (
    click_purchase_join,
    dedup_stream,
    enrich_stream_with_dim,
    read_events_stream,
    run_to_memory,
    running_user_totals,
    session_counts,
    tumbling_counts,
)


def test_stream_static_enrichment_equals_batch(spark, sf_dir, events_stream_dir):
    from molgraphdb_spark.sources.tables import load_table

    cust = load_table(spark, sf_dir, "customer")
    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(enrich_stream_with_dim(ev, cust), "t_enrich")
    try:
        got = {r.segment: r.n_events for r in spark.table("t_enrich").collect()}
        want = {
            r.segment: r.n_events
            for r in enrich_stream_with_dim(_events(spark, sf_dir), cust).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), d / "events.parquet")
    return str(d)


def test_tumbling_stream_equals_batch(spark, sf_dir, events_stream_dir):
    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(tumbling_counts(ev), "t_tumbling")
    try:
        got = {
            (r.window_start, r.event_type): r.n_events
            for r in spark.table("t_tumbling").collect()
        }
        want = {
            (r.window_start, r.event_type): r.n_events
            for r in events_tumbling_window(spark, sf_dir).collect()
        }
        assert got == want
    finally:
        q.stop()


def test_session_stream_counts_total(spark, sf_dir, events_stream_dir):
    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(session_counts(ev), "t_sessions")
    try:
        total = spark.table("t_sessions").agg(F.sum("n_events")).first()[0]
        n_events = _events(spark, sf_dir).count()
        assert total == n_events  # every event lands in exactly one session
        # sessions end after their last event + gap
        bad = spark.table("t_sessions").filter("session_end <= session_start").count()
        assert bad == 0
    finally:
        q.stop()


def test_stream_stream_join_equals_batch(spark, sf_dir, events_stream_dir):
    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(click_purchase_join(ev), "t_ssjoin", output_mode="append")
    try:
        got = {
            (r.user_id, r.purchase_id, r.click_id) for r in spark.table("t_ssjoin").collect()
        }
        b = _events(spark, sf_dir)
        clicks = b.filter("event_type = 'click'").selectExpr(
            "user_id AS cu", "ts AS cts", "event_id AS cid"
        )
        purchases = b.filter("event_type = 'purchase'").selectExpr(
            "user_id AS pu", "ts AS pts", "event_id AS pid"
        )
        want = {
            (r.pu, r.pid, r.cid)
            for r in clicks.join(
                purchases,
                (F.col("cu") == F.col("pu"))
                & (F.col("pts") >= F.col("cts"))
                & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")),
            ).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_stream_dedup_equals_batch_distinct(spark, sf_dir, events_stream_dir):
    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(dedup_stream(ev), "t_dedup", output_mode="append")
    try:
        got = {(r.user_id, r.event_type) for r in spark.table("t_dedup").collect()}
        want = {
            (r.user_id, r.event_type)
            for r in _events(spark, sf_dir).select("user_id", "event_type").distinct().collect()
        }
        assert got == want
    finally:
        q.stop()


def test_stateful_running_totals(spark, sf_dir, events_stream_dir):
    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(running_user_totals(ev), "t_running", output_mode="update")
    try:
        got = {r.user_id: (r.n, round(r.total, 6)) for r in spark.table("t_running").collect()}
        want = {
            r.user_id: (r.n, round(r.total, 6))
            for r in _events(spark, sf_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        assert got == want
    finally:
        q.stop()


def test_foreachbatch_merge_sink_idempotent(spark, sf_dir, events_stream_dir, tmp_path):
    """Stream → foreachBatch MERGE snapshot sink: final state equals the
    batch answer, and replaying the whole stream (fresh checkpoint, same
    sink root — the worst-case duplicate delivery) leaves the snapshot
    unchanged (idempotent upsert by key)."""
    from molgraphdb_spark.sources.writers import read_current
    from molgraphdb_spark.streaming.windows import read_events_stream, run_to_merge_sink, tumbling_counts

    root = str(tmp_path / "merge_root")

    def snapshot():
        cur = read_current(spark, root)
        return sorted(
            (r.window_start, r.event_type, r.n_events, round(r.total_value, 6))
            for r in cur.collect()
        )

    ev = read_events_stream(spark, events_stream_dir)
    run_to_merge_sink(
        tumbling_counts(ev), root, ["window_start", "event_type"], str(tmp_path / "ckpt1")
    )
    first = snapshot()

    want = sorted(
        (r.window_start, r.event_type, r.n_events, round(r.total_value, 6))
        for r in events_tumbling_window(spark, sf_dir)
        .join(
            _events(spark, sf_dir)
            .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
            .agg(F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "total_value"),
            ["window_start", "event_type"],
        )
        .collect()
    )
    assert first == want and len(first) > 0

    # replay: same data, fresh checkpoint → every batch re-delivered
    ev2 = read_events_stream(spark, events_stream_dir)
    run_to_merge_sink(
        tumbling_counts(ev2), root, ["window_start", "event_type"], str(tmp_path / "ckpt2")
    )
    assert snapshot() == first


def test_sliding_stream_equals_batch(spark, sf_dir, events_stream_dir):
    from molgraphdb_spark.queries.temporal import events_sliding_window
    from molgraphdb_spark.streaming.windows import read_events_stream, run_to_memory

    ev = read_events_stream(spark, events_stream_dir)
    sliding = (
        ev.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    q = run_to_memory(sliding, "t_sliding")
    try:
        got = {
            (r.window_start, r.event_type): r.n_events
            for r in spark.table("t_sliding").collect()
        }
        want = {
            (r.window_start, r.event_type): r.n_events
            for r in events_sliding_window(spark, sf_dir).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_stateful_running_totals_tws(spark, sf_dir, events_stream_dir):
    """transformWithStateInPandas (the modern arbitrary-state API) must
    produce the same final per-user totals as the batch aggregation and
    the applyInPandasWithState twin."""
    from molgraphdb_spark.streaming.windows import running_user_totals_tws

    if running_user_totals_tws is None:
        pytest.skip("transformWithStateInPandas unavailable")
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        # The TWS state-server protocol speaks protobuf from the Python
        # driver worker; without the google.protobuf package the query
        # crashes at PRE_INIT (verified: StateMessage_pb2 ImportError;
        # re-confirmed in r14 — `import google.protobuf` still fails).
        pytest.skip("google.protobuf not installed — TWS state protocol unavailable")
    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(running_user_totals_tws(ev), "t_running_tws", output_mode="update")
    try:
        got = {r.user_id: (r.n, round(r.total, 6)) for r in spark.table("t_running_tws").collect()}
        want = {
            r.user_id: (r.n, round(r.total, 6))
            for r in _events(spark, sf_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        assert got == want
    finally:
        q.stop()


def test_twap_stream_equals_batch(spark, sf_dir, events_stream_dir):
    """Streaming TWAP (applyInPandasWithState, exact int accumulation in
    state) must reproduce the batch events_twap table exactly — column
    for column, including the floor-divided twap_u."""
    from molgraphdb_spark.queries.temporal import events_twap
    from molgraphdb_spark.streaming.windows import twap_stream

    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(twap_stream(ev), "t_twap", output_mode="update")
    try:
        got = {
            r.user_id: (r.n_intervals, r.total_dur_us, r.twap_u)
            for r in spark.table("t_twap").collect()
        }
        want = {
            r.user_id: (r.n_intervals, r.total_dur_us, r.twap_u)
            for r in events_twap(spark, sf_dir).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_funnel_stream_equals_batch(spark, sf_dir, events_stream_dir):
    """Streaming funnel stages must reproduce the batch funnel_stages
    relation (first view / first later click / first later purchase per
    user), and the conversion counts derived from it must match the
    batch events_funnel rollup."""
    from molgraphdb_spark.queries.events import events_funnel, funnel_stages
    from molgraphdb_spark.streaming.windows import funnel_stage_stream

    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(funnel_stage_stream(ev), "t_funnel", output_mode="update")
    try:
        got = {
            r.user_id: (r.view_us, r.click_us, r.purchase_us)
            for r in spark.table("t_funnel").collect()
        }
        want = {
            r.user_id: (r.view_us, r.click_us, r.purchase_us)
            for r in funnel_stages(_events(spark, sf_dir))
            .select(
                "user_id",
                F.unix_micros("view_ts").alias("view_us"),
                F.unix_micros("click_ts").alias("click_us"),
                F.unix_micros("purchase_ts").alias("purchase_us"),
            )
            .collect()
        }
        assert got == want and len(want) > 0
        # rollup equality against the batch query's headline numbers
        n_view = sum(1 for v in got.values() if v[0] is not None)
        n_full = sum(1 for v in got.values() if v[2] is not None)
        batch = events_funnel(spark, sf_dir).first()
        assert (len(got), n_view, n_full) == (batch.n_users, batch.n_view, batch.n_full_funnel)
    finally:
        q.stop()


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    """Events split into two files along the time axis (all of a user's
    earlier events in file 0, later in file 1) with staggered mtimes —
    with maxFilesPerTrigger=1 the file source processes them as TWO
    micro-batches in order, so stateful twins must carry state across
    the batch boundary to stay equal to batch."""
    import time as _time

    import glob

    d = tmp_path_factory.mktemp("events_split")
    stage = tmp_path_factory.mktemp("events_split_stage")
    ev = _events(spark, sf_dir)
    cut = ev.agg(F.expr("percentile_approx(unix_micros(ts), 0.5)")).first()[0]
    halves = [
        ev.filter(F.unix_micros("ts") <= cut),
        ev.filter(F.unix_micros("ts") > cut),
    ]
    for i, half in enumerate(halves):
        # write.parquet produces a DIRECTORY; the file stream source
        # wants flat files — extract the single part file
        out = str(stage / f"h{i}")
        half.coalesce(1).write.mode("overwrite").parquet(out)
        (part,) = glob.glob(f"{out}/part-*.parquet")
        shutil.copy(part, d / f"part{i}.parquet")
        _time.sleep(1.1)  # distinct mtimes → deterministic file order
    return str(d)


def test_twap_stream_multibatch_carries_state(spark, sf_dir, split_events_dir):
    """Two micro-batches: the open (last_ts, last_value) reading must
    survive the batch boundary — the interval that STRADDLES the split
    only exists if state carried. Final per-user rows (argmax by
    n_intervals across update-mode emissions) must equal batch."""
    from molgraphdb_spark.queries.temporal import events_twap
    from molgraphdb_spark.streaming.windows import twap_stream

    ev = read_events_stream(spark, split_events_dir)  # maxFilesPerTrigger=1
    q = run_to_memory(twap_stream(ev), "t_twap_mb", output_mode="update")
    try:
        final = (
            spark.table("t_twap_mb")
            .groupBy("user_id")
            .agg(F.max(F.struct("n_intervals", "total_dur_us", "twap_u")).alias("s"))
            .select("user_id", "s.n_intervals", "s.total_dur_us", "s.twap_u")
        )
        got = {
            r.user_id: (r.n_intervals, r.total_dur_us, r.twap_u) for r in final.collect()
        }
        want = {
            r.user_id: (r.n_intervals, r.total_dur_us, r.twap_u)
            for r in events_twap(spark, sf_dir).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_funnel_stream_multibatch_carries_state(spark, sf_dir, split_events_dir):
    """Funnel stages set in batch 0 (e.g. the first view) must gate
    transitions observed in batch 1 (a click after the split) — max per
    column across emissions is the final state (stages are set-once)."""
    from molgraphdb_spark.queries.events import funnel_stages
    from molgraphdb_spark.streaming.windows import funnel_stage_stream

    ev = read_events_stream(spark, split_events_dir)
    q = run_to_memory(funnel_stage_stream(ev), "t_funnel_mb", output_mode="update")
    try:
        final = (
            spark.table("t_funnel_mb")
            .groupBy("user_id")
            .agg(
                F.max("view_us").alias("view_us"),
                F.max("click_us").alias("click_us"),
                F.max("purchase_us").alias("purchase_us"),
            )
        )
        got = {
            r.user_id: (r.view_us, r.click_us, r.purchase_us) for r in final.collect()
        }
        want = {
            r.user_id: (r.view_us, r.click_us, r.purchase_us)
            for r in funnel_stages(_events(spark, sf_dir))
            .select(
                "user_id",
                F.unix_micros("view_ts").alias("view_us"),
                F.unix_micros("click_ts").alias("click_us"),
                F.unix_micros("purchase_ts").alias("purchase_us"),
            )
            .collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_ohlc_stream_equals_batch(spark, sf_dir, events_stream_dir):
    """Streaming OHLC bars must equal the batch resample bar-for-bar —
    including open/close, which depend on the deterministic
    (ts, event_id) ordering key, not arrival order."""
    from molgraphdb_spark.queries.temporal import events_ohlc_resample
    from molgraphdb_spark.streaming.windows import ohlc_bars

    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(ohlc_bars(ev), "t_ohlc")
    try:
        got = {
            (r.bar_start_us, r.event_type): (r.open, r.high, r.low, r.close, r.n_events)
            for r in spark.table("t_ohlc").collect()
        }
        want = {
            (r.bar_start_us, r.event_type): (r.open, r.high, r.low, r.close, r.n_events)
            for r in events_ohlc_resample(spark, sf_dir).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_moments_stream_matches_batch_anomalies(spark, sf_dir, events_stream_dir):
    """The streaming per-user moment accumulator must carry exact
    (n, S, Q) across micro-batches; flags derived from the final
    moments must equal the batch events_anomaly_outliers output."""
    from molgraphdb_spark.queries.temporal import (
        MIN_ANOMALY_N,
        events_anomaly_outliers,
    )
    from molgraphdb_spark.queries.events import _events
    from molgraphdb_spark.streaming.windows import user_moments_stream
    import math

    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(user_moments_stream(ev), "t_moments", output_mode="update")
    try:
        moments = {
            r.user_id: (r.n, int(r.s), int(r.q))
            for r in spark.table("t_moments").collect()
        }
        # exact-moment equality vs batch aggregation
        from pyspark.sql import functions as F

        v_u = F.floor(F.col("value") * 1_000_000 + 0.5).cast("long")
        batch = (
            _events(spark, sf_dir)
            .select("user_id", v_u.alias("v_u"))
            .filter(F.col("v_u").isNotNull())
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v_u").cast("decimal(38,0)")).alias("s"),
                F.sum(F.col("v_u").cast("decimal(38,0)") * F.col("v_u")).alias("q"),
            )
        )
        want_m = {r.user_id: (r.n, int(r.s), int(r.q)) for r in batch.collect()}
        assert moments == want_m and len(want_m) > 0
        # flags derived from final moments == batch anomaly query
        ev_rows = (
            _events(spark, sf_dir)
            .select("event_id", "user_id", v_u.alias("v_u"))
            .filter(F.col("v_u").isNotNull())
            .collect()
        )
        flagged = set()
        for r in ev_rows:
            n, s, qq = moments[r.user_id]
            if n >= MIN_ANOMALY_N and (n * r.v_u - s) ** 2 > 4 * (n * qq - s * s):
                flagged.add(r.event_id)
        want = {r.event_id for r in events_anomaly_outliers(spark, sf_dir).collect()}
        assert flagged == want
    finally:
        q.stop()


def test_source_kl_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """Running (source, token) counts accumulated across micro-batches,
    then the SHARED kl_from_counts derivation — output must equal the
    batch source_token_divergence exactly (the counts state is integer,
    so there is no drift to tolerate)."""
    from pyspark.sql import functions as F

    from molgraphdb_spark.queries.text import kl_from_counts, source_token_divergence
    from molgraphdb_spark.streaming.windows import (
        read_documents_stream,
        source_token_counts_stream,
    )

    # split documents into 3 files so the stream runs multiple batches
    d = tmp_path_factory.mktemp("docs_stream")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).repartition(
        3
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    docs = read_documents_stream(spark, str(d / "documents.parquet"))
    q = run_to_memory(source_token_counts_stream(docs), "t_kl_counts")
    try:
        # localCheckpoint: the memory-sink view keeps fixed attribute
        # ids, so self-referencing joins inside kl_from_counts hit
        # Spark's conflicting-reference resolution — snapshotting first
        # gives the derivation an ordinary plan
        counts = spark.table("t_kl_counts").localCheckpoint()
        got = [tuple(r) for r in kl_from_counts(counts).collect()]
        want = [tuple(r) for r in source_token_divergence(spark, sf_dir).collect()]
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_mg_stream_bounds_and_exactness(spark, sf_dir, tmp_path_factory):
    """Streaming sharded Misra–Gries vs exact batch counts. Low-
    cardinality column (event_type, <= k items per shard): estimates
    are EXACT. High-cardinality column (json prop, ~100 values over 8
    shards): eviction engages and the MG bound est <= true <= est +
    n_shard/(k+1) must hold, with every over-threshold item present."""
    from pyspark.sql import functions as F

    from molgraphdb_spark.streaming.windows import (
        MG_STREAM_SHARDS,
        heavy_hitters_stream,
        read_events_stream,
    )

    d = tmp_path_factory.mktemp("ev_stream_mg")
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).repartition(
        3
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    def final_summaries(col):
        ev = read_events_stream(spark, str(d / "events.parquet"))
        q = run_to_memory(
            heavy_hitters_stream(ev, col=col), f"t_mg_{col}", output_mode="update"
        )
        try:
            rows = spark.table(f"t_mg_{col}").collect()
        finally:
            q.stop()
        last_n = {}
        for r in rows:
            last_n[r["shard"]] = max(last_n.get(r["shard"], -1), r["n_shard"])
        return {
            r["item"]: (r["weight"], r["n_shard"])
            for r in rows
            if r["n_shard"] == last_n[r["shard"]]
        }

    from molgraphdb_spark.queries.events import _events

    ev_b = _events(spark, sf_dir)

    # low-cardinality: exact
    got = final_summaries("event_type")
    want = {
        r["event_type"]: r["c"]
        for r in ev_b.groupBy("event_type").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {i: w for i, (w, _) in got.items()} == want

    # high-cardinality: MG bound + presence guarantee per shard
    ev_prop = ev_b.select(
        F.get_json_object("props", "$.k").cast("string").alias("item")
    ).filter(F.col("item").isNotNull())
    exact = {
        r["item"]: r["c"]
        for r in ev_prop.groupBy("item").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    shard_of = {
        r["item"]: r["shard"]
        for r in ev_prop.select(
            "item",
            (F.abs(F.xxhash64("item")) % MG_STREAM_SHARDS).cast("int").alias("shard"),
        )
        .distinct()
        .collect()
    }
    spark.sql("DROP TABLE IF EXISTS t_mg_propk")
    ev = read_events_stream(spark, str(d / "events.parquet"))
    stream = (
        ev.select(F.get_json_object("props", "$.k").cast("string").alias("pk"))
    )
    # reuse the operator on the derived column
    from molgraphdb_spark.streaming.windows import heavy_hitters_stream as hhs

    q = run_to_memory(hhs(stream, col="pk"), "t_mg_propk", output_mode="update")
    try:
        rows = spark.table("t_mg_propk").collect()
    finally:
        q.stop()
    last_n = {}
    for r in rows:
        last_n[r["shard"]] = max(last_n.get(r["shard"], -1), r["n_shard"])
    summ = {
        r["item"]: (r["weight"], r["n_shard"])
        for r in rows
        if r["n_shard"] == last_n[r["shard"]]
    }
    k = 8
    for item, (est, n_shard) in summ.items():
        assert est <= exact[item] <= est + n_shard // (k + 1), item
    for item, true in exact.items():
        n_shard = max(
            (ns for i, (_, ns) in summ.items() if shard_of[i] == shard_of[item]),
            default=0,
        )
        if n_shard and true > n_shard // (k + 1):
            assert item in summ, (item, true)


def test_trend_stream_matches_batch_moments(spark, sf_dir, events_stream_dir):
    """The streaming per-type OLS accumulator must carry exact
    (n, Σx, Σy, Σxy, Σx²) across micro-batches — equal to a batch
    aggregation over the same x = unshifted-epoch-seconds definition —
    and the slope derived from the shift-invariant integer identities
    must equal the slope from batch moments."""
    from pyspark.sql import functions as F

    from molgraphdb_spark.queries.events import _events
    from molgraphdb_spark.streaming.windows import value_trend_stream

    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(value_trend_stream(ev), "t_trend", output_mode="update")
    try:
        got = {
            r.event_type: (r.n, int(r.sx), int(r.sy), int(r.sxy), int(r.sxx))
            for r in spark.table("t_trend").collect()
        }
        dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
        base = _events(spark, sf_dir).select(
            "event_type",
            (F.unix_micros("ts") / 1_000_000).cast("long").alias("x"),
            F.floor(F.col("value") * 1_000_000 + 0.5).cast("long").alias("y"),
        ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        batch = base.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec(F.col("x"))).alias("sx"),
            F.sum(dec(F.col("y"))).alias("sy"),
            F.sum(dec(F.col("x")) * F.col("y")).alias("sxy"),
            F.sum(dec(F.col("x")) * F.col("x")).alias("sxx"),
        )
        want = {
            r.event_type: (r.n, int(r.sx), int(r.sy), int(r.sxy), int(r.sxx))
            for r in batch.collect()
        }
        assert got == want and len(want) > 0
        # derived slopes agree between stream state and batch moments
        for t, (n, sx, sy, sxy, sxx) in got.items():
            den = n * sxx - sx * sx
            wn, wsx, wsy, wsxy, wsxx = want[t]
            wden = wn * wsxx - wsx * wsx
            assert den == wden
            if den:
                assert (n * sxy - sx * sy) * 1_000_000 // den == (
                    wn * wsxy - wsx * wsy
                ) * 1_000_000 // wden
    finally:
        q.stop()


def test_bot_stream_matches_batch_flags(spark, sf_dir, events_stream_dir):
    """The streaming gap-moment accumulator must carry exact
    (last_ts, n, Σg, Σg²) across micro-batches; the CV² flags derived
    from the final moments must equal the batch events_bot_regularity
    output exactly."""
    import math

    from molgraphdb_spark.queries.temporal import (
        BOT_CV2_BP,
        MIN_BOT_GAPS,
        events_bot_regularity,
    )
    from molgraphdb_spark.streaming.windows import bot_regularity_stream

    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(bot_regularity_stream(ev), "t_bot", output_mode="update")
    try:
        got = {}
        for r in spark.table("t_bot").collect():
            n, sg, sgg = r.n_gaps, int(r.sg), int(r.sgg)
            if n < MIN_BOT_GAPS:
                continue
            den = sg * sg
            cv2 = 0 if den == 0 else math.floor(
                float((n * sgg - sg * sg) * 10_000) / float(den)
            )
            got[r.user_id] = (n, cv2, int(cv2 < BOT_CV2_BP))
        want = {
            r.user_id: (r.n_gaps, r.cv2_bp, r.is_bot)
            for r in events_bot_regularity(spark, sf_dir).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_quality_classifier_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """The stateless scorer + streaming counters must reproduce the
    batch doc_quality_classifier exactly across micro-batches (integer
    state — no drift to tolerate). accept_bp is derived from the
    streamed counters with the same positive-operand DIV."""
    from pyspark.sql import functions as F

    from molgraphdb_spark.queries.text import doc_quality_classifier
    from molgraphdb_spark.streaming.windows import (
        quality_classifier_stream,
        read_documents_stream,
    )

    d = tmp_path_factory.mktemp("docs_qc_stream")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).repartition(
        3
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    docs = read_documents_stream(spark, str(d / "documents.parquet"))
    q = run_to_memory(quality_classifier_stream(docs), "t_qc_counts")
    try:
        got = {
            r.source: (r.n_docs, r.accepted, r.accept_bp, r.sum_score_milli)
            for r in spark.table("t_qc_counts")
            .withColumn("accept_bp", F.expr("accepted * 10000 DIV n_docs"))
            .collect()
        }
        want = {
            r.source: (r.n_docs, r.accepted, r.accept_bp, r.sum_score_milli)
            for r in doc_quality_classifier(spark, sf_dir).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_chunk_spans_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """The stateless RAG chunker must emit exactly the batch
    doc_chunk_spans rows across micro-batches (append mode, no state,
    shared chunk_rows code path)."""
    from molgraphdb_spark.queries.text import doc_chunk_spans
    from molgraphdb_spark.streaming.windows import (
        chunk_spans_stream,
        read_documents_stream,
    )

    d = tmp_path_factory.mktemp("docs_chunk_stream")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).repartition(
        3
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    docs = read_documents_stream(spark, str(d / "documents.parquet"))
    q = run_to_memory(chunk_spans_stream(docs), "t_chunk_spans", "append")
    try:
        got = sorted(tuple(r) for r in spark.table("t_chunk_spans").collect())
        want = sorted(tuple(r) for r in doc_chunk_spans(spark, sf_dir).collect())
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_cusum_stream_equals_batch(spark, sf_dir, events_stream_dir):
    """The streaming CUSUM (one integer state cell per type, running
    Page's recurrence directly) must reproduce the batch
    events_cusum_alarms counters exactly, given the same calibration
    reference (the batch twin's self-mu)."""
    from molgraphdb_spark.queries.temporal import (
        cusum_reference_params,
        events_cusum_alarms,
    )
    from molgraphdb_spark.streaming.windows import cusum_stream

    params = cusum_reference_params(spark, sf_dir)
    ev = read_events_stream(spark, events_stream_dir)
    q = run_to_memory(cusum_stream(ev, params), "t_cusum", output_mode="update")
    try:
        got = {
            r.event_type: (r.n_events, r.n_alarms, r.max_cusum_micro)
            for r in spark.table("t_cusum").collect()
        }
        want = {
            r.event_type: (r.n_events, r.n_alarms, r.max_cusum_micro)
            for r in events_cusum_alarms(spark, sf_dir).collect()
        }
        assert got == want and len(want) > 0
    finally:
        q.stop()


def test_cusum_stream_multibatch_carries_state(spark, sf_dir, split_events_dir):
    """CUSUM is order-DEFINED: s_i depends on the whole prefix, so the
    current cusum value must survive the micro-batch boundary (the
    in-order arrival contract pinned in make_cusum_state_fn). Two
    time-ordered micro-batches; final per-type rows (argmax by
    n_events across update-mode emissions) must equal batch."""
    from molgraphdb_spark.queries.temporal import (
        cusum_reference_params,
        events_cusum_alarms,
    )
    from molgraphdb_spark.streaming.windows import cusum_stream

    params = cusum_reference_params(spark, sf_dir)
    ev = read_events_stream(spark, split_events_dir)  # maxFilesPerTrigger=1
    q = run_to_memory(cusum_stream(ev, params), "t_cusum_mb", output_mode="update")
    try:
        final = (
            spark.table("t_cusum_mb")
            .groupBy("event_type")
            .agg(F.max(F.struct("n_events", "n_alarms", "max_cusum_micro")).alias("s"))
            .select("event_type", "s.n_events", "s.n_alarms", "s.max_cusum_micro")
        )
        got = {
            r.event_type: (r.n_events, r.n_alarms, r.max_cusum_micro)
            for r in final.collect()
        }
        want = {
            r.event_type: (r.n_events, r.n_alarms, r.max_cusum_micro)
            for r in events_cusum_alarms(spark, sf_dir).collect()
        }
        assert got == want and len(want) > 0
        # the split actually produced 2+ batches (state carry exercised)
        n_types = len(want)
        assert spark.table("t_cusum_mb").count() > n_types
    finally:
        q.stop()


def test_cusum_state_fn_sorts_across_arrow_chunks():
    """A micro-batch group larger than arrow.maxRecordsPerBatch arrives
    as SEVERAL pandas chunks; the recurrence must sort by (ts, event_id)
    across ALL of them, not per chunk (r10 ADVICE). Feed two chunks
    whose global time order interleaves: a per-chunk sort would process
    [1,3] then [2,4] and diverge on the max-cusum counter."""
    import pandas as pd

    from molgraphdb_spark.streaming.windows import make_cusum_state_fn

    class FakeState:
        exists = False

        def __init__(self):
            self.stored = None

        def update(self, v):
            self.stored = v

    # d=0, h=10**9 (never alarms): s is the running prefix sum of x,
    # clamped at 0. Values in micro: ts order is 1,2,3,4 with values
    # +5, -3, -4, +2 → s path 5,2,0,2, max 5. Per-CHUNK sort order
    # 1,3,2,4 gives path 5,1,0,2 but max 5 too — so use values that
    # split the max: +1, +4, -5, +3 → global path 1,5,0,3 (max 5);
    # chunk order 1,3,2,4 path 1,0,4,7 (max 7).
    fn = make_cusum_state_fn({"t": (0, 10**9)})
    mk = lambda ts, eid, v: pd.DataFrame(
        {"ts": ts, "event_id": eid, "value": v}
    )
    chunk_a = mk([1_000_000, 3_000_000], [1, 3], [1.0, -5.0])
    chunk_b = mk([2_000_000, 4_000_000], [2, 4], [4.0, 3.0])
    state = FakeState()
    out = list(fn(("t",), iter([chunk_a, chunk_b]), state))
    assert state.stored is not None
    s, n, alarms, mx = state.stored
    assert (s, n, alarms) == (3_000_000, 4, 0)
    assert mx == 5_000_000, "cross-chunk order was not globally sorted"
    assert out[0]["max_cusum_micro"].iloc[0] == 5_000_000
