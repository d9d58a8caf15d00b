"""Structured Streaming forms of the event operators (extension surface;
the reference has no streaming — SURVEY §2.11).

Each function mirrors a batch operator in ``ops.events`` so results are
checkable against the batch/oracle path on the same files:

- ``read_events_stream``: file-source stream with the same nanos→micros
  timestamp normalization as the batch loader;
- ``stream_hourly_agg``: tumbling window + watermark (late data beyond
  the watermark is dropped — the 100 TB ingestion pattern);
- ``stream_sessionize``: ``session_window`` gap sessions, the streaming
  equivalent of the batch lag/cumsum sessionizer;
- ``run_available_now``: drains everything currently in the source with
  ``Trigger.AvailableNow`` into an in-memory table — used by tests to
  prove stream/batch parity.

Scale notes: watermark + windowed aggregation keeps state bounded by
(watermark horizon × key cardinality); ``session_window`` state is per
(user, open session). File listing is incremental (``maxFilesPerTrigger``
governs batch size under backpressure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet dir; ts normalized to a
    session-TZ TIMESTAMP exactly like the batch loader (ops.events).

    File-source streams need an explicit schema, and the right one
    depends on how the writer encoded ``ts`` (TIMESTAMP(NANOS) → long
    under the legacy conf; micros → TIMESTAMP_NTZ or TIMESTAMP) — probe
    it with a one-file batch read of the same directory, then apply the
    matching normalization. An empty or not-yet-created directory is a
    normal startup condition for a file-source stream; the probe then
    falls back to the legacy long-nanos schema rather than refusing to
    define the stream."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        probed = dict(spark.read.parquet(path).dtypes).get("ts")
    except Exception:  # AnalysisException: path missing / no files yet
        probed = "bigint"
    if probed == "bigint":
        schema, ts_type = _events_schema(T.LongType()), "nanos"
    elif probed == "timestamp_ntz":
        schema, ts_type = _events_schema(T.TimestampNTZType()), "ntz"
    else:
        schema, ts_type = _events_schema(T.TimestampType()), "ltz"
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    if ts_type == "nanos":
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def stream_hourly_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window per event_type with a watermark: the
    streaming twin of ``ops.events.hourly_agg`` (same output schema)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_daily_active(
    events: DataFrame, watermark: str = "25 hours"
) -> DataFrame:
    """Streaming DAU — the live twin of the batch
    ``ops.events.active_users`` DAU column: exact distinct users per
    calendar day as ``(day, dau)``, day as the ISO string. Two CHAINED
    stateful aggregations (Spark ≥3.5 multiple-stateful-operator
    support): a tumbling 1-day window per (window, user) dedups each
    user to one row per day (state = users seen in open windows, the
    exact-distinct state bound), then a second aggregate over the same
    window counts them. The default watermark holds a day's state open
    for one late hour past the day boundary; at 100 TB the state is
    |active users per open day| rows — the rollup every engagement
    dashboard keeps hot anyway."""
    w = F.window("ts", "1 day").alias("w")
    per_user = (
        events.withWatermark("ts", watermark)
        .groupBy(w, "user_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # re-window on window_time(w): the Spark ≥3.4 pattern that carries
    # the event-time watermark METADATA into the second stateful
    # aggregate — grouping on the raw window struct trips the global-
    # watermark correctness check
    w2 = F.window(F.window_time("w"), "1 day").alias("w2")
    return (
        per_user.groupBy(w2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
        .select(F.date_format(F.col("w2.start"), "yyyy-MM-dd").alias("day"), "dau")
    )


def stream_sessionize(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions per user via ``session_window``; emits one row
    per closed session (streaming state = open sessions only)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_seconds} seconds").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").cast("string").alias("session_start"),
            F.col("sw.end").cast("string").alias("session_end"),
            "n_events",
        )
    )


def stream_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach a (bounded) dimension table
    to every event as it arrives — the standard lookup-join stage of an
    ingestion pipeline (user profile, geo table, experiment assignment).

    Structured Streaming supports static-side joins natively; the static
    frame is broadcast-hinted since a dimension a stream enriches
    against should never force a per-micro-batch shuffle of the stream
    side — on a cluster the dim ships once per executor and each
    micro-batch is a map-side hash probe. Stateless: no watermark, no
    state store, and re-planned per trigger so a refreshed dim path
    would be picked up by a restarted query. Stream ≡ batch row-for-row
    (pinned in tests/test_streaming.py).
    """
    return events.join(F.broadcast(dim), on, how)


def stream_interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Streaming twin of ``ops.events.interval_join``: tag each arriving
    event with every (static) interval containing it — e.g. maintenance
    windows, VIP sessions, experiment exposure windows.

    The batch operator's bucketed equi-join composes directly with
    Structured Streaming because it is STATELESS: the static interval
    side is pre-exploded to its covered buckets, the stream side derives
    its single bucket in a narrow projection, and the join is a plain
    stream-static equi-join (broadcast-hinted — each micro-batch is a
    map-side probe, no state store, no watermark). A range predicate
    against a static table would otherwise be a per-batch nested-loop.
    Stream ≡ batch row-for-row (pinned in tests/test_streaming.py).
    """
    on = list(on or [])
    b = lambda c: F.floor(F.col(c).cast("long") / F.lit(int(bucket_seconds)))  # noqa: E731
    iv = intervals.withColumn(
        "__b", F.explode(F.sequence(b(start_col), b(end_col)))
    )
    pt = events.withColumn("__b", b(ts_col))
    return (
        pt.join(F.broadcast(iv), on + ["__b"])
        .filter(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("__b")
    )


def stream_sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful sessionizer via ``applyInPandasWithState`` — the
    pattern for session logic ``session_window`` cannot express (here:
    per-session value sum and event count carried in explicit state).

    State per user = the one open session ``(start, last, n, sum_value)``
    as epoch-micros longs; a batch's events merge in event-time order,
    closing a session (one emitted row) at every >gap jump; the trailing
    open session waits in state and is closed by event-time timeout once
    the watermark passes ``last + gap``. State is bounded by one row per
    active user — the 100 TB concern is key cardinality, not history.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, sum_value double"
    )
    state_schema = "start long, last long, n long, sv double"
    gap_us = gap_seconds * 1_000_000

    def _row(uid, start_us, last_us, n, sv):
        return {
            "user_id": uid,
            "session_start": pd.Timestamp(start_us, unit="us"),
            "session_end": pd.Timestamp(last_us, unit="us"),
            "n_events": n,
            "sum_value": sv,
        }

    def fn(key, pdf_iter, state: GroupState):
        uid = key[0]
        if state.hasTimedOut:
            start, last, n, sv = state.get
            state.remove()
            yield pd.DataFrame([_row(uid, start, last, n, sv)])
            return
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        ts_us = (batch["ts"].astype("int64") // 1000).to_numpy()
        vals = batch["value"].fillna(0.0).to_numpy()
        order = ts_us.argsort(kind="stable")
        cur = state.get if state.exists else None
        closed = []
        for i in order:
            t, v = int(ts_us[i]), float(vals[i])
            if cur is None:
                cur = (t, t, 1, v)
            elif t - cur[1] > gap_us:
                closed.append(_row(uid, *cur))
                cur = (t, t, 1, v)
            else:
                cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
        state.update(cur)
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)  # epoch millis
        if closed:
            yield pd.DataFrame(closed)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def run_available_now(
    result: DataFrame, table_name: str, timeout_s: int = 300, output_mode: str = "complete"
) -> None:
    """Drain the full source once (Trigger.AvailableNow) into an
    in-memory table ``table_name`` and block until done."""
    q = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"stream {table_name} did not drain in {timeout_s}s")


def stream_anomaly_stateful(
    events: DataFrame,
    z_thresh: float = 3.0,
    min_history: int = 5,
    watermark: str = "2 hours",
) -> DataFrame:
    """Online per-user anomaly detection via ``applyInPandasWithState``:
    each user's state is the running ``(n, mean, M2)`` Welford moments of
    ``value``; an event is flagged when its z-score against the state
    BEFORE it is absorbed exceeds ``z_thresh`` (after ``min_history``
    prior events). Emits ``(user_id, event_id, ts, value, z)`` per
    flagged event.

    This is the streaming-native form of
    :func:`graph_loom_spark.ops.events.user_extreme_events`: batch scores
    against the COMPLETE per-user distribution; a stream can only score
    against history seen so far, so the two legitimately differ — the
    pytest checks the stream against a pure-Python replay of the same
    online rule instead of the batch operator.

    Scale shape: state is 3 doubles + a long per user (bounded by key
    cardinality, not history); per micro-batch work is one grouped Arrow
    batch per user partition. Events inside a batch are processed in
    (event-time, event_id) order so replays are deterministic; Welford
    updates are numerically stable for long histories.
    """
    import math

    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, event_id long, ts timestamp, value double, z double"
    state_schema = "n long, mean double, m2 double"

    def fn(key, pdf_iter, state: GroupState):
        uid = key[0]
        batch = pd.concat(list(pdf_iter), ignore_index=True)
        ts_us = (batch["ts"].astype("int64") // 1000).to_numpy()
        ids = batch["event_id"].to_numpy()
        vals = batch["value"].fillna(0.0).to_numpy()
        order = sorted(range(len(ids)), key=lambda i: (ts_us[i], ids[i]))
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        hits = []
        for i in order:
            v = float(vals[i])
            if n >= min_history and n >= 2:
                var = m2 / (n - 1)
                if var > 0:
                    z = (v - mean) / math.sqrt(var)
                    if abs(z) >= z_thresh:
                        hits.append(
                            {
                                "user_id": uid,
                                "event_id": int(ids[i]),
                                "ts": pd.Timestamp(int(ts_us[i]), unit="us"),
                                "value": v,
                                "z": round(z, 4),
                            }
                        )
            n += 1
            delta = v - mean
            mean += delta / n
            m2 += delta * (v - mean)
        state.update((n, mean, m2))
        if hits:
            yield pd.DataFrame(hits)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
