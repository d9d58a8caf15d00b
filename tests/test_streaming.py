"""Streaming/batch parity: the streaming operators drained with
Trigger.AvailableNow must agree with their batch twins on the same files."""

from __future__ import annotations

import pytest

from graph_loom_spark.ops import events as batch_events
from graph_loom_spark.streaming import events_stream as se

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    """File-source streams need a *directory*; the driver testdata is a
    single parquet file — stage it into one."""
    d = tmp_path_factory.mktemp("events_stream")
    (d / "part-0.parquet").write_bytes(open(f"{SF_DIR}/events.parquet", "rb").read())
    return str(d)


def test_stream_hourly_matches_batch(spark, events_path):
    stream = se.read_events_stream(spark, events_path)
    se.run_available_now(se.stream_hourly_agg(stream), "hourly_t")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM hourly_t").collect()
    }
    batch = batch_events.hourly_agg(batch_events.load_events(spark, events_path))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got == want


def test_stream_sessionize_matches_batch_counts(spark, events_path):
    stream = se.read_events_stream(spark, events_path)
    se.run_available_now(se.stream_sessionize(stream), "sessions_t")
    rows = spark.sql(
        "SELECT user_id, count(*) AS n_sessions FROM sessions_t GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: r["n_sessions"] for r in rows}
    batch = batch_events.sessionize(batch_events.load_events(spark, events_path))
    want = {r["user_id"]: r["n_sessions"] for r in batch.collect()}
    assert got == want
