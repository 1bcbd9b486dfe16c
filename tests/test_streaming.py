"""Streaming semantics pinned against batch equivalents: the streaming
window/dedup results over the fixed events fixture must equal the same
aggregation computed in batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from orchestrated_etl_spark.sources.catalog import read_events
from orchestrated_etl_spark.streaming import windows as W
from orchestrated_etl_spark.streaming.events_stream import (
    read_events_stream,
    run_available_now,
)


def test_tumbling_daily_matches_batch(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        W.tumbling_counts(ev, duration="1 day", watermark="1 hour"),
        output_mode="complete",
    )
    stream_rows = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in out.collect()
    }
    batch = (
        read_events(spark, sf_dir)
        .groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    batch_rows = {(r["day"], r["event_type"]): r["n"] for r in batch.collect()}
    assert stream_rows == batch_rows


def test_streaming_dedup_matches_distinct(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    dd = run_available_now(
        W.streaming_dedup(ev, ["user_id", "event_type"], watermark="1 hour"),
        output_mode="append",
    )
    got = {
        r["event_type"]: r["n"]
        for r in dd.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in read_events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_session_windows_match_batch(spark, sf_dir):
    ev = read_events_stream(spark, sf_dir)
    out = run_available_now(
        W.session_windows(ev, gap="10 minutes", watermark="1 hour"),
        output_mode="complete",
    )
    batch = (
        read_events(spark, sf_dir)
        .groupBy(F.session_window("ts", "10 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    key = lambda r: (r["session_start"], r["user_id"])  # noqa: E731
    got = sorted(
        ((r["session_start"], r["user_id"], r["n_events"], r["sum_value"])
         for r in out.collect())
    )
    want = sorted(
        ((r["session_start"], r["user_id"], r["n_events"], r["sum_value"])
         for r in batch.collect())
    )
    assert got == want


def test_stateful_running_totals_match_batch(spark, sf_dir):
    """applyInPandasWithState final state == batch groupBy over the same
    events (count, rounded sum, max ts per user)."""
    from orchestrated_etl_spark.queries.streaming_queries import _stateful

    out = _stateful(spark, sf_dir)
    batch = (
        read_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
    )
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want
