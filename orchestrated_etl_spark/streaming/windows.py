"""Event-time windowed aggregations and streaming dedup (SURVEY §2.7 gap
list; S4's honest analogue).

State-store posture for 100 TB streams: every operator here keys its state
by (window × group) or dedup key — state size is bounded by watermark
expiry, not stream length. Watermarks are mandatory on unbounded streams;
the helpers refuse to build an unbounded stateful plan without one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation with watermark-bounded
    state. Late rows beyond the watermark are dropped (the documented
    late-data policy), matching the reference's implicit drop of data
    scraped after its 5-min run window."""
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration), *group_cols)
        .agg(*aggs)
    )
    # Output bounds as TIMESTAMP_NTZ (wall clock): the stream column is
    # LTZ only because withWatermark rejects NTZ, and LTZ values collect
    # through the PYTHON PROCESS timezone (datetime.fromtimestamp), not
    # the session timezone — under a non-UTC process TZ the rendered
    # bounds shift even though the windows are computed correctly in the
    # UTC session read_events_stream pins (round-10 TZ-sweep finding).
    # The LTZ->NTZ cast renders via the SESSION timezone (UTC), so the
    # output is the same wall clock on any host.
    return (
        out.withColumn(
            "window_start", F.col("window.start").cast("timestamp_ntz")
        )
        .withColumn(
            "window_end", F.col("window.end").cast("timestamp_ntz")
        )
        .drop("window")
    )


def sliding_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration, slide), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            # NTZ wall-clock output — see tumbling_counts for the
            # process-TZ collection hazard this avoids.
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            F.col("window.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: per-key activity runs separated by > gap. State
    merges adjacent sessions as rows arrive; watermark closes sessions."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL accumulation → exact, order-independent; cast back to
            # double so the oracle compare is strict without round() ties.
            F.sum(F.col("value").cast("decimal(25,10)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            # NTZ wall-clock output — see tumbling_counts for the
            # process-TZ collection hazard this avoids.
            F.col("session_window.start")
            .cast("timestamp_ntz")
            .alias("session_start"),
            F.col("session_window.end")
            .cast("timestamp_ntz")
            .alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming dropDuplicates with watermark-bounded state — the honest
    analogue of the reference's unbounded in-memory ``seen_titles`` set
    (S4, dags/dag.py:72,97-98), which would OOM on an unbounded stream.
    ``dropDuplicatesWithinWatermark`` evicts keys once the watermark
    passes, so state is bounded by (key cardinality within horizon)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
