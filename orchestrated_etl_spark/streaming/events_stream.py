"""Streaming source + sink helpers for the events table.

`read_events_stream` exposes events.parquet as a file stream with the same
nanos→micros normalization the batch reader applies (sources/catalog.py).
Tests and the rows-only streaming queries drive it with
``Trigger.AvailableNow`` — deterministic micro-batches over a fixed
directory — which is also the production pattern for "run every N minutes
over whatever arrived" (the reference's cron semantics) without keeping a
cluster hot: each run processes exactly the files not yet committed to the
checkpoint.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(sf_dir: str) -> tuple[T.StructType, bool]:
    """Declared file-stream schema for events.parquet, probed from the
    parquet footer (driver-side, one footer read). TIMESTAMP(NANOS) files
    must be declared LongType under ``nanosAsLong`` and converted;
    micro/millisecond files read as TimestampType directly. Returns
    (schema, ts_is_nanos_long)."""
    import pyarrow.parquet as pq

    field = pq.read_schema(f"{sf_dir}/events.parquet").field("ts")
    nanos = field.type.unit == "ns"
    # Watermarks require TimestampType (LTZ) — TIMESTAMP_NTZ is rejected by
    # withWatermark — so micro/millis columns are declared LTZ: the stored
    # micros are read as UTC instants. Run streaming sessions with
    # spark.sql.session.timeZone=UTC (session.py default) so window
    # boundaries line up with the batch reader's NTZ wall clock.
    ts_type: T.DataType = T.LongType() if nanos else T.TimestampType()
    return (
        T.StructType(
            [
                T.StructField("event_id", T.LongType(), False),
                T.StructField("ts", ts_type, False),
                T.StructField("user_id", T.LongType(), True),
                T.StructField("event_type", T.StringType(), True),
                T.StructField("value", T.DoubleType(), True),
                T.StructField("props", T.StringType(), True),
            ]
        ),
        nanos,
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-source stream with proper TimestampType
    ``ts``. File streams need a declared schema — inference would require
    a listing job per trigger.

    SESSION-WIDE SIDE EFFECT (deliberate, round-14 review made it
    signature-level doc): this sets ``spark.sql.session.timeZone=UTC``
    and ``spark.sql.legacy.parquet.nanosAsLong=true`` on the session and
    does NOT restore them — the timezone pin must still be in force when
    the stream EXECUTES (window boundaries and the Arrow rendering of
    the LTZ ``ts`` evaluate at trigger time, not at plan-build time), so
    a scoped save/restore would silently break the stream it just built.
    A caller running non-UTC batch queries in the same session should
    use a separate session for them."""
    schema, nanos = _events_schema(sf_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The µs/ms file stores NTZ wall-clock values but is declared LTZ above
    # (withWatermark rejects NTZ). Window boundaries match the batch
    # reader's NTZ semantics ONLY when the session renders instants in
    # UTC — force it here rather than relying on the session.py default,
    # since the driver verifies with its own vanilla session.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The [p] glob makes the path a pattern, so the file source accepts a
    # single file (basePath = parent dir) instead of demanding a directory.
    raw = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}/events.[p]arquet")
    )
    if nanos:
        from orchestrated_etl_spark.sources.catalog import nanos_to_micros_ts

        raw = raw.withColumn("ts", nanos_to_micros_ts("ts"))
    return raw


def run_available_now(
    sdf: DataFrame, *, output_mode: str = "append", name: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame to completion with AvailableNow into
    an in-memory table; return the materialized result as a batch
    DataFrame. The memory sink is a test/dev harness — production sinks
    are parquet/Delta via ``writeStream`` or ``foreachBatch`` (see
    plans/pipeline.py for the JDBC-batch pattern)."""
    qname = name or f"q_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    query = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    spark = sdf.sparkSession
    # Detach the result from the run's scaffolding, then clean up: every
    # registered stream query calls this per bench/oracle run, and
    # without cleanup each run leaked a ckpt_* state-store dir in /tmp
    # and a q_<uuid> memory table held in driver memory for the session
    # lifetime (round-14 review). localCheckpoint materializes the small
    # result so dropping the memory-sink view cannot invalidate it.
    out = spark.table(qname).localCheckpoint(eager=True)
    spark.catalog.dropTempView(qname)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out
