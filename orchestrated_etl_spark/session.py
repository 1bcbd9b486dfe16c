"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads,
single JVM); the configuration below is nevertheless written for a real
multi-executor cluster: AQE handles runtime partition coalescing and
skew-join splitting, shuffle partition count is sized for the local core
count (raise via env on a cluster), Arrow accelerates every
pandas_udf/applyInPandas boundary, and the session timezone is pinned to
UTC so timestamp semantics are deployment-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # --- optimizer / runtime re-planning -------------------------------
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let the planner choose shuffled-hash over sort-merge when its size
    # conditions hold (one side small enough to hash per partition):
    # skips the per-partition sorts entirely. The r18 optimization pass
    # measured the headline suite at -1.5 s (iterative joins — BFS
    # frontier, pagerank ranks, LSH bucket/verify joins — benefit most:
    # their probe sides re-sort every round under sort-merge). Joins
    # whose sides exceed the planner's size conditions still plan
    # sort-merge, so the spill-graceful path remains the default for
    # data-sized x data-sized joins at 100 TB.
    "spark.sql.join.preferSortMergeJoin": "false",
    # --- deterministic semantics --------------------------------------
    "spark.sql.session.timeZone": "UTC",
    # --- python boundary ----------------------------------------------
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # --- broadcast: the construction-FIXED dims (region: 5 rows,
    # nation: 25 — schemas.BROADCAST_TABLES) are the only relations the
    # engine force-broadcasts; customer/supplier GROW with sf, so they
    # reach the broadcast path only while their actual size is under
    # this threshold (AQE/threshold decide, never a forced hint). 64 MB
    # keeps small actuals broadcast at bench scale without driver OOM.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # --- scan sizing: 128 MB splits are the parquet sweet spot ---------
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def local_cpus() -> int:
    """Thread count for LOCAL mode, from $SPARK_GRAFT_CPUS (default 32).
    Renamed from ``default_parallelism`` (round-14 review): that name
    collided with ``compat.default_parallelism(spark)`` — the
    cluster-aware shuffle width — and importing the wrong one silently
    gave the 32-thread local default on a real cluster."""
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(
    app_name: str = "orchestrated_etl_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a cluster, pass ``master=None`` with an externally-configured
    master URL; locally this defaults to ``local[$SPARK_GRAFT_CPUS]``.
    ``spark.sql.shuffle.partitions`` defaults to the local thread count —
    on a 1000-executor cluster it should instead be ~2-3× total cores
    (AQE coalesces the excess at runtime, so erring high is safe).
    """
    cpus = local_cpus()
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if os.environ.get("SPARK_GRAFT_DRIVER_MEM"):
        conf["spark.driver.memory"] = os.environ["SPARK_GRAFT_DRIVER_MEM"]
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
