"""Spark-Connect-safe accessors for the two ``SparkContext`` reads the
engine needs (round-12 verdict item 3).

A Spark Connect client has no ``SparkSession.sparkContext`` — the
attribute raises ``PySparkAttributeError`` — so any operator touching it
breaks the moment a user points the package at a Connect endpoint (the
deployment shape a 1000-executor shared cluster actually serves).
Everything else the engine uses is Connect-clean in Spark 4
(``DataFrame.localCheckpoint`` included, added to Connect in 4.0); the
two classic-only reads are wrapped here with documented fallbacks
instead of being sprinkled across operators:

- ``default_parallelism``: sizes ``repartition(n, key)`` calls that
  co-locate a join or spread a skewed build side. On classic this is
  ``sc.defaultParallelism`` (cluster core count — the established
  behavior everywhere the engine already runs); on Connect it falls
  back to ``spark.sql.shuffle.partitions``, the knob that already sizes
  every other shuffle in the same plans, so the fallback degrades to
  "no worse than the neighboring exchanges".
- ``application_id``: used only as a per-application cache key for
  staged relations (BM25 posting store, trimmed graph edges). On
  Connect, ``spark.app.id`` is a plain runtime conf read; the final
  fallback keys on the session object identity, which over-invalidates
  (new key per session) but never under-invalidates.

The grep contract in tests/test_plan_audit.py pins ``sparkContext`` to
exactly this module plus the two documented classic-only surfaces
(session.py's log-level call in our own non-Connect builder, and the
vendored protobuf runtime is excluded wholesale), so a new classic-only
touch anywhere else fails the suite.
"""

from __future__ import annotations

from pyspark.errors import PySparkAttributeError
from pyspark.sql import SparkSession


def default_parallelism(spark: SparkSession) -> int:
    """Classic ``sc.defaultParallelism``; on Connect (no sparkContext)
    fall back to ``spark.sql.shuffle.partitions`` — the width every
    neighboring exchange in the same plan already uses."""
    try:
        return spark.sparkContext.defaultParallelism
    except PySparkAttributeError:
        # The Connect signature EXACTLY — not bare AttributeError: a
        # STOPPED classic SparkContext raises plain AttributeError too
        # (SparkContext.stop() sets _jsc=None, so defaultParallelism
        # dereferences None — round-14 review verified against pyspark
        # 4.1.2 source), and that is a real classic-session error which
        # must propagate, not silently resize the repartition
        # (r13 advice, tightened r14).
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))


def staged_checkpoint(df: "DataFrame") -> "DataFrame":  # noqa: F821
    """Eager ``localCheckpoint`` that KEEPS the plan's hash partitioning
    visible to Catalyst (r18, guide §2.1/§2.4).

    Under AQE, ``Dataset.checkpoint`` snapshots
    ``executedPlan.outputPartitioning`` from the not-yet-finalized
    ``AdaptiveSparkPlanExec``, which reports ``UnknownPartitioning`` —
    so every staged layout built with a plain ``localCheckpoint`` loses
    its partitioning and every downstream shuffle-join re-exchanges BOTH
    sides (measured: a repartition(8, id) → localCheckpoint → self-join
    planned 2 exchanges; through this helper, 0 on the staged side, and
    the probe side's exchange adopts the staged partition count). The
    fix is to plan the ONE checkpoint statement non-adaptively: the
    static plan's ``outputPartitioning`` is the real
    ``hashpartitioning(key, n)``, which ``LogicalRDD`` then preserves
    for every later consumer (those consumers still plan under AQE).
    The staging job itself is a deterministic repartition/aggregate —
    nothing AQE would improve — and the conf flip is scoped to this
    call on the session's single query-construction thread."""
    spark = df.sparkSession
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        return df.localCheckpoint(eager=True)
    finally:
        spark.conf.set(key, prev)


def application_id(spark: SparkSession) -> str:
    """Classic ``sc.applicationId``; on Connect read the ``spark.app.id``
    conf, else key on session identity (over-invalidates, never
    under-invalidates)."""
    try:
        return spark.sparkContext.applicationId
    except PySparkAttributeError:
        # Connect-only shape (see default_parallelism). A missing
        # spark.app.id conf on the Connect side is tolerated — the
        # session-identity key over-invalidates, never under-invalidates
        # — but a classic-session failure propagates.
        try:
            app_id = spark.conf.get("spark.app.id", None)
        except Exception:
            app_id = None
        return app_id or f"session-{id(spark)}"
