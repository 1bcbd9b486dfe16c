"""Pin tools/plan_audit.py's unpartitioned-window detector.

The audit's job is to make the single-executor global-window class
unrepresentable in the registry (round-4/5 verdict item); these tests
assert the detector (a) flags a deliberately unpartitioned ordered
window, (b) does NOT flag partitioned or partition-only windows (a
partition-only window prints only two bracket groups, which round-6
discovery showed misclassifies under a naive group count), and (c) the
two-phase global-rank operator's plan carries exactly ONE global window
— the bounded P-row offset scan — so a regression that reintroduces a
data-sized global rank inside it fails here before the registry audit.
"""

from __future__ import annotations

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from plan_audit import count_global_windows  # noqa: E402

from orchestrated_etl_spark.operators.relational import (  # noqa: E402
    global_rank_two_phase,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _base(spark):
    return spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("g")
    )


def test_flags_unpartitioned_ordered_window(spark):
    df = _base(spark).select(
        F.row_number().over(Window.orderBy("id")).alias("r")
    )
    assert count_global_windows(_plan(df)) == 1


def test_passes_partitioned_window(spark):
    df = _base(spark).select(
        F.row_number().over(Window.partitionBy("g").orderBy("id")).alias("r")
    )
    assert count_global_windows(_plan(df)) == 0


def test_passes_partition_only_window(spark):
    df = _base(spark).select(
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n")
    )
    assert count_global_windows(_plan(df)) == 0


def test_mixed_plan_counts_only_global(spark):
    df = _base(spark).select(
        "id",
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
        F.row_number().over(Window.orderBy("id")).alias("r"),
    )
    assert count_global_windows(_plan(df)) == 1


def test_two_phase_rank_has_single_bounded_global_window(spark):
    ranked = global_rank_two_phase(
        _base(spark),
        [F.desc("id")],
        num_range_partitions=4,
        running_sum_expr=F.col("id"),
    )
    plan = _plan(ranked)
    # exactly the P-row _pid offset window, nothing data-sized
    assert count_global_windows(plan) == 1
    assert "_pid" in plan


def test_two_phase_rank_matches_global_window_semantics(spark):
    df = _base(spark).withColumn("v", (F.col("id") * 7 % 13))
    order = [F.desc("v"), F.asc("id")]
    expected = df.select(
        "id",
        F.row_number().over(Window.orderBy(*order)).alias("rnk"),
        F.sum("v")
        .over(
            Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
    )
    got = global_rank_two_phase(
        df, order, num_range_partitions=4, running_sum_expr=F.col("v")
    ).select("id", "rnk", "cum")
    exp = {(r.id, r.rnk, r.cum) for r in expected.collect()}
    act = {(r.id, r.rnk, r.cum) for r in got.collect()}
    assert act == exp


def test_full_scan_detector(spark, sf_dir):
    from plan_audit import full_scan_smells

    full_cols = {"events": 6}
    # unpruned + unfiltered: a select-* pipeline — every column read,
    # nothing pushed. (Aggregates don't qualify: Catalyst prunes their
    # scans to the grouped/aggregated columns automatically.)
    bad = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert full_scan_smells(_plan(bad), full_cols) == ["events"]
    # pruned: projection reaches the scan -> ReadSchema is narrow
    pruned = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type"
    )
    assert full_scan_smells(_plan(pruned.groupBy("event_type").count()),
                            full_cols) == []
    # pushed: a scan-level predicate populates PushedFilters
    filtered = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("user_id") == 7
    )
    assert full_scan_smells(_plan(filtered.groupBy("event_type").count()),
                            full_cols) == []
