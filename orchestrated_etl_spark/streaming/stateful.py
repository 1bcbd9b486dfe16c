"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only cross-run state is the ``seen_titles`` set held in a
Python process during one scrape (dags/dag.py:72,97-98 — S4 in SURVEY
§2.1), which dies with the task. This is the honest engine version: state
keyed by group, persisted in Spark's state store across micro-batches,
checkpointed, and resumable. Arrow carries whole record batches into
pandas per key — the escape hatch for stateful logic that built-in
streaming aggregates can't express (here: a running count+sum+last-seen
per user, the shape of a feature-store accumulator)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _accumulate(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None else max(last_ts, mx)
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_ts": [last_ts],
        }
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value), max(ts)) maintained in the
    state store; one output row per user per micro-batch. State is two
    scalars per key — bounded regardless of event volume."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _accumulate,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
