"""Query registry: every operator exposed to the driver's correctness gate.

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with a
DuckDB-runnable ANSI-SQL oracle string computing the same relation over the
same parquet tables. Column names are aliased identically on both sides
(the driver sorts columns by name before hashing). Aggregates over doubles
are rounded on BOTH sides so floating-point summation order (nondeterministic
in any parallel engine) cannot flip the value hash.

Queries whose semantics are not SQL-expressible (streaming state, LSH
banding internals) register without an oracle → the driver records a
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name {name!r}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from orchestrated_etl_spark import queries as _q  # noqa: F401

    _q.load()


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
