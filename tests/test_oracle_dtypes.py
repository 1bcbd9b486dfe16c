"""Guard against the oracle dtype-coercion class (round-2's only red row).

The driver compares Spark results against DuckDB oracles through a pandas
conversion. DuckDB's integer ``sum()`` returns HUGEINT and decimal math
returns DECIMAL — both of which pandas coerces to float64, while Spark
collects int64 / decimal.Decimal. Rows and schema then match but the value
hash doesn't (``sessionize_events_30m``, CORRECTNESS_r02). This test makes
the class unrepresentable: DESCRIBE-bind every registered oracle against
the sf0.001 fixtures and fail if any OUTPUT column types as HUGEINT,
UHUGEINT, or DECIMAL.

DESCRIBE only binds the query (no execution), so the full 200-oracle sweep
stays sub-second. Oracles whose SQL intentionally compares through DOUBLE
casts (the fix pattern) pass by construction.
"""

from __future__ import annotations

import re

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BANNED = re.compile(r"HUGEINT|DECIMAL", re.IGNORECASE)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_no_oracle_output_column_is_hugeint_or_decimal(con):
    oracles = entrymod.oracle_sql()
    assert oracles, "registry returned no oracles"
    offenders = []
    for name, sql in oracles.items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except duckdb.Error as e:  # pragma: no cover - bind failure is its own bug
            offenders.append((name, f"DESCRIBE failed: {e}"))
            continue
        for col, coltype, *_ in desc:
            if BANNED.search(coltype):
                offenders.append((name, f"{col}: {coltype}"))
    assert not offenders, (
        "oracle output columns that pandas will coerce to float64 "
        "(cast them to BIGINT/DOUBLE in the oracle SQL): "
        f"{offenders}"
    )
