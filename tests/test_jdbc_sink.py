"""End-to-end JDBC sink/source round-trip against embedded Derby.

The reference's actual load stage is row-at-a-time INSERTs over a live
Postgres connection (/root/reference/dags/dag.py:203-204,224-225 — K2/K3).
Our replacement, sources.sinks.write_jdbc, is partition-parallel batched
JDBC; this test executes it for real against Derby (embedded, in-JVM —
ships with Spark, no network), so the §2.5 load path is not just
code-complete but exercised: write → append → read back → predicate
pushdown through the JDBC source.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from orchestrated_etl_spark.sources.sinks import write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url():
    d = tempfile.mkdtemp(prefix="derby_")
    url = f"jdbc:derby:{d}/testdb;create=true"
    yield url
    shutil.rmtree(d, ignore_errors=True)


def _read(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .load()
    )


def test_jdbc_write_read_roundtrip(spark, derby_url):
    df = spark.createDataFrame(
        [(1, "widget", 9.99), (2, "gadget", 19.5), (3, "gizmo", 0.25)],
        "item_id int, name string, price double",
    )
    write_jdbc(
        df,
        derby_url,
        "items",
        mode="overwrite",
        num_partitions=2,
        options={"driver": DRIVER},
    )
    back = _read(spark, derby_url, "items")
    assert back.count() == 3
    assert {r["name"] for r in back.collect()} == {"widget", "gadget", "gizmo"}
    assert dict(back.dtypes)["price"] == "double"


def test_jdbc_append_accumulates(spark, derby_url):
    """K4: append-per-run accumulation semantics through the JDBC sink."""
    df = spark.createDataFrame([(10, "extra", 1.0)],
                               "item_id int, name string, price double")
    before = _read(spark, derby_url, "items").count()
    write_jdbc(df, derby_url, "items", mode="append",
               options={"driver": DRIVER})
    assert _read(spark, derby_url, "items").count() == before + 1


def test_jdbc_source_predicate_pushdown(spark, derby_url):
    """The JDBC relation pushes filters into the database (PushedFilters
    in the scan) — the source side of the K2/K3 path."""
    back = _read(spark, derby_url, "items").filter(F.col("price") > 5.0)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "price" in plan
    assert back.count() == 2  # widget 9.99 + gadget 19.5
