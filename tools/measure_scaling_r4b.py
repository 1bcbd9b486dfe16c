"""Wave-15 scaling measurements: CDC chunking, bitmap distinct,
count-min sketch.

Method matches SCALING.md: corpora are grown by unioning
alphabet-rotated document copies (disjoint content — chunk hashing and
sharing genuinely grow) and key-shifted lineitem copies (the distinct
domain grows with the data). Each grown input is written to a temp
sf_dir so the operators run through their normal (spark, sf_dir)
contract. Steady-state: each timing is the second consecutive run.

Usage: python tools/measure_scaling_r4b.py [sf_dir]
(SPARK_GRAFT_DRIVER_MEM=16g recommended past mult 5.)
"""

from __future__ import annotations

import shutil
import string
import sys
import tempfile
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from orchestrated_etl_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def write_scaled_docs(spark, mult: int, out_dir: str) -> int:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    lower = string.ascii_lowercase
    parts = [docs]
    for i in range(1, mult):
        rot = lower[i % 26 :] + lower[: i % 26]
        parts.append(
            docs.select(
                (F.col("doc_id") + i * n).alias("doc_id"),
                F.translate("text", lower, rot).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    grown = parts[0]
    for p in parts[1:]:
        grown = grown.unionByName(p)
    grown.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    return n * mult


def write_scaled_lineitem(spark, mult: int, out_dir: str) -> int:
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    )
    n_keys = li.agg(F.max("l_partkey")).collect()[0][0]
    n = li.count()
    parts = [li]
    for i in range(1, mult):
        parts.append(
            li.select(
                "l_orderkey",
                (F.col("l_partkey") + i * n_keys).alias("l_partkey"),
                "l_shipdate",
            )
        )
    grown = parts[0]
    for p in parts[1:]:
        grown = grown.unionByName(p)
    grown.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )
    return n * mult


def steady(fn) -> float:
    fn()
    t = time.time()
    fn()
    return time.time() - t


def main() -> None:
    from orchestrated_etl_spark.queries.wave15_round4 import (
        _bitmap_distinct,
        _cdc_chunks,
        _countmin_estimate,
    )

    spark = get_spark()
    for mult in (1, 5, 20):
        tmp = tempfile.mkdtemp(prefix=f"r4b_scale_{mult}_")
        try:
            n_docs = write_scaled_docs(spark, mult, tmp)
            dt = steady(lambda: _cdc_chunks(spark, tmp).count())
            print(f"dedup_cdc_chunks mult={mult} docs={n_docs}: {dt:.2f}s",
                  flush=True)
            n_rows = write_scaled_lineitem(spark, mult, tmp)
            dt = steady(lambda: _bitmap_distinct(spark, tmp).count())
            print(f"agg_bitmap_distinct mult={mult} rows={n_rows}: "
                  f"{dt:.2f}s", flush=True)
            dt = steady(lambda: _countmin_estimate(spark, tmp).count())
            print(f"agg_countmin_sketch mult={mult} rows={n_rows}: "
                  f"{dt:.2f}s", flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
