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

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from orchestrated_etl_spark.session import get_spark  # noqa: E402
from scaling_common import (  # noqa: E402
    grow_permuted_docs,
    grow_shifted,
    rot26,
    stage_parquet,
    staged_tmpdir,
    steady,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def write_scaled_docs(spark, mult: int, out_dir: str) -> int:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    # as-run r4b method: rotation perms, id shift i*count (== max+1 on
    # the dense fixture ids).
    grown = grow_permuted_docs(
        docs, mult, rot26, keep=("lang", "source", "n_chars"), id_shift=n
    )
    stage_parquet(grown, f"{out_dir}/documents.parquet")
    return n * mult


def write_scaled_lineitem(spark, mult: int, out_dir: str) -> int:
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_shipdate"
    )
    n = li.count()
    # as-run r4b method: l_partkey shifted by i*max (NOT max+1 — the
    # distinct-domain growth the bitmap/count-min points were published
    # with; kept bit-identical for reproducibility).
    grown = grow_shifted(
        li,
        mult,
        ["l_partkey"],
        shifts={"l_partkey": li.agg(F.max("l_partkey")).collect()[0][0]},
    )
    stage_parquet(grown, f"{out_dir}/lineitem.parquet")
    return n * mult


def main() -> None:
    from orchestrated_etl_spark.queries.wave15_round4 import (
        _bitmap_distinct,
        _cdc_chunks,
        _countmin_estimate,
    )

    spark = get_spark()
    for mult in (1, 5, 20):
        with staged_tmpdir(f"r4b_scale_{mult}_") as tmp:
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


if __name__ == "__main__":
    main()
