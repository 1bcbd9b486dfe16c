"""Round-10 scaling point: `train_chunk_documents` — the last headline
query without a measured curve (r9 verdict item 4).

The kernel (training_pipeline._chunk_documents) is pure JVM expressions:
split -> sequence/explode -> slice/array_join, NO shuffle and NO UDF —
chunking is embarrassingly parallel and stays inside whole-stage codegen
(the r9 verdict grouped it with the CDC mapInPandas kernel; it is
actually lighter than that — there is no Python worker in the path at
all). Expected shape: cost linear in TOKEN VOLUME (the split + explode
row expansion), flat per-partition, so a 1000-executor cluster scales it
by adding scan partitions.

Growth method: permutation-grown disjoint content (the r9 CDC method —
dihedral alphabet permutations, 52 distinct transforms, doc_id shifted
by max+1), so token content genuinely varies per copy and dictionary/
RLE parquet encoding cannot compress the growth away.

Steady-state protocol (matches SCALING.md): each point is the second
consecutive run; the first absorbs staging/codegen.

Usage: SPARK_GRAFT_DRIVER_MEM=16g python tools/measure_scaling_r10.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))

from orchestrated_etl_spark.session import get_spark  # noqa: E402
from scaling_common import (  # noqa: E402
    dihedral52,
    grow_permuted_docs,
    stage_parquet,
    staged_tmpdir,
    steady,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def measure_chunk(spark) -> None:
    print("== train_chunk_documents, permutation-grown disjoint content ==")
    from orchestrated_etl_spark.queries.training_pipeline import (
        _chunk_documents,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r10_chunk_{mult}_") as tmp:
            grown = grow_permuted_docs(
                docs, mult, dihedral52, keep=("lang", "source", "n_chars")
            )
            stage_parquet(grown, f"{tmp}/documents.parquet")
            t = steady(lambda: _chunk_documents(spark, tmp).count())
            nc = _chunk_documents(spark, tmp).count()
            print(
                f"docs={n * mult} chunks={nc} mult={mult}: chunk={t:.2f}s",
                flush=True,
            )


def main() -> None:
    spark = get_spark()
    measure_chunk(spark)


if __name__ == "__main__":
    main()
