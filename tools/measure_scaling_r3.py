"""Round-3 scaling measurements: staged BM25 index and quantile-cutoff RFM.

Method matches SCALING.md: the sf0.1 corpus is grown by unioning
alphabet-rotated copies (disjoint vocabularies — the index genuinely
grows) and events by user-shifted copies (disjoint users). Steady-state:
each timing is the second consecutive run. Usage:

    python tools/measure_scaling_r3.py [sf_dir]          # BM25 + RFM sweep
    SCALING_EXTRA=1 python tools/measure_scaling_r3.py   # SemDedup + incr-MinHash ONLY
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from orchestrated_etl_spark.session import get_spark  # noqa: E402
from scaling_common import (  # noqa: E402
    grow_permuted_docs,
    grow_shifted,
    rot26,
    steady,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def scaled_docs(spark, mult: int):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    # as-run r3 method: rotation perms, id shift i*count.
    return grow_permuted_docs(docs, mult, rot26, id_shift=docs.count())


def scaled_events(spark, mult: int):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return grow_shifted(ev, mult, ["user_id"])


def scaled_embeddings(spark, mult: int):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    # id-shift only: same vector distribution, disjoint ids — clusters
    # genuinely grow, so within-cluster pair work genuinely grows.
    # (as-run r3 shift: i*count.)
    return grow_shifted(emb, mult, ["vec_id"], shifts={"vec_id": emb.count()})


def main():
    spark = get_spark("scaling_r3")

    from orchestrated_etl_spark.queries.llm_search_quality import (
        bm25_query,
        build_bm25_index,
    )

    print("== BM25 staged index ==")
    for mult in (1, 5, 20):
        docs = scaled_docs(spark, mult).localCheckpoint(eager=True)
        nd = docs.count()
        t_build = steady(lambda: build_bm25_index(docs))
        t_query = steady(lambda: bm25_query(spark).collect())
        print(f"docs={nd}: build={t_build:.2f}s query={t_query:.3f}s")

    from orchestrated_etl_spark.queries.analytics_wave5 import (
        rfm_cutoff_core,
        rfm_ntile_core,
    )

    print("== RFM: ntile vs quantile-cutoff ==")
    for mult in (1, 5, 20):
        ev = scaled_events(spark, mult).localCheckpoint(eager=True)
        ne = ev.count()
        t_ntile = steady(lambda: rfm_ntile_core(ev).collect())
        t_cut = steady(lambda: rfm_cutoff_core(ev).collect())
        print(f"events={ne}: ntile={t_ntile:.2f}s cutoffs={t_cut:.2f}s")


def extra():
    spark = get_spark("scaling_r3b")
    from orchestrated_etl_spark.functions.similarity import (
        assign_to_centroids,
    )
    from orchestrated_etl_spark.functions.dedup import (
        incremental_minhash_flags,
    )

    print("== SemDedup (within-cluster pairwise) ==")
    import orchestrated_etl_spark.queries.llm_similarity as LS

    for mult in (1, 5, 20):
        emb = scaled_embeddings(spark, mult).localCheckpoint(eager=True)
        nv = emb.count()
        centroids = emb.filter(F.col("vec_id") < 8)

        def run():
            assigned = assign_to_centroids(
                emb, centroids, "vec_id", "embedding"
            ).localCheckpoint(eager=True)
            a = assigned.select(
                F.col("_id").alias("id_a"), F.col("_vec").alias("_va"),
                "centroid_id",
            ).withColumn("_na", LS.SIM.vec_norm(F.col("_va")))
            b = assigned.select(
                F.col("_id").alias("id_b"), F.col("_vec").alias("_vb"),
                F.col("centroid_id").alias("_cb"),
            ).withColumn("_nb", LS.SIM.vec_norm(F.col("_vb")))
            pairs = a.join(
                b,
                (F.col("centroid_id") == F.col("_cb"))
                & (F.col("id_b") < F.col("id_a")),
            )
            cos = F.round(
                F.try_divide(
                    LS.SIM.dot(F.col("_va"), F.col("_vb")),
                    F.col("_na") * F.col("_nb"),
                ), 6)
            return pairs.where(cos >= 0.4).count()

        t = steady(run)
        print(f"vectors={nv}: semdedup={t:.2f}s")

    print("== Incremental MinHash (batch vs history) ==")
    for mult in (1, 5, 20):
        docs = scaled_docs(spark, mult).localCheckpoint(eager=True)
        nd = docs.count()
        incoming = docs.where(F.col("doc_id") % 5 == 0)
        history = docs.where(F.col("doc_id") % 5 != 0)
        t = steady(
            lambda: incremental_minhash_flags(
                incoming, history, "doc_id", "text"
            ).count()
        )
        print(f"docs={nd}: incr_minhash={t:.2f}s")


if __name__ == "__main__":
    # Single entry point dispatching on SCALING_EXTRA (round-3 advice:
    # two guards made main() run even when only the extras were wanted).
    if os.environ.get("SCALING_EXTRA"):
        extra()
    else:
        main()
