"""Round-8 scaling points: extend the two heaviest headline families'
measured curves one factor further (to 50x disjoint growth).

- `dedup_minhash_lsh` core (functions/dedup.minhash_lsh_dedup): the
  round-2 curve stops at 20x (100k docs, 8.0 s). Here documents grow by
  DOC_ID-SHIFTED copies — every copy is a disjoint near-dup cluster
  family, so candidate pairs grow linearly with docs (the same method
  as the 5x/20x points) and the corpus-scanned-exactly-twice claim is
  exercised at 250k docs / ~13M shingle rows.

- `graph_bfs_frontier` core (functions/graph.bfs_distances): the
  round-4 curve measured a 335x DENSIFIED graph (same part space); the
  round-6 graph queries measured DISJOINT growth to 20x but BFS was not
  among them. Here lineitem grows with BOTH keys shifted (disjoint
  components, the round-6 method) to 20x and 50x. BFS from one seed
  only ever touches the seed's component, so the expected shape is
  near-FLAT per-round cost with edge-store derivation growing linearly
  — exactly the property that makes frontier traversal viable on a
  100 TB co-purchase graph (cost follows the reachable subgraph, not
  the corpus).

Steady-state protocol (matches SCALING.md): each point is the second
consecutive run; the first run absorbs staging/codegen.

Usage: SPARK_GRAFT_DRIVER_MEM=16g python tools/measure_scaling_r8.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))

import time  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from orchestrated_etl_spark.functions import dedup as D  # noqa: E402
from orchestrated_etl_spark.functions.graph import (  # noqa: E402
    bfs_distances,
    undirect,
)
from orchestrated_etl_spark.session import get_spark  # noqa: E402
from scaling_common import (  # noqa: E402
    scaled_docs_idshift,
    staged_tmpdir,
    steady,
    write_scaled_lineitem_disjoint,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def scaled_docs(spark, mult: int):
    return scaled_docs_idshift(spark, SF_DIR, mult)


def measure_minhash(spark) -> None:
    print("== dedup_minhash_lsh core, doc-shifted disjoint growth ==")
    for mult in (20, 50):
        docs = scaled_docs(spark, mult).localCheckpoint(eager=True)
        nd = docs.count()
        t = steady(
            lambda: D.minhash_lsh_dedup(
                docs,
                "doc_id",
                text_col="text",
                shingle_n=3,
                k=8,
                bands=4,
                rows_per_band=2,
                threshold=0.9,
            ).count()
        )
        print(f"docs={nd} mult={mult}: minhash_lsh={t:.2f}s", flush=True)
        docs.unpersist()


def measure_bfs(spark) -> None:
    print("== graph_bfs_frontier core, disjoint component growth ==")
    from orchestrated_etl_spark.functions.graph import copurchase_edges

    for mult in (1, 20, 50):
        with staged_tmpdir(f"r8_bfs_{mult}_") as tmp:
            n_rows = write_scaled_lineitem_disjoint(spark, SF_DIR, mult, tmp)
            t0 = time.time()
            edges = copurchase_edges(
                spark, tmp, min_weight=1
            ).localCheckpoint(eager=True)
            ne = edges.count()
            t_derive = time.time() - t0
            u = (
                undirect(edges)
                .repartition(
                    spark.sparkContext.defaultParallelism, F.col("src")
                )
                .localCheckpoint(eager=True)
            )
            seed = edges.agg(F.min("part_a")).collect()[0][0]
            t = steady(
                lambda: bfs_distances(edges, seed, 4, u_layout=u).count()
            )
            print(
                f"lineitem_rows={n_rows} edges={ne} mult={mult}: "
                f"derive={t_derive:.2f}s bfs4={t:.2f}s",
                flush=True,
            )
            edges.unpersist()
            u.unpersist()


def main() -> None:
    spark = get_spark()
    measure_minhash(spark)
    measure_bfs(spark)


if __name__ == "__main__":
    main()
