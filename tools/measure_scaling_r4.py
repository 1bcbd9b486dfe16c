"""Round-4 scaling measurements: iterative graph traversal (BFS,
Bellman-Ford) and the sweep-based interval coverage.

Graph growth method: lineitem is unioned with order-shifted copies
(disjoint order keys over the SAME part space), which multiplies every
co-purchase pair count by the copy factor — at mult >= 2 the weight>=2
threshold therefore admits the FULL weight>=1 edge set (115k edges at
sf0.1-scale vs 3.4k at mult=1), so both the edge-derivation cost and
the per-round frontier/relaxation joins genuinely grow. Events grow by
user-shifted copies (disjoint users — more partitions of the same
per-user work, the embarrassing dimension for the sweep).

Steady-state: each timing is the second consecutive run.
Usage: python tools/measure_scaling_r4.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from orchestrated_etl_spark.session import get_spark  # noqa: E402
from scaling_common import grow_shifted, steady  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def scaled_lineitem(spark, mult: int):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    # order-shifted copies over the SAME part space (density growth —
    # the round-4 method; NOT the disjoint-component r6+ variant).
    return grow_shifted(li, mult, ["l_orderkey"])


def scaled_events(spark, mult: int):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return grow_shifted(ev, mult, ["user_id"])


def main():
    spark = get_spark("scaling_r4")
    from orchestrated_etl_spark.functions.graph import (
        bfs_distances,
        shortest_path_bf,
    )

    print("== BFS / Bellman-Ford on the growing co-purchase graph ==")
    for mult in (1, 2, 5):
        li = scaled_lineitem(spark, mult).localCheckpoint(eager=True)
        per_order = li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_set("l_partkey")).alias("parts")
        )
        pairs = per_order.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "parts",
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("parts"), i + F.lit(2), F.size("parts")
                            ),
                            lambda y: F.struct(
                                x.alias("part_a"), y.alias("part_b")
                            ),
                        ),
                    )
                )
            ).alias("e")
        ).select("e.part_a", "e.part_b")
        t_derive = steady(
            lambda: pairs.groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("weight"))
            .where(F.col("weight") >= 2)
            .count()
        )
        edges = (
            pairs.groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("weight"))
            .where(F.col("weight") >= 2)
            .localCheckpoint(eager=True)
        )
        ne = edges.count()
        t_bfs = steady(lambda: bfs_distances(edges, 0, 4).count())
        t_bf = steady(lambda: shortest_path_bf(edges, 0, 3).count())
        print(
            f"mult={mult} edges={ne}: derive={t_derive:.2f}s "
            f"bfs4={t_bfs:.2f}s bellman3={t_bf:.2f}s"
        )

    from orchestrated_etl_spark.queries.wave13_round4 import (
        _interval_coverage,
    )

    print("== interval coverage (sweep) ==")
    import os
    import shutil
    import tempfile

    for mult in (1, 5, 20):
        ev = scaled_events(spark, mult)
        work = tempfile.mkdtemp(prefix="ivscale_")
        ev.write.parquet(f"{work}/events.parquet")
        t = steady(lambda: _interval_coverage(spark, work).count())
        ne = ev.count()
        print(f"events={ne}: coverage={t:.2f}s")
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
