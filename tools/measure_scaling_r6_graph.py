"""Round-6 scaling curves for the wave-13/15 graph analytics queries
(clustering coefficient, HITS, k-core, modularity) — the graph family
members that lacked measured shapes (BFS/Bellman-Ford were measured in
round 4).

Graph growth method: lineitem copies with BOTH l_orderkey and l_partkey
shifted, so each copy contributes a DISJOINT co-purchase component —
nodes and edges grow M× while per-component structure stays constant
(the method that gave the round-4 BFS "335× edges → 3.6× cost" point
densified instead by sharing orderkeys; here we want disjoint growth so
triangle/degree work scales with graph size, not density²).

Each grown lineitem is written to a temp sf_dir so the queries run
through their normal (spark, sf_dir) contract; the session edge caches
key on sf_dir, so each mult builds its own edge store (its build cost is
inside the FIRST run — timings below are the second consecutive run,
steady-state against the staged edges, matching SCALING.md method).

Usage: SPARK_GRAFT_DRIVER_MEM=16g python tools/measure_scaling_r6_graph.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from orchestrated_etl_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def write_scaled_lineitem_disjoint(spark, mult: int, out_dir: str) -> int:
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = li.count()
    okey_shift = (li.agg(F.max("l_orderkey")).collect()[0][0] or 0) + 1
    pkey_shift = (li.agg(F.max("l_partkey")).collect()[0][0] or 0) + 1
    parts = [li]
    for i in range(1, mult):
        parts.append(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + i * okey_shift
            ).withColumn("l_partkey", F.col("l_partkey") + i * pkey_shift)
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
    from orchestrated_etl_spark.queries.wave13_round4 import _kcore
    from orchestrated_etl_spark.queries.wave15_round4 import (
        _clustering_coefficient,
        _graph_modularity,
        _hits_2iter,
    )

    spark = get_spark()
    for mult in (1, 5, 20):
        tmp = tempfile.mkdtemp(prefix=f"r6g_scale_{mult}_")
        try:
            n_rows = write_scaled_lineitem_disjoint(spark, mult, tmp)
            for label, fn in (
                ("graph_clustering_coefficient", _clustering_coefficient),
                ("graph_hits_2iter", _hits_2iter),
                ("graph_kcore", _kcore),
                ("graph_modularity", _graph_modularity),
            ):
                dt = steady(lambda: fn(spark, tmp).count())
                print(
                    f"{label} mult={mult} lineitem_rows={n_rows}: {dt:.2f}s",
                    flush=True,
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
