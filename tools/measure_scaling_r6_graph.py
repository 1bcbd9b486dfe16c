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

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))

from orchestrated_etl_spark.session import get_spark  # noqa: E402
from scaling_common import (  # noqa: E402
    staged_tmpdir,
    steady,
    write_scaled_lineitem_disjoint,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from orchestrated_etl_spark.queries.wave13_round4 import _kcore
    from orchestrated_etl_spark.queries.wave15_round4 import (
        _clustering_coefficient,
        _graph_modularity,
        _hits_2iter,
    )

    spark = get_spark()
    for mult in (1, 5, 20):
        with staged_tmpdir(f"r6g_scale_{mult}_") as tmp:
            n_rows = write_scaled_lineitem_disjoint(spark, SF_DIR, mult, tmp)
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


if __name__ == "__main__":
    main()
