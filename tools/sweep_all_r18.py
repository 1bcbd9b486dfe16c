"""Time EVERY registered query once (cold) + once (warm) at sf0.1 —
the round-18 outlier finder for the 266 non-headline paths. Streaming
queries and sink-writing queries run too (they are part of the
registry), each under a try/except so one failure doesn't kill the
sweep. Output: one JSON line per query, slowest-warm summary at end.

Usage: python tools/sweep_all_r18.py [--skip-slow] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orchestrated_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    spark = get_spark("sweep_all_r18")
    sc = spark.sparkContext
    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs)

    import glob

    for p in glob.glob(f"{sf_dir}/*.parquet"):
        if "events" in p:
            continue
        spark.read.parquet(p).count()
    qs["datetime_daily_rollup"](spark, sf_dir).count()
    qs["q1_pricing_summary"](spark, sf_dir).collect()
    qs["sim_normalize_embeddings"](spark, sf_dir).count()

    out = {}
    for name in names:
        sc.setJobDescription(f"sweep:{name}")
        try:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            warm = time.perf_counter() - t0
            out[name] = {"cold": round(cold, 3), "warm": round(warm, 3)}
        except Exception as ex:  # noqa: BLE001
            out[name] = {"error": str(ex)[:200]}
        print(json.dumps({name: out[name]}), flush=True)
        sc.setJobDescription(None)

    timed = {k: v for k, v in out.items() if "warm" in v}
    slowest = sorted(timed.items(), key=lambda kv: -kv[1]["warm"])[:25]
    print(json.dumps({"slowest_warm": slowest}))
    print(json.dumps({
        "n": len(out),
        "errors": [k for k, v in out.items() if "error" in v],
        "total_warm": round(sum(v["warm"] for v in timed.values()), 2),
    }))


if __name__ == "__main__":
    main()
