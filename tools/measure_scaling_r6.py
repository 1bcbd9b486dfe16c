"""Round-6 scaling curves for the four re-plumbed global-rank queries:

- sample_weighted_deterministic / train_build_vocab (round 5: top-k via
  TakeOrderedAndProject, rank window bounded at the K/V survivors)
- events_pareto_8020 / text_zipf_slope (round 6: two-phase
  global_rank_two_phase — range partition + per-partition windows +
  broadcast P-row offsets)

Method matches SCALING.md: documents grow by unioning alphabet-rotated
copies (disjoint vocabularies — the vocab/zipf rank domain genuinely
grows), events by user-shifted copies (the pareto user domain grows).
Each grown input is written to a temp sf_dir so the queries run through
their normal (spark, sf_dir) contract. Steady-state: each timing is the
second consecutive run.

Usage: SPARK_GRAFT_DRIVER_MEM=16g python tools/measure_scaling_r6.py [sf_dir]
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


def write_scaled_events(spark, mult: int, out_dir: str) -> int:
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    shift = (ev.agg(F.max("user_id")).collect()[0][0] or 0) + 1
    parts = [ev]
    for i in range(1, mult):
        parts.append(
            ev.select(
                (F.col("event_id") + i * n).alias("event_id"),
                "ts",
                (F.col("user_id") + i * shift).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    grown = parts[0]
    for p in parts[1:]:
        grown = grown.unionByName(p)
    grown.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )
    return n * mult


def steady(fn) -> float:
    fn()
    t = time.time()
    fn()
    return time.time() - t


def main() -> None:
    from orchestrated_etl_spark.queries.scale_ops import _sample_weighted
    from orchestrated_etl_spark.queries.training_pipeline import _build_vocab
    from orchestrated_etl_spark.queries.wave15_round4 import (
        _pareto_8020,
        _zipf_slope,
    )

    spark = get_spark()
    for mult in (1, 5, 20):
        tmp = tempfile.mkdtemp(prefix=f"r6_scale_{mult}_")
        try:
            n_docs = write_scaled_docs(spark, mult, tmp)
            for label, fn in (
                ("sample_weighted_deterministic", _sample_weighted),
                ("train_build_vocab", _build_vocab),
                ("text_zipf_slope", _zipf_slope),
            ):
                dt = steady(lambda: fn(spark, tmp).count())
                print(f"{label} mult={mult} docs={n_docs}: {dt:.2f}s",
                      flush=True)
            n_ev = write_scaled_events(spark, mult, tmp)
            dt = steady(lambda: _pareto_8020(spark, tmp).count())
            print(f"events_pareto_8020 mult={mult} events={n_ev}: {dt:.2f}s",
                  flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
