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

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))

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
    # as-run r6 method: rotation perms, id shift i*count (== max+1 on
    # the dense fixture ids).
    grown = grow_permuted_docs(
        docs, mult, rot26, keep=("lang", "source", "n_chars"), id_shift=n
    )
    stage_parquet(grown, f"{out_dir}/documents.parquet")
    return n * mult


def write_scaled_events(spark, mult: int, out_dir: str) -> int:
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    # as-run r6 method: event_id shifted by i*count, user_id by max+1.
    grown = grow_shifted(
        ev,
        mult,
        ["event_id", "user_id"],
        shifts={
            "event_id": n,
            "user_id": (ev.agg({"user_id": "max"}).collect()[0][0] or 0) + 1,
        },
    )
    stage_parquet(grown, f"{out_dir}/events.parquet")
    return n * mult


def main() -> None:
    from orchestrated_etl_spark.queries.scale_ops import _sample_weighted
    from orchestrated_etl_spark.queries.training_pipeline import _build_vocab
    from orchestrated_etl_spark.queries.wave15_round4 import (
        _pareto_8020,
        _zipf_slope,
    )

    spark = get_spark()
    for mult in (1, 5, 20):
        with staged_tmpdir(f"r6_scale_{mult}_") as tmp:
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


if __name__ == "__main__":
    main()
