"""Round-10 scaling points: the six headline queries the r9 verdict
listed as curve-less, closing its "What's missing" item 3 entirely.

- `train_chunk_documents` (the one the verdict called non-trivial): the
  kernel (training_pipeline._chunk_documents) is pure JVM expressions —
  split -> sequence/explode -> slice/array_join, NO shuffle and NO UDF;
  chunking is embarrassingly parallel and stays inside whole-stage
  codegen (the r9 verdict grouped it with the CDC mapInPandas kernel;
  it is actually lighter — no Python worker in the path at all).
  Expected shape: linear in TOKEN VOLUME through the scan, flat
  per-partition. Growth: permutation-grown disjoint content (dihedral
  alphabet permutations, doc_id shifted max+1) so parquet
  dictionary/RLE encoding cannot compress the growth away.

- The five "textbook single-shuffle/scan" ones, measured anyway now
  that the consolidated builders make each a ~10-line family:
  `j1_star_join_revenue` (facts grown FK-valid — lineitem+orders share
  one o_orderkey shift, dims stay base-sized: the realistic 100 TB star
  shape; the one fact-fact shuffle is the growth term, dims broadcast),
  `window_topk_per_group` (orders grown with disjoint customers — the
  partitioned-window sort volume is the term),
  `datetime_daily_rollup` (events grown with disjoint users — one
  partial-aggregable pass; distinct-user counting grows per group),
  `t2_dedup_by_key` (documents grown with permuted content — the
  hash-groupBy text domain genuinely grows),
  `sample_hash_deterministic` (orders grown — scan-stage arithmetic
  predicate, no shuffle at all).

Steady-state protocol (matches SCALING.md): each point is the second
consecutive run; the first absorbs staging/codegen.

Usage: SPARK_GRAFT_DRIVER_MEM=16g python tools/measure_scaling_r10.py \\
           [sf_dir] [family ...]
with family in {chunk, star, topk, datetime, dedupkey, sample};
default = all.
"""

from __future__ import annotations

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from orchestrated_etl_spark.session import get_spark  # noqa: E402
from scaling_common import (  # noqa: E402
    dihedral52,
    grow_permuted_docs,
    grow_shifted,
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


def measure_star(spark) -> None:
    """`j1_star_join_revenue`: lineitem and orders grow with the SAME
    o_orderkey shift (FK stays valid across copies); o_custkey stays in
    the base range so the broadcast dimension hops
    (customer->nation->region, base-sized) keep resolving — the
    realistic 100 TB shape (facts grow, dims don't). The growth term is
    the one fact-fact shuffle (lineitem x orders on orderkey)."""
    print("== j1_star_join_revenue, FK-valid fact growth ==")
    from orchestrated_etl_spark.queries.reference_surface import (
        _j1_star_join,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    okey_shift = (orders.agg(F.max("o_orderkey")).collect()[0][0] or 0) + 1
    n = li.count()
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r10_star_{mult}_") as tmp:
            for name, df, key in (
                ("lineitem", li, "l_orderkey"),
                ("orders", orders, "o_orderkey"),
            ):
                grown = grow_shifted(df, mult, [key], shifts={key: okey_shift})
                stage_parquet(grown, f"{tmp}/{name}.parquet")
            for name in ("customer", "nation", "region"):
                spark.read.parquet(f"{SF_DIR}/{name}.parquet").write.mode(
                    "overwrite"
                ).parquet(f"{tmp}/{name}.parquet")
            t = steady(lambda: _j1_star_join(spark, tmp).count())
            print(f"lineitem={n * mult} mult={mult}: star_join={t:.2f}s",
                  flush=True)


def measure_topk(spark) -> None:
    """`window_topk_per_group`: orders grow with DISJOINT customers (and
    disjoint orderkeys for tie determinism) — per-customer group size is
    constant, so the growth term is purely the o_custkey-partitioned
    window sort volume, embarrassingly parallel across customers."""
    print("== window_topk_per_group, disjoint customer growth ==")
    from orchestrated_etl_spark.queries.relational import (
        _win_topk_per_group,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = orders.count()
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r10_topk_{mult}_") as tmp:
            grown = grow_shifted(orders, mult, ["o_custkey", "o_orderkey"])
            stage_parquet(grown, f"{tmp}/orders.parquet")
            t = steady(lambda: _win_topk_per_group(spark, tmp).count())
            print(f"orders={n * mult} mult={mult}: topk={t:.2f}s", flush=True)


def measure_datetime(spark) -> None:
    """`datetime_daily_rollup`: events grow with disjoint users — the
    (day, event_type) group count stays constant while per-group volume
    (and the countDistinct user domain) grows, so the term is one
    partial-aggregable pass over the scan."""
    print("== datetime_daily_rollup, disjoint user growth ==")
    from orchestrated_etl_spark.queries.relational import _date_trunc_daily

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r10_dt_{mult}_") as tmp:
            grown = grow_shifted(ev, mult, ["user_id", "event_id"])
            stage_parquet(grown, f"{tmp}/events.parquet")
            t = steady(lambda: _date_trunc_daily(spark, tmp).count())
            print(f"events={n * mult} mult={mult}: rollup={t:.2f}s",
                  flush=True)


def measure_dedupkey(spark) -> None:
    """`t2_dedup_by_key`: documents grow with PERMUTED content (dihedral
    family) so the text key domain genuinely grows — the hash-groupBy on
    text is the growth term. Verbatim copies would instead collapse
    50x->1x and measure nothing but the scan."""
    print("== t2_dedup_by_key, permutation-grown disjoint content ==")
    from orchestrated_etl_spark.queries.reference_surface import _t2_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r10_t2_{mult}_") as tmp:
            grown = grow_permuted_docs(
                docs, mult, dihedral52, keep=("lang", "source", "n_chars")
            )
            stage_parquet(grown, f"{tmp}/documents.parquet")
            t = steady(lambda: _t2_dedup(spark, tmp).count())
            print(f"docs={n * mult} mult={mult}: dedup={t:.2f}s", flush=True)


def measure_sample(spark) -> None:
    """`sample_hash_deterministic`: orders grow disjoint — the predicate
    is pure key arithmetic evaluated in the scan stage, so the term is
    the scan itself; no shuffle anywhere."""
    print("== sample_hash_deterministic, disjoint orderkey growth ==")
    from orchestrated_etl_spark.queries.scale_ops import _sample_hash

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = orders.count()
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r10_samp_{mult}_") as tmp:
            grown = grow_shifted(orders, mult, ["o_orderkey"])
            stage_parquet(grown, f"{tmp}/orders.parquet")
            t = steady(lambda: _sample_hash(spark, tmp).count())
            print(f"orders={n * mult} mult={mult}: sample={t:.2f}s",
                  flush=True)


FAMILIES = {
    "chunk": measure_chunk,
    "star": measure_star,
    "topk": measure_topk,
    "datetime": measure_datetime,
    "dedupkey": measure_dedupkey,
    "sample": measure_sample,
}


def main() -> None:
    spark = get_spark()
    selected = sys.argv[2:] or list(FAMILIES)
    for fam in selected:
        FAMILIES[fam](spark)


if __name__ == "__main__":
    main()
