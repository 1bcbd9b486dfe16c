"""Round-9 scaling points: 1x/20x/50x curves for the next two heaviest
headline families (round-8 verdict item 5), following the r8
disjoint-growth method.

- `graph_pagerank` core (functions/graph.pagerank): lineitem grows with
  BOTH keys shifted (disjoint co-purchase components, the r6/r8 method),
  edges derived at min_weight=2 to match the headline query. PageRank is
  dense-iteration-bound: every node participates every round (unlike
  BFS, whose frontier tracks one component), so the expected shape is
  per-iteration cost tracking the EDGE-LIST size — the term a
  1000-executor cluster parallelizes, since each iteration is one
  rank-on-src equi-join plus one dst aggregate over the materialized
  edge store.

- `search_bm25_topk` core (llm_search_quality.build_bm25_index /
  bm25_query): documents grow by doc-id-shifted copies (the r8 minhash
  method). The staged-index design splits cost into BUILD (the one
  corpus scan: tokenize + (doc,term) aggregate, linear in corpus size,
  a bucketed-by-term parquet write on a cluster) and QUERY (a
  term-filtered posting-list lookup joined to a broadcast df relation —
  grows only with the query terms' posting lists, never rescans the
  corpus). Measuring them separately shows the split is real: query
  latency must stay far below build as the corpus grows.

- `sim_ivf_topk` core (functions/similarity.ivf_topk vs
  brute_force_topk): embeddings grow by vec_id-shifted copies; the
  20-query set and 8 centroids stay FIXED (the |Q| broadcast contract).
  IVF's claim is that each query scores ~1/K of the corpus (its probed
  posting list) instead of all of it — measured here as the end-to-end
  gap vs brute force at the same corpus size, plus the BUILD
  (nearest-centroid assignment, map-side max_by so only one row per
  vector shuffles) timed separately.

Steady-state protocol (matches SCALING.md): each point is the second
consecutive run; the first absorbs staging/codegen.

Usage: SPARK_GRAFT_DRIVER_MEM=16g python tools/measure_scaling_r9.py \
           [sf_dir] [family ...]
with family in {pagerank, bm25, ivf, dq, sessionize, cdc, rfm, events,
sq8}; default = all. (The ivf/dq/sessionize/cdc/rfm/events/sq8 families
were added after the first pagerank+bm25 run; each run this round used
explicit family selection so committed numbers were never re-timed.)
"""

from __future__ import annotations

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent))

import time  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from orchestrated_etl_spark.functions.graph import (  # noqa: E402
    copurchase_edges,
    pagerank,
)
from orchestrated_etl_spark.queries.llm_search_quality import (  # noqa: E402
    bm25_query,
    build_bm25_index,
)
from orchestrated_etl_spark.session import get_spark  # noqa: E402
from scaling_common import (  # noqa: E402
    dihedral52,
    grow_permuted_docs,
    grow_shifted,
    scaled_docs_idshift,
    stage_parquet,
    staged_tmpdir,
    steady,
    write_scaled_lineitem_disjoint,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def scaled_docs(spark, mult: int):
    return scaled_docs_idshift(spark, SF_DIR, mult)


def measure_pagerank(spark) -> None:
    print("== graph_pagerank core, disjoint component growth ==")
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r9_pr_{mult}_") as tmp:
            n_rows = write_scaled_lineitem_disjoint(spark, SF_DIR, mult, tmp)
            t0 = time.time()
            edges = copurchase_edges(
                spark, tmp, min_weight=2
            ).localCheckpoint(eager=True)
            ne = edges.count()
            t_derive = time.time() - t0
            t = steady(
                lambda: pagerank(edges, iterations=3, damping=0.85).count()
            )
            print(
                f"lineitem_rows={n_rows} edges={ne} mult={mult}: "
                f"derive={t_derive:.2f}s pagerank3={t:.2f}s",
                flush=True,
            )
            edges.unpersist()


def measure_bm25(spark) -> None:
    print("== search_bm25_topk core, doc-shifted corpus growth ==")
    for mult in (1, 20, 50):
        docs = scaled_docs(spark, mult).localCheckpoint(eager=True)
        nd = docs.count()
        # BUILD: the one corpus scan (steady = second build; the index
        # views are simply re-registered each time).
        t_build = steady(lambda: build_bm25_index(docs))
        # QUERY: posting-list lookup against the staged views.
        t_query = steady(lambda: bm25_query(spark).count())
        print(
            f"docs={nd} mult={mult}: build={t_build:.2f}s "
            f"query={t_query:.3f}s",
            flush=True,
        )
        docs.unpersist()


def measure_ivf(spark) -> None:
    print("== sim_ivf_topk core vs brute force, vec_id-shifted growth ==")
    from pyspark.sql import functions as SF

    from orchestrated_etl_spark.functions import similarity as SIM

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    shift = (base.agg(F.max("vec_id")).collect()[0][0] or 0) + 1
    # Fixed query/centroid sets from the ORIGINAL id range at every
    # scale — the |Q| broadcast contract the operators document.
    queries = base.filter(
        (SF.col("vec_id") % 25 == 0) & (SF.col("vec_id") < 500)
    ).localCheckpoint(eager=True)
    centroids = base.filter(SF.col("vec_id") < 8).localCheckpoint(
        eager=True
    )
    for mult in (1, 20, 50):
        corpus = grow_shifted(
            base, mult, ["vec_id"], shifts={"vec_id": shift}
        ).localCheckpoint(eager=True)
        nv = corpus.count()
        t_build = steady(
            lambda: SIM.assign_to_centroids(
                corpus, centroids, "vec_id", "embedding"
            ).count()
        )
        t_ivf = steady(
            lambda: SIM.ivf_topk(
                queries, corpus, centroids, "vec_id", "embedding", 3
            ).count()
        )
        t_bf = steady(
            lambda: SIM.brute_force_topk(
                queries, corpus, "vec_id", "embedding", 5
            ).count()
        )
        print(
            f"vectors={nv} mult={mult}: assign_build={t_build:.2f}s "
            f"ivf_e2e={t_ivf:.2f}s brute_force={t_bf:.2f}s",
            flush=True,
        )
        corpus.unpersist()


def measure_dq(spark) -> None:
    """`dq_constraint_audit` (one conditional aggregate per audited
    table, FK probes riding the same scan): facts (lineitem, orders)
    grow with BOTH orderkeys shifted identically so the lineitem→orders
    FK stays valid; dimensions (customer, nation) stay base-sized and
    o_custkey stays in the base range, so FK containment holds and the
    violation counts scale exactly — the realistic 100 TB shape (facts
    grow, dims don't)."""
    print("== dq_constraint_audit, FK-valid fact growth ==")
    from orchestrated_etl_spark.queries.ops_wave11 import (
        _dq_constraint_audit,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    okey_shift = (orders.agg(F.max("o_orderkey")).collect()[0][0] or 0) + 1
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r9_dq_{mult}_") as tmp:
            for name, df, key in (
                ("lineitem", li, "l_orderkey"),
                ("orders", orders, "o_orderkey"),
            ):
                # SAME shift for both tables so the lineitem->orders FK
                # stays valid across copies.
                grown = grow_shifted(
                    df, mult, [key], shifts={key: okey_shift}
                )
                stage_parquet(grown, f"{tmp}/{name}.parquet")
            for name in ("customer", "nation"):
                spark.read.parquet(f"{SF_DIR}/{name}.parquet").write.mode(
                    "overwrite"
                ).parquet(f"{tmp}/{name}.parquet")
            t = steady(lambda: _dq_constraint_audit(spark, tmp).count())
            print(f"mult={mult}: audit={t:.2f}s", flush=True)


def measure_sessionize(spark) -> None:
    """`sessionize_events_30m` (lag → flag → running-sum on one user_id
    shuffle): events grow by user_id/event_id-shifted copies — disjoint
    users, so per-user session structure is constant and the growth
    term is purely the partitioned-window sort volume."""
    print("== sessionize_events_30m, disjoint user growth ==")
    from orchestrated_etl_spark.queries.scale_ops import _sessionize

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r9_sess_{mult}_") as tmp:
            grown = grow_shifted(ev, mult, ["user_id", "event_id"])
            stage_parquet(grown, f"{tmp}/events.parquet")
            n = grown.count()
            t = steady(lambda: _sessionize(spark, tmp).count())
            print(f"events={n} mult={mult}: sessionize={t:.2f}s", flush=True)


def measure_cdc(spark) -> None:
    """`dedup_cdc_chunks` past the round-4 curve's 20× stop. Copies get
    DISTINCT alphabet permutations so chunk content (and thus the md5
    key domain) genuinely grows: plain rotations give only 26 distinct
    transforms, so copies 26+ compose the reflection (z↔a) with a
    rotation — the dihedral family, 52 distinct permutations, enough
    for 50×."""
    print("== dedup_cdc_chunks, permutation-grown disjoint content ==")
    from orchestrated_etl_spark.queries.wave15_round4 import _cdc_chunks

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    # id shift is max(doc_id)+1 (scaling_common default) as of round 10
    # — the as-run r9 points shifted by i*count(), identical on this
    # fixture's dense 0..n-1 ids but a collision hazard on sparse ids
    # (the r9 advice item); the committed numbers are unaffected.
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r9_cdc_{mult}_") as tmp:
            grown = grow_permuted_docs(
                docs, mult, dihedral52, keep=("lang", "source", "n_chars")
            )
            stage_parquet(grown, f"{tmp}/documents.parquet")
            t = steady(lambda: _cdc_chunks(spark, tmp).count())
            print(f"docs={n * mult} mult={mult}: cdc={t:.2f}s", flush=True)


def measure_rfm(spark) -> None:
    """`events_rfm_quantile_cutoffs` vs its exact-ntile twin past the
    round-3 curve's 20× stop (method unchanged: user_id-shifted disjoint
    copies, both cores on the same checkpointed frame). The round-3
    structural claim to falsify: the cutoff form stays flat (its only
    ordered window runs over the value histogram, O(domain)) while the
    ntile form's single-partition sort of the per-user relation trends
    up with users — 50×/100× (~1M/2M users) probes for the crossover."""
    print("== RFM ntile vs quantile-cutoff, disjoint user growth ==")
    from orchestrated_etl_spark.queries.analytics_wave5 import (
        rfm_cutoff_core,
        rfm_ntile_core,
    )

    ev_base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    shift = (ev_base.agg(F.max("user_id")).collect()[0][0] or 0) + 1
    for mult in (1, 20, 50, 100):
        ev = grow_shifted(
            ev_base, mult, ["user_id"], shifts={"user_id": shift}
        ).localCheckpoint(eager=True)
        ne = ev.count()
        t_ntile = steady(lambda: rfm_ntile_core(ev).count())
        t_cut = steady(lambda: rfm_cutoff_core(ev).count())
        print(
            f"events={ne} mult={mult}: ntile={t_ntile:.2f}s "
            f"cutoffs={t_cut:.2f}s",
            flush=True,
        )
        ev.unpersist()


def measure_events_seq(spark) -> None:
    """The other two per-user sequence headliners
    (`events_cep_conversion`, `events_attribution_linear`) under the
    same disjoint-user growth as sessionize: per-user sequence
    structure constant, so the growth term for both should be the
    user_id-partitioned sort/window volume — embarrassingly parallel
    across users, like sessionization."""
    print("== CEP + attribution, disjoint user growth ==")
    from orchestrated_etl_spark.queries.analytics_wave5 import (
        _attribution_linear,
    )
    from orchestrated_etl_spark.queries.wave13_round4 import (
        _cep_conversion,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for mult in (1, 20, 50):
        with staged_tmpdir(f"r9_evseq_{mult}_") as tmp:
            grown = grow_shifted(ev, mult, ["user_id", "event_id"])
            stage_parquet(grown, f"{tmp}/events.parquet")
            n = grown.count()
            t_cep = steady(lambda: _cep_conversion(spark, tmp).count())
            t_attr = steady(lambda: _attribution_linear(spark, tmp).count())
            print(
                f"events={n} mult={mult}: cep={t_cep:.2f}s "
                f"attribution={t_attr:.2f}s",
                flush=True,
            )


def measure_sq8(spark) -> None:
    """Refresh the round-2 SQ8-vs-brute-force curve on the CURRENT
    embeddings fixture (the r2 section's 5k/25k/100k points predate a
    fixture regeneration — sf0.1 is 2,000 base vectors now), using the
    same vec_id-shifted growth and fixed 20-query set as the r9 IVF
    measurement so the three ANN paths are directly comparable."""
    print("== sim_sq8_topk vs brute force, vec_id-shifted growth ==")
    from pyspark.sql import functions as SF

    from orchestrated_etl_spark.functions import similarity as SIM

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    shift = (base.agg(F.max("vec_id")).collect()[0][0] or 0) + 1
    queries = base.filter(
        (SF.col("vec_id") % 25 == 0) & (SF.col("vec_id") < 500)
    ).localCheckpoint(eager=True)
    for mult in (1, 20, 50):
        corpus = grow_shifted(
            base, mult, ["vec_id"], shifts={"vec_id": shift}
        ).localCheckpoint(eager=True)
        nv = corpus.count()
        t_sq8 = steady(
            lambda: SIM.sq8_topk(
                queries, corpus, "vec_id", "embedding", 5
            ).count()
        )
        t_bf = steady(
            lambda: SIM.brute_force_topk(
                queries, corpus, "vec_id", "embedding", 5
            ).count()
        )
        print(
            f"vectors={nv} mult={mult}: sq8={t_sq8:.2f}s "
            f"brute_force={t_bf:.2f}s",
            flush=True,
        )
        corpus.unpersist()


def main() -> None:
    spark = get_spark()
    families = sys.argv[2:] or [
        "pagerank", "bm25", "ivf", "dq", "sessionize", "cdc", "rfm",
        "events", "sq8",
    ]
    if "pagerank" in families:
        measure_pagerank(spark)
    if "bm25" in families:
        measure_bm25(spark)
    if "ivf" in families:
        measure_ivf(spark)
    if "dq" in families:
        measure_dq(spark)
    if "sessionize" in families:
        measure_sessionize(spark)
    if "cdc" in families:
        measure_cdc(spark)
    if "rfm" in families:
        measure_rfm(spark)
    if "events" in families:
        measure_events_seq(spark)
    if "sq8" in families:
        measure_sq8(spark)


if __name__ == "__main__":
    main()
