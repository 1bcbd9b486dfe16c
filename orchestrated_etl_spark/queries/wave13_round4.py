"""Wave-13 (round 4): iterative graph traversal, snapshot diffing,
runtime Bloom pre-filtering, entity resolution, and CEP-style sequence
patterns.

Five operator families a 100 TB lakehouse pipeline needs that no prior
wave covers:

- BFS frontier expansion (`graph_bfs_frontier`): the Pregel-style
  iterative traversal primitive (reachability, n-hop neighborhoods for
  related-item candidate generation), oracle-checked against a DuckDB
  recursive CTE.
- Table snapshot diff (`table_snapshot_diff`): change-data-feed between
  two table versions (the Delta/Iceberg CDF shape) as one co-partitioned
  full-outer join emitting insert/delete/update rows.
- Bloom-filter runtime pre-filter (`join_bloom_prefilter`): the
  runtime-filter join optimization hand-rolled as JVM bit-set
  expressions — the Bloom pass prunes the fact scan, the exact join
  keeps the result identical (false positives can only cost work, never
  correctness), which is exactly why the oracle is the PLAIN join.
- Entity resolution (`er_match_blocked_parts`): blocking + pairwise
  attribute scoring — the record-linkage primitive behind catalog dedup,
  bounded by Sigma block_size^2, never all-pairs.
- Complex-event sequence match (`events_cep_conversion`): Flink-CEP /
  MATCH_RECOGNIZE-style pattern detection over per-user ordered event
  sequences via one shuffle + map-side regex.

Reference parity note: the reference DAG (dags/dag.py) is a linear
pandas pipeline with none of these; they are part of the mandated
scale-extension surface (SURVEY §2.7 / LLM-pipeline ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orchestrated_etl_spark.functions.graph import (
    bfs_distances,
    shortest_path_bf,
    undirect,
)
from orchestrated_etl_spark.queries.graph_wave10 import (
    cached_edges,
    cached_undirected_layout,
)
from orchestrated_etl_spark.registry import register
from orchestrated_etl_spark.sources.catalog import read_events


# ---------------------------------------------------------------------------
# BFS frontier expansion over the co-purchase graph
# ---------------------------------------------------------------------------

_BFS_HOPS = 4


def _bfs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance to every part within 4 hops of the seed on
    the FULL (weight>=1) co-purchase graph — unlike the other graph_*
    queries, BFS runs on the dense graph: the weight>=2 forest is
    near-edgeless at sf0.1 (max component ~12 nodes), which would make
    the traversal vacuous, while the full graph exercises genuine
    frontier growth (hop sizes grow geometrically, then saturate by
    hop 3 — exactly the behavior distributed BFS exists for). The seed
    is the SMALLEST node id present in the edge set — deterministic and
    fixture-scale-independent; fetching it is a 1-scalar driver fetch,
    the same class as an iterative algorithm's hyperparameter, not a
    data collect. Spark has no recursive SQL, so the traversal is
    iterative frontier expansion — see functions/graph.bfs_distances
    for the per-round plan shape. The oracle is DuckDB's WITH RECURSIVE
    with set-dedup on (node, hop): its fixpoint relation is exactly the
    hop-labelled reachability set, and min(hop) per node is the BFS
    distance."""
    edges = cached_edges(spark, sf_dir, min_weight=1)
    seed = edges.agg(F.min("part_a")).collect()[0][0]
    u = cached_undirected_layout(spark, sf_dir, min_weight=1)
    return bfs_distances(edges, seed, _BFS_HOPS, u_layout=u)


register(
    "graph_bfs_frontier",
    _bfs_frontier,
    f"""
    WITH RECURSIVE
    li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    u AS (
        SELECT part_a AS src, part_b AS dst FROM e
        UNION ALL
        SELECT part_b, part_a FROM e
    ),
    bfs(node, hop) AS (
        SELECT (SELECT min(part_a) FROM e), 0
        UNION
        SELECT u.dst, bfs.hop + 1
        FROM bfs JOIN u ON u.src = bfs.node
        WHERE bfs.hop < {_BFS_HOPS}
    )
    SELECT node, CAST(min(hop) AS INTEGER) AS dist
    FROM bfs GROUP BY node
    """,
)


# ---------------------------------------------------------------------------
# table snapshot diff (change data feed between two versions)
# ---------------------------------------------------------------------------


def _snapshot_b(orders: DataFrame) -> DataFrame:
    """Deterministic 'next version' of orders: keys %50==0 deleted,
    surviving keys %7==0 get +100.00 totalprice, keys %101==0 cloned as
    inserts at key+10_000_000. (+100.0 keeps the update arithmetic an
    identical IEEE op on both engines — no rounding anywhere.)"""
    base = orders.where(F.col("o_orderkey") % 50 != 0)
    updated = base.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(100.0)
        ).otherwise(F.col("o_totalprice")),
    )
    inserts = orders.where(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    return updated.unionByName(inserts)


def _snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed between two snapshots of ``orders``: one
    co-partitioned FULL OUTER join on the key, classifying each key as
    insert / delete / update (value columns differ) and emitting old/new
    prices — the Delta-CDF shape computed from plain parquet versions.
    Unchanged keys (the overwhelming majority) are filtered BEFORE the
    output, so the result is change-sized, not table-sized. At 100 TB
    both snapshots hash-shuffle once on the join key (bucketed storage
    on o_orderkey makes the diff zero-shuffle); nothing else in the plan
    is table-wide. The comparison covers the mutable columns
    (o_totalprice here); schema evolution between versions is
    src_schema_evolution's department."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    a = orders
    b = _snapshot_b(orders)
    j = a.alias("a").join(
        b.alias("b"),
        F.col("a.o_orderkey") == F.col("b.o_orderkey"),
        "full_outer",
    )
    return (
        j.select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.col("a.o_totalprice").alias("old_price"),
            F.col("b.o_totalprice").alias("new_price"),
        )
        .withColumn(
            "change_type",
            F.when(F.col("old_price").isNull(), F.lit("insert"))
            .when(F.col("new_price").isNull(), F.lit("delete"))
            .when(
                F.col("old_price") != F.col("new_price"), F.lit("update")
            )
            .otherwise(F.lit("unchanged")),
        )
        .where(F.col("change_type") != "unchanged")
        .select("o_orderkey", "change_type", "old_price", "new_price")
    )


register(
    "table_snapshot_diff",
    _snapshot_diff,
    """
    WITH a AS (SELECT o_orderkey, o_totalprice FROM orders),
    b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 50 != 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_totalprice
        FROM orders WHERE o_orderkey % 101 = 0
    ),
    j AS (
        SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               a.o_totalprice AS old_price,
               b.o_totalprice AS new_price
        FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN old_price IS NULL THEN 'insert'
                WHEN new_price IS NULL THEN 'delete'
                WHEN old_price != new_price THEN 'update'
                ELSE 'unchanged' END AS change_type,
           old_price, new_price
    FROM j
    WHERE (CASE WHEN old_price IS NULL THEN 'insert'
                WHEN new_price IS NULL THEN 'delete'
                WHEN old_price != new_price THEN 'update'
                ELSE 'unchanged' END) != 'unchanged'
    """,
)


# ---------------------------------------------------------------------------
# Bloom-filter runtime join pre-filter
# ---------------------------------------------------------------------------

_BLOOM_WORDS = 64  # 64 longs = 4096 bits
_BLOOM_K = 3


def _bloom_positions(key_sql: str) -> list[tuple[F.Column, F.Column]]:
    """k (word, mask) pairs for a key: bit position = xxhash64(key, seed)
    mod 4096, identical expression on build and probe side. Built via
    F.expr because shiftleft's Python binding takes only a literal shift
    count, while the SQL function accepts a column."""
    m = _BLOOM_WORDS * 64
    out = []
    for seed in range(_BLOOM_K):
        pos = f"pmod(xxhash64({key_sql}, {seed}), {m})"
        word = F.expr(f"CAST({pos} DIV 64 AS INT)")
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))"
        )
        out.append((word, mask))
    return out


def _bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per high-balance supplier, with the fact scan pre-pruned
    by a hand-rolled Bloom filter built from the dim keys — the runtime
    row-group/row filter pattern (Spark's own
    spark.sql.optimizer.runtime.bloomFilter injects exactly this shape;
    bloom_filter_agg is not in the public function registry, so the bit
    set is built from first-class expressions).

    Build side: each dim key sets k=3 bits of a 4096-bit array — explode
    to (word, mask), bit_or per word, fold the <=64 rows into ONE map
    row (map_from_entries over collect_list — a scalar-sized broadcast,
    like the RFM cutoffs). Probe side: a row survives iff ALL its k bits
    are set — map lookups against the broadcast row, pure map-side.
    The subsequent broadcast equi-join computes the EXACT result, so
    Bloom false positives cost only wasted rows, never wrong rows —
    which is why the oracle is the plain join with no Bloom at all.
    At 100 TB the Bloom row is a tiny broadcast replacing a shuffle of
    the full fact table against a selective dim: rows failing the
    membership test never leave the scan stage."""
    sup = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .where(F.col("s_acctbal") > 9000)
        .select("s_suppkey")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    return bloom_prefilter_core(sup, li)


def bloom_prefilter_core(sup: DataFrame, li: DataFrame) -> DataFrame:
    """Bloom build + probe + exact join core — split out so tests can
    drive it with their own dim subset (the sf0.001 fixture has no
    supplier over the query's 9000 cutoff)."""
    # --- build: one map row {word -> bits} ---
    entries = sup.select(
        F.explode(
            F.array(
                *[
                    F.struct(w.alias("word"), m.alias("mask"))
                    for w, m in _bloom_positions("s_suppkey")
                ]
            )
        ).alias("e")
    ).select("e.word", "e.mask")
    words = entries.groupBy("word").agg(F.bit_or("mask").alias("bits"))
    bloom_row = words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("word", "bits")))
        ).alias("_bloom")
    )
    # --- probe: all k bits set (missing word => bit not set) ---
    probe = li.crossJoin(F.broadcast(bloom_row))
    hit = F.lit(True)
    for w, m in _bloom_positions("l_suppkey"):
        bits = F.coalesce(
            F.element_at(F.col("_bloom"), w), F.lit(0).cast("long")
        )
        hit = hit & (bits.bitwiseAND(m) != 0)
    pruned = probe.where(hit).drop("_bloom")
    # --- exact join + aggregate (decides the final result) ---
    return (
        # no forced hint: supplier is 10k·SF rows (round-15 review);
        # threshold/AQE broadcast it while small, shuffle past that
        pruned.join(sup, pruned.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )


register(
    "join_bloom_prefilter",
    _bloom_prefilter_join,
    """
    SELECT s.s_suppkey,
           count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2))
                       - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_acctbal > 9000
    GROUP BY s.s_suppkey
    """,
)


# ---------------------------------------------------------------------------
# entity resolution: blocked pairwise attribute scoring
# ---------------------------------------------------------------------------

_ER_THRESHOLD = 0.7


def _er_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage over the part catalog: candidate pairs are
    generated ONLY within a blocking key (exact p_name — the standard
    cheap blocker), then scored by weighted attribute agreement
    (brand 0.4, type 0.3, size within 2 units 0.15, price within 50.00
    0.15); pairs scoring >= 0.7 are matches. The score is a fixed
    left-to-right sum of identical double literals on both engines —
    bitwise-reproducible, no rounding.

    Scale shape: the block self-join is bounded by Sigma block_size^2,
    NOT |R|^2 — the blocker's whole job. One shuffle partitions by the
    blocking key; scoring is map-side on co-located rows. Monster
    blocks (a name shared by millions of listings) are the known
    failure mode: production blockers compose multiple keys (name +
    brand prefix) or salt oversized blocks, both of which only shrink
    blocks and slot into the same plan."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
    )
    a = part.alias("a")
    b = part.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_name") == F.col("b.p_name"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    )
    score = (
        F.when(F.col("a.p_brand") == F.col("b.p_brand"), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(F.col("a.p_type") == F.col("b.p_type"), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(
            F.abs(F.col("a.p_size") - F.col("b.p_size")) <= 2, F.lit(0.15)
        ).otherwise(F.lit(0.0))
        + F.when(
            F.abs(F.col("a.p_retailprice") - F.col("b.p_retailprice"))
            <= 50.0,
            F.lit(0.15),
        ).otherwise(F.lit(0.0))
    )
    return (
        pairs.withColumn("score", score)
        .where(F.col("score") >= _ER_THRESHOLD)
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            "score",
        )
    )


register(
    "er_match_blocked_parts",
    _er_match_parts,
    f"""
    -- literals are CAST AS DOUBLE: DuckDB otherwise sums DECIMALs
    -- exactly (0.4+0.3 = 0.7) while Spark sums doubles
    -- (0.7000000000000001) — same class as the round-2 HUGEINT lesson.
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           (CASE WHEN a.p_brand = b.p_brand
                 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
            + CASE WHEN a.p_type = b.p_type
                 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
            + CASE WHEN abs(a.p_size - b.p_size) <= 2
                 THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
            + CASE WHEN abs(a.p_retailprice - b.p_retailprice) <= 50.0
                 THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
               AS score
    FROM part a
    JOIN part b ON a.p_name = b.p_name AND a.p_partkey < b.p_partkey
    WHERE (CASE WHEN a.p_brand = b.p_brand
                 THEN CAST(0.4 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
            + CASE WHEN a.p_type = b.p_type
                 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
            + CASE WHEN abs(a.p_size - b.p_size) <= 2
                 THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
            + CASE WHEN abs(a.p_retailprice - b.p_retailprice) <= 50.0
                 THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
              >= CAST({_ER_THRESHOLD} AS DOUBLE)
    """,
)


# ---------------------------------------------------------------------------
# CEP-style sequence pattern over per-user event streams
# ---------------------------------------------------------------------------

# RE2-safe (DuckDB) AND java.util.regex-safe: no lookahead — the
# "anything but purchase" gap is an explicit alternation over the other
# event types. Both engines use leftmost, non-overlapping matching with
# greedy quantifiers; the alternation branches are disjoint literal
# words, so match sets are identical.
_CEP_PATTERN = "view( (click|view|signup|error))* purchase"


def _cep_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE / Flink-CEP-style sequence detection: per user,
    count non-overlapping view -> (no purchase in between) -> purchase
    conversions in the event-time-ordered event sequence. One user_id
    shuffle builds the ordered sequence (array_sort over a
    (ts, event_id, type) struct — total order, event_id breaks ts
    ties); the pattern machine is a map-side regexp_count over the
    joined type string. This is the sequence-pattern primitive behind
    funnel mining and abuse detection; the window twin
    (surface_wave4's _funnel) answers 'did the user ever convert',
    this one counts EVERY conversion episode.

    At 100 TB: one shuffle, sequences bounded by per-user activity;
    monster users (bots) are the known skew — the REGISTERED scale twin
    events_cep_sessionized bounds the regex input by 30-minute session
    instead of whole-user history (same pattern, same shuffle). The
    regex is RE2-compatible (no lookahead) so the DuckDB oracle runs
    the SAME pattern."""
    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    seqs = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: s["event_type"],
                ),
                " ",
            ).alias("seq"),
            F.count(F.lit(1)).alias("seq_len"),
        )
    )
    return (
        seqs.select(
            "user_id",
            "seq_len",
            F.regexp_count(F.col("seq"), F.lit(_CEP_PATTERN)).alias(
                "n_conversions"
            ),
        )
        .where(F.col("n_conversions") > 0)
    )


register(
    "events_cep_conversion",
    _cep_conversion,
    f"""
    WITH seqs AS (
        SELECT user_id,
               string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq,
               count(*) AS seq_len
        FROM events
        WHERE user_id IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, seq_len,
           CAST(len(regexp_extract_all(seq, '{_CEP_PATTERN}')) AS INTEGER)
               AS n_conversions
    FROM seqs
    WHERE len(regexp_extract_all(seq, '{_CEP_PATTERN}')) > 0
    """,
)


# ---------------------------------------------------------------------------
# distributed skyline (Pareto frontier)
# ---------------------------------------------------------------------------


def _skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier of the part catalog under (minimize
    p_retailprice, minimize p_size), strict dominance: a part survives
    iff no part is <= on both dimensions and < on at least one.

    Distributed two-phase plan (the textbook divide-and-conquer skyline,
    NOT the naive |R|^2 self-join the oracle runs):
    - partition the price axis into bands (floor(price/5) — a value
      rule, so band(q) < band(p) implies q.price < p.price);
    - CROSS-BAND pruning needs only each band's min size: a point is
      dominated by SOME strictly-cheaper band iff the prefix-min of
      band min-sizes at its band is <= its size (strict dominance free
      via the strictly-lower price). The prefix-min runs over the
      #bands-row relation, then broadcasts back — no global sort of
      the data relation anywhere;
    - WITHIN-BAND dominance is exact pairwise inside the band (the ER
      blocking bound: Sigma band_size^2, tunable via band width).
    At 100 TB the bands are the partitioning; every data-sized op is
    a hash shuffle on band or a broadcast of the #bands-row stats."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        F.floor(F.col("p_retailprice") / 5).cast("long").alias("_band"),
    )
    from pyspark.sql import Window

    band_stats = part.groupBy("_band").agg(
        F.min("p_size").alias("_band_min_size")
    )
    wb = Window.orderBy("_band").rowsBetween(
        Window.unboundedPreceding, -1
    )  # ordered window over the ~20-row band relation only
    prev_min = band_stats.select(
        "_band", F.min("_band_min_size").over(wb).alias("_prev_min_size")
    )
    # Checkpoint the pruned candidates ONCE: three consumers below
    # (pair side a, pair side b, final anti-join) would otherwise each
    # replay the part scan + band join — 6 scans for a relation that is
    # skyline-small after cross-band pruning.
    cand = (
        part.join(F.broadcast(prev_min), "_band", "left")
        .where(
            F.col("_prev_min_size").isNull()
            | (F.col("p_size") < F.col("_prev_min_size"))
        )
        .localCheckpoint(eager=True)
    )
    # within-band exact dominance on the pruned candidates
    a = cand.alias("a")
    b = cand.alias("b")
    dominated = a.join(
        b,
        (F.col("a._band") == F.col("b._band"))
        & (F.col("b.p_retailprice") <= F.col("a.p_retailprice"))
        & (F.col("b.p_size") <= F.col("a.p_size"))
        & (
            (F.col("b.p_retailprice") < F.col("a.p_retailprice"))
            | (F.col("b.p_size") < F.col("a.p_size"))
        ),
        "left_semi",
    )
    return (
        cand.join(dominated.select("a.p_partkey"), "p_partkey", "left_anti")
        .select("p_partkey", "p_retailprice", "p_size")
    )


register(
    "skyline_price_size",
    _skyline,
    """
    SELECT a.p_partkey, a.p_retailprice, a.p_size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size <= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
    )
    """,
)


# ---------------------------------------------------------------------------
# weighted shortest path: Bellman-Ford relaxation rounds
# ---------------------------------------------------------------------------

_BF_ROUNDS = 3


def _shortest_path_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum total edge weight from part 0 using <= 3 edges, on the
    weight>=2 co-purchase graph (weights as integer costs — exact
    BIGINT arithmetic end to end, no float drift). Bellman-Ford
    expressed relationally: each round unions the current distance
    relation with every one-edge relaxation and takes min(cost) per
    node; k rounds give exact <=k-edge shortest costs. Per-round
    localCheckpoint (the pagerank/BFS pattern) keeps round N's plan
    from replaying rounds 1..N-1. Round cost: one join of the
    distance relation (<=|V| rows) against the edge list + one
    min-aggregate — the Pregel SSSP shape. The oracle unrolls the
    same three rounds as CTEs (DuckDB's recursive CTE cannot
    aggregate per iteration). Seed = smallest node in the edge set
    (see _bfs_frontier: a fixed literal is isolated at sf0.1)."""
    edges = cached_edges(spark, sf_dir, min_weight=2)
    seed = edges.agg(F.min("part_a")).collect()[0][0]
    return shortest_path_bf(edges, seed, _BF_ROUNDS)


register(
    "graph_shortest_path_weighted",
    _shortest_path_bf,
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    u AS (SELECT pa AS s, pb AS d, w FROM e
          UNION ALL SELECT pb AS s, pa AS d, w FROM e),
    d0 AS (SELECT (SELECT min(pa) FROM e) AS node, CAST(0 AS BIGINT) AS c),
    d1 AS (SELECT node, min(c) AS c FROM (
        SELECT node, c FROM d0 UNION ALL
        SELECT u.d AS node, d0.c + u.w AS c FROM d0 JOIN u ON u.s = d0.node
    ) GROUP BY node),
    d2 AS (SELECT node, min(c) AS c FROM (
        SELECT node, c FROM d1 UNION ALL
        SELECT u.d AS node, d1.c + u.w AS c FROM d1 JOIN u ON u.s = d1.node
    ) GROUP BY node),
    d3 AS (SELECT node, min(c) AS c FROM (
        SELECT node, c FROM d2 UNION ALL
        SELECT u.d AS node, d2.c + u.w AS c FROM d2 JOIN u ON u.s = d2.node
    ) GROUP BY node)
    SELECT node, c FROM d3
    """,
)


# ---------------------------------------------------------------------------
# interval-union coverage per user
# ---------------------------------------------------------------------------


def _interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity coverage: each event opens a 10-minute
    attention interval [ts, ts+10m); overlapping intervals merge, and
    the output is each user's merged-span count and total covered
    seconds — the interval-union aggregate behind ad-exposure,
    uptime, and watch-time metrics.

    Classic sweep, one user_id shuffle: running max of interval END
    over prior rows (ties broken by event_id) marks a new span
    whenever the next start exceeds it; cumulative-sum of the marks
    numbers the spans; two stacked aggregates ride the same
    partitioning. Interval arithmetic only (no cast-to-double on
    timestamps — NTZ-safe). Span lengths are summed in exact elapsed
    MICROSECONDS then integer-divided to seconds: DuckDB's
    date_diff('second') counts second-BOUNDARY crossings while Spark's
    timestampdiff(SECOND) floors elapsed time — off by one whenever a
    span's end has a smaller sub-second fraction than its start. At µs
    granularity (the storage resolution) both measures coincide
    exactly."""
    ev = (
        read_events(spark, sf_dir)
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "new_span",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    spans = flagged.withColumn(
        "span_id",
        F.sum("new_span").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    merged = spans.groupBy("user_id", "span_id").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.expr("timestampdiff(MICROSECOND, ms, me)"))
            .cast("long")
            .alias("_us"),
        )
        .select(
            "user_id",
            "n_spans",
            F.expr("_us DIV 1000000").alias("covered_seconds"),
        )
    )


register(
    "events_interval_coverage",
    _interval_coverage,
    """
    WITH iv AS (
        SELECT user_id, event_id, ts AS s,
               ts + INTERVAL '10 minutes' AS e
        FROM events WHERE user_id IS NOT NULL
    ),
    m AS (
        SELECT user_id, s, e,
               CASE WHEN max(e) OVER (PARTITION BY user_id
                        ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                      OR s > max(e) OVER (PARTITION BY user_id
                        ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_span,
               event_id
        FROM iv
    ),
    g AS (
        SELECT user_id, s, e,
               CAST(sum(new_span) OVER (PARTITION BY user_id
                    ORDER BY s, e, event_id ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS span_id
        FROM m
    ),
    merged AS (
        SELECT user_id, span_id, min(s) AS ms, max(e) AS me
        FROM g GROUP BY user_id, span_id
    )
    SELECT user_id, count(*) AS n_spans,
           CAST(sum(date_diff('microsecond', ms, me)) AS BIGINT) // 1000000
               AS covered_seconds
    FROM merged GROUP BY user_id
    """,
)


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4 |> operators)
# ---------------------------------------------------------------------------


def _pipe_syntax_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (|> operators — the linear FROM-first
    query form): filter -> aggregate -> order as a pipeline. Parses to
    exactly the same logical plan as the nested SELECT the oracle runs
    (one scan, one partial+final aggregate), so this is an API-surface
    query: the engine accepts BOTH spellings of the same plan. DECIMAL
    accumulation cast to double per the registry float policy."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "v_orders_pipe"
    )
    return spark.sql(
        """
        FROM v_orders_pipe
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DOUBLE) AS total_price
           GROUP BY o_orderpriority
        """
    )


register(
    "sql_pipe_syntax_rollup",
    _pipe_syntax_rollup,
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# correlated LATERAL subquery (top-k per key without a window)
# ---------------------------------------------------------------------------


def _lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 suppliers by account balance via a correlated
    LATERAL subquery — the SQL-standard alternative to the row_number()
    window (window_topk_per_group). Catalyst rewrites the correlated
    LATERAL LIMIT into a window partitioned by the correlation key —
    which is the 25-value nation key over the GROWING supplier table,
    the r15 verdict's parallelism-ceiling class. Round-16 rework: a
    salted phase-1 top-2 per (nation, s_suppkey%32) — pure SQL, every
    window partition ~1/32 of a nation, and the per-salt top-2
    provably contains every global top-2 member — bounds the LATERAL's
    input to ≤ 2·32 survivors per nation, so the rewrite window sorts
    ≤ 64 rows per nation BY CONSTRUCTION at any corpus size while the
    LATERAL surface (the thing this query demonstrates) is unchanged.
    Deterministic tie-break on s_suppkey; DuckDB runs the single-pass
    statement (identical result: same total order both phases)."""
    spark.read.parquet(f"{sf_dir}/supplier.parquet").createOrReplaceTempView(
        "v_supplier_lat"
    )
    return spark.sql(
        """
        WITH cand AS (
            SELECT s_nationkey, s_suppkey, s_acctbal
            FROM (SELECT s_nationkey, s_suppkey, s_acctbal,
                         row_number() OVER (
                             PARTITION BY s_nationkey, s_suppkey % 32
                             ORDER BY s_acctbal DESC, s_suppkey) AS rn
                  FROM v_supplier_lat)
            WHERE rn <= 2
        )
        SELECT n.s_nationkey, t.s_suppkey, t.s_acctbal
        FROM (SELECT DISTINCT s_nationkey FROM cand) n,
        LATERAL (SELECT s_suppkey, s_acctbal FROM cand s
                 WHERE s.s_nationkey = n.s_nationkey
                 ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
        """
    )


register(
    "sql_lateral_correlated_topk",
    _lateral_topk,
    """
    SELECT n.s_nationkey, t.s_suppkey, t.s_acctbal
    FROM (SELECT DISTINCT s_nationkey FROM supplier) n,
    LATERAL (SELECT s_suppkey, s_acctbal FROM supplier s
             WHERE s.s_nationkey = n.s_nationkey
             ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) t
    """,
)


# ---------------------------------------------------------------------------
# grid-blocked spatial radius join
# ---------------------------------------------------------------------------

_SPATIAL_R = 25  # radius; also the grid cell size


def _spatial_points(df: DataFrame, id_col: str, a: int, b: int, c: int, d: int):
    """Deterministic synthetic coordinates on a 1000x1000 integer grid:
    multiplicative-hash of the id (portable SQL arithmetic — identical
    on any engine, unlike engine-specific hash functions). Integer
    coordinates keep every distance computation exact."""
    return df.select(
        F.col(id_col),
        ((F.col(id_col) * a + b) % 1000).alias("x"),
        ((F.col(id_col) * c + d) % 1000).alias("y"),
    )


def _spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join: every (user, store) pair within Euclidean
    distance 25 on a synthetic 1000x1000 grid (coordinates are
    multiplicative hashes of the ids — deterministic, uniform, and
    reproducible in plain SQL on any engine). The classic grid-blocked
    plan: bucket both sides into r x r cells, replicate the SMALL side
    (stores) into its 3x3 neighborhood map-side (x9 on the small
    relation only), equi-join on the cell key, then the exact integer
    distance^2 filter. Candidate pairs are bounded by cell density —
    never the |A| x |B| cross join the oracle runs. At 100 TB this is
    the standard geospatial join: cell key = geohash prefix, hash
    shuffle on cells, skew handled by splitting hot cells (same salting
    slot as the ER blocker). Output columns exact integers."""
    ev = read_events(spark, sf_dir)
    users = _spatial_points(
        ev.where(F.col("user_id").isNotNull()).select("user_id").distinct(),
        "user_id", 2654435761, 0, 40503, 7,
    ).withColumn("_ux", F.col("x")).withColumn("_uy", F.col("y"))
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    stores = _spatial_points(
        part.where(F.col("p_partkey") < 200).select(
            F.col("p_partkey").alias("store_id")
        ),
        "store_id", 48271, 11, 69621, 3,
    )
    r = _SPATIAL_R
    # replicate stores into their 3x3 cell neighborhood (small side only)
    neigh = stores.select(
        "store_id",
        F.col("x").alias("_sx"),
        F.col("y").alias("_sy"),
        F.explode(
            F.expr(
                f"flatten(transform(sequence(-1, 1), dx -> "
                f"transform(sequence(-1, 1), dy -> "
                f"struct((x DIV {r}) + dx AS cx, (y DIV {r}) + dy AS cy))))"
            )
        ).alias("_cell"),
    ).select("store_id", "_sx", "_sy", "_cell.cx", "_cell.cy")
    cand = users.select(
        "user_id",
        "_ux",
        "_uy",
        (F.col("_ux") / r).cast("long").alias("cx"),
        (F.col("_uy") / r).cast("long").alias("cy"),
    ).join(F.broadcast(neigh), ["cx", "cy"])
    d2 = (F.col("_ux") - F.col("_sx")) * (F.col("_ux") - F.col("_sx")) + (
        F.col("_uy") - F.col("_sy")
    ) * (F.col("_uy") - F.col("_sy"))
    return cand.where(d2 <= r * r).select(
        "user_id",
        "store_id",
        d2.cast("long").alias("dist_sq"),
    )


register(
    "spatial_radius_join",
    _spatial_radius_join,
    f"""
    WITH u AS (
        SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL
    ),
    up AS (
        SELECT user_id,
               (user_id * 2654435761) % 1000 AS x,
               (user_id * 40503 + 7) % 1000 AS y
        FROM u
    ),
    st AS (
        SELECT p_partkey AS store_id,
               (p_partkey * 48271 + 11) % 1000 AS x,
               (p_partkey * 69621 + 3) % 1000 AS y
        FROM part WHERE p_partkey < 200
    )
    SELECT up.user_id, st.store_id,
           (up.x - st.x)*(up.x - st.x) + (up.y - st.y)*(up.y - st.y)
               AS dist_sq
    FROM up, st
    WHERE (up.x - st.x)*(up.x - st.x) + (up.y - st.y)*(up.y - st.y)
          <= {_SPATIAL_R * _SPATIAL_R}
    """,
)


def _cep_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCALE TWIN of events_cep_conversion (the asof_join_salted /
    events_rfm_quantile_cutoffs pattern: the documented mitigation is
    REGISTERED, not a comment): the pattern machine runs per 30-minute
    SESSION instead of per whole-user history, so the regex input is
    bounded by session length no matter how monstrous a user's total
    event count — a bot with 10^8 events becomes 10^5 bounded sessions
    that parallelize, instead of one 10^8-char string on one task.
    Conversions cannot span a >30-min idle gap under this contract
    (usually the BETTER semantics for conversion analysis). Same single
    user_id shuffle; the lag/cum-sum sessionizer and the sequence
    aggregate ride one partitioning. Output: per-user conversion count
    and session count."""
    ev = read_events(spark, sf_dir).where(F.col("user_id").isNotNull())
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    seqs = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            " ",
        ).alias("seq")
    )
    per_session = seqs.select(
        "user_id",
        F.regexp_count(F.col("seq"), F.lit(_CEP_PATTERN)).alias("_n"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.sum("_n").alias("n_conversions"),
            F.count(F.lit(1)).alias("n_sessions"),
        )
        .where(F.col("n_conversions") > 0)
    )


register(
    "events_cep_sessionized",
    _cep_sessionized,
    f"""
    WITH x AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WHERE user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
        FROM x
    ),
    seqs AS (
        SELECT user_id, session_id,
               string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
        FROM s GROUP BY user_id, session_id
    ),
    per_session AS (
        SELECT user_id,
               len(regexp_extract_all(seq, '{_CEP_PATTERN}')) AS n
        FROM seqs
    )
    SELECT user_id,
           CAST(sum(n) AS BIGINT) AS n_conversions,
           count(*) AS n_sessions
    FROM per_session GROUP BY user_id
    HAVING sum(n) > 0
    """,
)


# ---------------------------------------------------------------------------
# multi-distinct aggregate (Expand operator)
# ---------------------------------------------------------------------------


def _multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several DISTINCT aggregates over different columns in ONE
    statement: Catalyst plans an Expand (one replicated row per
    distinct-group) + two-stage aggregate — the row multiplication is
    x(#distinct groups) MAP-SIDE, the partial aggregate collapses each
    group before the shuffle, so the exchange carries near-aggregate-
    sized data, not the expanded fact. The scale caveat the plan
    encodes: every extra DISTINCT column widens the Expand, so at
    100 TB wide multi-distincts either split into joined single-
    distinct passes or drop to approx_count_distinct
    (agg_approx_sketches is that registered path)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count_distinct(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "n_months"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


register(
    "agg_multi_distinct",
    _multi_distinct,
    """
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT)
               AS n_months,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# parameterized SQL (named parameter markers)
# ---------------------------------------------------------------------------


def _parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(query, args=...) with :marker
    binding) — the injection-safe query API: parameters bind as typed
    literals in the parser, never string-spliced, and Catalyst
    constant-folds them so pushdown/pruning see real literals (the
    filter reaches the parquet scan exactly as if written inline).
    The oracle inlines the same values."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView(
        "v_orders_param"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM v_orders_param
        WHERE o_orderstatus = :status AND o_totalprice > :floor
        GROUP BY o_orderpriority
        """,
        args={"status": "F", "floor": 50000.0},
    )


register(
    "sql_parameterized_args",
    _parameterized_sql,
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 50000.0
    GROUP BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peeling)
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 3


def _kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling on the weight>=2 co-purchase graph: repeatedly
    drop nodes whose degree within the SURVIVING subgraph is < k
    (community-core extraction — the standard preprocessing cut before
    expensive per-node analytics). Three peeling rounds registered
    (1880 -> 1245 -> 1078 -> 1019 nodes at sf0.01 — each round does
    real work); a fixpoint loop is the same code with an emptiness
    check per round. Each round: semi-join the edge list to surviving
    nodes on BOTH endpoints, recount degrees, filter — edge-list-sized
    joins and aggregates, per-round localCheckpoint (the established
    iteration pattern). Output: surviving nodes with their final-round
    in-core degree, exact BIGINTs; the oracle unrolls the same three
    rounds."""
    edges = cached_edges(spark, sf_dir, min_weight=2)
    u = undirect(edges).localCheckpoint(eager=True)
    alive = u.select(F.col("src").alias("node")).distinct()
    deg = None
    for _ in range(_KCORE_ROUNDS):
        a = alive.select(F.col("node").alias("_na"))
        b = alive.select(F.col("node").alias("_nb"))
        deg = (
            u.join(a, u["src"] == F.col("_na"), "left_semi")
            .join(b, u["dst"] == F.col("_nb"), "left_semi")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        alive = (
            deg.where(F.col("degree") >= _KCORE_K)
            .select("node")
            .localCheckpoint(eager=True)
        )
    return deg.join(alive, "node", "left_semi").select("node", "degree")


register(
    "graph_kcore",
    _kcore,
    f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    u AS (SELECT pa AS s, pb AS d FROM e
          UNION ALL SELECT pb AS s, pa AS d FROM e),
    n0 AS (SELECT DISTINCT s AS node FROM u),
    d1 AS (SELECT u.s AS node, count(*) AS dg FROM u
           JOIN n0 a ON u.s = a.node JOIN n0 b ON u.d = b.node GROUP BY 1),
    n1 AS (SELECT node FROM d1 WHERE dg >= {_KCORE_K}),
    d2 AS (SELECT u.s AS node, count(*) AS dg FROM u
           JOIN n1 a ON u.s = a.node JOIN n1 b ON u.d = b.node GROUP BY 1),
    n2 AS (SELECT node FROM d2 WHERE dg >= {_KCORE_K}),
    d3 AS (SELECT u.s AS node, count(*) AS dg FROM u
           JOIN n2 a ON u.s = a.node JOIN n2 b ON u.d = b.node GROUP BY 1),
    n3 AS (SELECT node FROM d3 WHERE dg >= {_KCORE_K})
    SELECT d3.node, d3.dg AS degree
    FROM d3 JOIN n3 ON d3.node = n3.node
    """,
)


# ---------------------------------------------------------------------------
# stored-moments incremental variance (merge partials, never re-scan)
# ---------------------------------------------------------------------------


def _incremental_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental mean/variance from STORED per-month moment partials
    (n, sum, sum-of-squares) — the numeric twin of agg_hll_sketch_merge:
    a nightly job appends one moments row per (status, month) partition,
    and any later query over any month range merges those tiny rows
    instead of re-scanning raw data. Moments are EXACT DECIMAL sums of
    2-decimal prices (sum DECIMAL(38,2), sum-of-squares DECIMAL(38,4) —
    no float drift in the stored partials), so the merged mean/variance
    are computed from bit-identical scalars on both engines. The
    variance numerator stays EXACT DECIMAL all the way:
    var = (N*Q - S^2) / (N*(N-1)) — N*Q and S^2 are integer-scaled
    decimal products (precisions sized so neither engine saturates its
    38-digit cap) and the subtraction is exact. The numerator exceeds
    2^53, and a >2^53 DECIMAL -> DOUBLE cast is the one conversion the
    two engines round DIFFERENTLY (Spark's BigDecimal.doubleValue is
    correctly rounded once; DuckDB's int128-scaled path double-rounds
    — measured 4e-6 drift on a 2e10 variance), so the variance is
    reported on a 1000-unit grid (floor(var/1000) BIGINT): the grid
    quantum sits 8+ orders above the drift, making a boundary flip
    probability ~4e-9 instead of certainty-of-ulp-mismatch. The mean
    needs no grid: S fits 2^53, its cast is exact on both engines."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderstatus",
        F.date_trunc("month", F.col("o_orderdate")).alias("_m"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("_x"),
    )
    # the "stored" monthly partials relation (localCheckpoint stands in
    # for the persisted moments table, as with the HLL sketch store)
    monthly = (
        orders.groupBy("o_orderstatus", "_m")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_x").cast("decimal(38,2)").alias("_s"),
            F.sum(
                (F.col("_x") * F.col("_x")).cast("decimal(38,4)")
            ).cast("decimal(38,4)").alias("_q"),
        )
        .localCheckpoint(eager=True)
    )
    merged = monthly.groupBy("o_orderstatus").agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_partials"),
        F.sum("_s").cast("decimal(18,2)").alias("_S"),
        F.sum("_q").cast("decimal(20,4)").alias("_Q"),
    )
    # exact-decimal numerator: N*Q (10+20+1=31 digits) - S^2 (37 digits)
    num = (
        F.col("n_rows").cast("decimal(10,0)") * F.col("_Q")
        - (F.col("_S") * F.col("_S")).cast("decimal(38,4)")
    ).cast("decimal(38,4)")
    den = (F.col("n_rows") * (F.col("n_rows") - F.lit(1))).cast("double")
    return merged.select(
        "o_orderstatus",
        "n_rows",
        "n_partials",
        (F.col("_S").cast("double") / F.col("n_rows").cast("double")).alias(
            "mean_price"
        ),
        F.floor(num.cast("double") / den / F.lit(1000.0))
        .cast("long")
        .alias("var_price_k"),
    )


register(
    "agg_incremental_moments",
    _incremental_moments,
    """
    WITH monthly AS (
        SELECT o_orderstatus,
               date_trunc('month', o_orderdate) AS m,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(38,2)) AS s,
               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                             * CAST(o_totalprice AS DECIMAL(18,2))
                             AS DECIMAL(38,4)))
                    AS DECIMAL(38,4)) AS q
        FROM orders
        GROUP BY 1, 2
    )
    SELECT o_orderstatus,
           CAST(sum(n) AS BIGINT) AS n_rows,
           count(*) AS n_partials,
           CAST(CAST(sum(s) AS DECIMAL(18,2)) AS DOUBLE)
               / CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) AS mean_price,
           CAST(floor(
             CAST(CAST(
                CAST(CAST(sum(n) AS BIGINT) AS DECIMAL(10,0))
                  * CAST(sum(q) AS DECIMAL(20,4))
                -- DECIMAL(19,2) forces DuckDB's int128 storage class:
                -- at precision 18 it multiplies in int64 and overflows
                - CAST(CAST(sum(s) AS DECIMAL(19,2))
                       * CAST(sum(s) AS DECIMAL(19,2)) AS DECIMAL(38,4))
                AS DECIMAL(38,4)) AS DOUBLE)
             / CAST(CAST(sum(n) AS BIGINT)
                    * (CAST(sum(n) AS BIGINT) - 1) AS DOUBLE)
             / 1000.0) AS BIGINT) AS var_price_k
    FROM monthly
    GROUP BY o_orderstatus
    """,
)


# ---------------------------------------------------------------------------
# exact rolling median over the daily revenue series
# ---------------------------------------------------------------------------


def _rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling EXACT median of daily order revenue. Spark has no
    median window aggregate, so the frame's values are collected and
    sorted per row (array_sort over collect_list) and the middle
    element(s) picked — exact, not approximate, and O(w log w) per row
    for the fixed w=7 frame. Even-count frames average the two middle
    values with the same (a+b)/2 double op DuckDB's windowed median
    interpolates with, on identical exact-DECIMAL-derived inputs.

    Scale shape (round-13 rewrite — this was the registry's last
    allowlisted GLOBAL window): the fact-sized work is the one
    day-grouped aggregate; the rolling frame then runs over the
    DATE-RANGE-sized daily relation via the bounded-overlap pattern
    instead of one unpartitioned WindowExec. The series is bucketed by
    YEAR, each bucket's last 6 ROWS are replicated as padding into the
    next non-empty bucket (the 6-PRECEDING frame never reaches further
    back), the window runs partitionBy(bucket), and padding rows are
    dropped after the frame is computed — bit-identical to the global
    ROWS BETWEEN 6 PRECEDING window while every executor works one year.
    PRECONDITION (runtime-ENFORCED, round-14 advice): each non-final
    bucket carries >= 6 rows — a year of a daily series has 100s; a
    sparser series would pick a coarser bucket. A violation no longer
    corrupts med7 silently: per-bucket counts (an O(#years) aggregate on
    the already-checkpointed daily relation, broadcast back) gate every
    output row through ``raise_error``, so a <6-row non-final bucket
    fails loudly with the bucket and its count named — pinned by
    tests/test_round4_ops.py::test_rolling_median_sparse_bucket_guard.
    The next-bucket mapping is a broadcast
    self-join on the ~#years bucket spine (no window), so calendar gaps
    (an entirely empty year) pad into the next PRESENT year, preserving
    row-frame semantics under gaps. A rolling median over a per-key
    fact-sized series would partition by key instead and skip the
    padding entirely; the frame logic is unchanged."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    daily = (
        orders.groupBy(
            F.col("o_orderdate").cast("date").alias("day")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
        # 4 consumers (spine, pad source, main rows, next-bucket map):
        # checkpoint the O(calendar-range) daily relation so the fact is
        # aggregated ONCE, not re-scanned per consumer.
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    base = daily.withColumn("b", F.trunc("day", "year"))
    bkts = base.select("b").distinct()
    nxt = (
        bkts.alias("a")
        .join(F.broadcast(bkts.alias("n")), F.col("n.b") > F.col("a.b"),
              "left")
        .groupBy(F.col("a.b").alias("b"))
        .agg(F.min(F.col("n.b")).alias("next_b"))
    )
    tail6 = Window.partitionBy("b").orderBy(F.desc("day"))
    pads = (
        base.withColumn("rnd", F.row_number().over(tail6))
        .where(F.col("rnd") <= 6)
        .join(F.broadcast(nxt), "b")
        .where(F.col("next_b").isNotNull())
        .select(
            "day", "rev",
            F.col("next_b").alias("b"), F.lit(True).alias("is_pad"),
        )
    )
    # Precondition guard: a non-final bucket with < 6 rows can't donate
    # a full pad tail, so the NEXT bucket's leading frames would
    # silently under-fill. Count rows per bucket (O(#years) output, one
    # more consumer of the checkpointed daily relation), broadcast the
    # verdict back, and route every output row's median through the
    # check so a violation raises instead of returning wrong medians.
    guard = (
        base.groupBy("b")
        .agg(F.count(F.lit(1)).alias("bucket_rows"))
        .join(F.broadcast(nxt), "b")
        .select(
            "b",
            "bucket_rows",
            (F.col("next_b").isNull() | (F.col("bucket_rows") >= 6))
            .alias("bucket_ok"),
        )
    )
    un = (
        base.select("day", "rev", "b", F.lit(False).alias("is_pad"))
        .unionByName(pads)
        .join(F.broadcast(guard), "b")
    )

    w = Window.partitionBy("b").orderBy("day").rowsBetween(
        -6, Window.currentRow
    )
    sorted_frame = F.array_sort(F.collect_list("rev").over(w))
    n = F.size(sorted_frame)
    mid_hi = ((n + 1) / F.lit(2)).cast("int")  # element_at wants INT
    mid_lo = (n / F.lit(2)).cast("int")
    med = F.when(
        n % 2 == 1,
        F.element_at(sorted_frame, mid_hi),
    ).otherwise(
        (
            F.element_at(sorted_frame, mid_lo)
            + F.element_at(sorted_frame, mid_lo + 1)
        )
        / F.lit(2.0)
    )
    # Every output row evaluates med7, so hanging the precondition off
    # it cannot be pruned away by Catalyst: a violating bucket raises
    # on the first row an executor materializes.
    med_guarded = F.when(F.col("bucket_ok"), med).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "window_rolling_median: non-final year bucket "
                ),
                F.col("b").cast("string"),
                F.lit(" has only "),
                F.col("bucket_rows").cast("string"),
                F.lit(
                    " rows (< 6); the bounded-overlap rewrite needs a"
                    " coarser bucket for a series this sparse"
                ),
            )
        )
    )
    return (
        un.select("day", "rev", "is_pad", med_guarded.alias("med7"))
        .where(~F.col("is_pad"))
        .select("day", "rev", "med7")
    )


register(
    "window_rolling_median",
    _rolling_median,
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev
        FROM orders GROUP BY 1
    )
    SELECT day, rev,
           median(rev) OVER (ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
    FROM daily
    """,
)
