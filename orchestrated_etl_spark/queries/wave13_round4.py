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

from orchestrated_etl_spark.functions.graph import bfs_distances
from orchestrated_etl_spark.queries.graph_wave10 import cached_edges
from orchestrated_etl_spark.registry import register
from orchestrated_etl_spark.sources.catalog import read_events


# ---------------------------------------------------------------------------
# BFS frontier expansion over the co-purchase graph
# ---------------------------------------------------------------------------

_BFS_SEED = 0
_BFS_HOPS = 4


def _bfs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance from part 0 to every part within 4 hops of
    the weight>=2 co-purchase graph (the sparsified graph the other
    graph_* queries share via cached_edges). Spark has no recursive SQL,
    so the traversal is iterative frontier expansion — see
    functions/graph.bfs_distances for the per-round plan shape. The
    oracle is DuckDB's WITH RECURSIVE with set-dedup on (node, hop):
    its fixpoint relation is exactly the hop-labelled reachability set,
    and min(hop) per node is the BFS distance."""
    return bfs_distances(
        cached_edges(spark, sf_dir, min_weight=2), _BFS_SEED, _BFS_HOPS
    )


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
        HAVING count(*) >= 2
    ),
    u AS (
        SELECT part_a AS src, part_b AS dst FROM e
        UNION ALL
        SELECT part_b, part_a FROM e
    ),
    bfs(node, hop) AS (
        SELECT CAST({_BFS_SEED} AS BIGINT), 0
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
        pruned.join(F.broadcast(sup), pruned.l_suppkey == sup.s_suppkey)
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
    monster users (bots) are the known skew — production caps the
    per-user sequence (slice after sort) or sessionizes first
    (sessionize_events_30m) so the regex runs per session. The regex
    is RE2-compatible (no lookahead) so the DuckDB oracle runs the
    SAME pattern."""
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
