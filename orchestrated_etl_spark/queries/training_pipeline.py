"""Training-data pipeline operators over ``documents``: per-source caps,
token-budget sequence packing, weighted mixture sampling, column profiling.

These extend the reference's single enrich stage (dags/dag.py:152-184)
toward what a 100 TB pretraining-data pipeline actually runs between dedup
and tokenization. Every op is a pure DataFrame expression (no UDFs, no
collect); the only shuffles are the window/group keys named below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from orchestrated_etl_spark.functions import text as X
from orchestrated_etl_spark.registry import register

_HASH_MULT = 2654435761
_HASH_MOD = 4294967296

# ---------------------------------------------------------------------------
# per-source cap (group-balanced downsampling)
# ---------------------------------------------------------------------------


def _cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at 15 documents, deterministic (by doc_id). The
    standard guard against one crawl dump dominating the mixture. One
    shuffle on `source`; row_number keeps O(1) state per stratum."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy(F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 15)
        .drop("rn")
    )


register(
    "train_cap_per_source",
    _cap_per_source,
    """
    SELECT doc_id, source, lang FROM documents
    QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 15
    """,
)


# ---------------------------------------------------------------------------
# token-budget packing (sequence packing for pretraining shards)
# ---------------------------------------------------------------------------


def _token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-by-order sequence packing: within each source, walk documents
    in doc_id order and open a new bin whenever the running token total
    crosses the 2048-token budget. bin = floor(exclusive-prefix-sum /
    budget) — one window shuffle on `source`, no iteration.

    Scale note: packing is per-source (per-shard) by construction — a
    GLOBAL ordered window would serialise through one partition at 100 TB.
    """
    budget = 2048
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select(
        "doc_id", "source", X.token_count("text").alias("n_tokens")
    )
    return toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / F.lit(budget)
        ).cast("long"),
    )


register(
    "train_token_packing",
    _token_packing,
    """
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(floor(
               (sum(CAST(len(string_split(text, ' ')) AS INTEGER))
                    OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING)
                - CAST(len(string_split(text, ' ')) AS INTEGER)
               ) / 2048.0) AS BIGINT) AS bin_id
    FROM documents
    """,
)


# ---------------------------------------------------------------------------
# weighted mixture sampling
# ---------------------------------------------------------------------------


def _mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-weighted mixture: keep all English, half of Chinese, a
    quarter of everything else — via the same deterministic per-key hash
    as scale_ops (reproducible across reruns and engines, evaluated in the
    scan stage, no shuffle at all)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    weight = (
        F.when(F.col("lang") == "en", F.lit(1.0))
        .when(F.col("lang") == "zh", F.lit(0.5))
        .otherwise(F.lit(0.25))
    )
    bucket = (F.col("doc_id") * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)
    return docs.where(bucket < weight * F.lit(float(_HASH_MOD))).select(
        "doc_id", "lang", "source"
    )


register(
    "train_mixture_sampling",
    _mixture,
    f"""
    SELECT doc_id, lang, source FROM documents
    WHERE ((doc_id * {_HASH_MULT}) % {_HASH_MOD}) <
          (CASE WHEN lang = 'en' THEN 1.0
                WHEN lang = 'zh' THEN 0.5
                ELSE 0.25 END) * {_HASH_MOD}.0
    """,
)


# ---------------------------------------------------------------------------
# column profiling (data-quality summary)
# ---------------------------------------------------------------------------


def _profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row data-quality profile of `documents`: row count, null counts,
    distinct cardinalities, length extremes. A single partial-aggregable
    pass — the shape of every profiling/validation job at scale."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.sum(F.col("lang").isNull().cast("long")).alias("null_lang"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


register(
    "train_profile_documents",
    _profile,
    """
    SELECT count(*) AS n_rows,
           sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS null_text,
           sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS null_lang,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT source) AS n_sources,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    """,
)


# ---------------------------------------------------------------------------
# sliding-window document chunking (context-window preparation)
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 64, 48  # 16-token overlap


def _chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split every document into overlapping token windows (64 tokens,
    stride 48) — the chunking step before tokenization/embedding. Pure
    JVM expressions (split/sequence/explode/slice): no UDF, no shuffle at
    all — chunking is embarrassingly parallel and stays inside whole-stage
    codegen."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ts = docs.select("doc_id", F.split("text", " ").alias("ts")).withColumn(
        "nc",
        F.greatest(
            F.ceil((F.size("ts") - F.lit(_CHUNK - _STRIDE)) / F.lit(float(_STRIDE)))
            .cast("long"),
            F.lit(1).cast("long"),
        ),
    )
    return (
        ts.select(
            "doc_id",
            "ts",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("nc") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.array_join(
                F.slice("ts", F.col("chunk_idx") * _STRIDE + 1, F.lit(_CHUNK)), " "
            ).alias("chunk_text"),
            F.least(
                F.size("ts") - F.col("chunk_idx") * _STRIDE, F.lit(_CHUNK)
            ).cast("long").alias("chunk_tokens"),
        )
    )


register(
    "train_chunk_documents",
    _chunk_documents,
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
    SELECT doc_id, i AS chunk_idx,
           array_to_string(ts[(i*{_STRIDE}+1):(i*{_STRIDE}+{_CHUNK})], ' ') AS chunk_text,
           CAST(least(len(ts) - i*{_STRIDE}, {_CHUNK}) AS BIGINT) AS chunk_tokens
    FROM t, unnest(range(0, greatest(
        CAST(ceil((len(ts) - {_CHUNK - _STRIDE}) / {_STRIDE}.0) AS BIGINT), 1))) AS u(i)
    """,
)
