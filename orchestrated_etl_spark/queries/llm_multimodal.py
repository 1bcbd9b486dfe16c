"""Multimodal-column queries (north-star extension): opaque binary payloads
with typed metadata, JVM-side metadata extraction, and the Arrow-batched
mapInPandas decode path (deterministic fake decoder — see
functions/multimodal.py; the oracle reproduces it from md5 nibbles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orchestrated_etl_spark.functions import multimodal as M
from orchestrated_etl_spark.registry import register

# ---------------------------------------------------------------------------
# binary payload + JVM-side metadata (no Python anywhere)
# ---------------------------------------------------------------------------


def _binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return M.binary_metadata(docs, "doc_id", M.to_binary("text"))


register(
    "mm_binary_metadata",
    _binary_meta,
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
           md5(text) AS digest,
           lower(hex(encode(substr(text, 1, 4)))) AS magic_hex
    FROM documents
    """,
)

# ---------------------------------------------------------------------------
# mapInPandas decode stage (Arrow batches; fake decoder, real plumbing)
# ---------------------------------------------------------------------------


def _decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = docs.select("doc_id", M.to_binary("text").alias("media"))
    return M.decoded_metadata(payload, "doc_id", "media")


register(
    "mm_decode_stub",
    _decoded,
    """
    WITH d AS (
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               md5(text) AS digest
        FROM documents
    )
    SELECT doc_id,
           CAST(byte_len AS BIGINT) AS byte_len,
           digest,
           CAST(16 * (strpos('0123456789abcdef', substr(digest, 1, 1))) AS INTEGER) AS width,
           CAST(16 * (strpos('0123456789abcdef', substr(digest, 2, 1))) AS INTEGER) AS height,
           CAST(strpos('0123456789abcdef', substr(digest, 3, 1)) AS INTEGER) AS n_frames
    FROM d
    """,
)

# ---------------------------------------------------------------------------
# frame-sampling plumbing (sequence + explode over decoded n_frames)
# ---------------------------------------------------------------------------


def _frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = docs.select("doc_id", M.to_binary("text").alias("media"))
    decoded = M.decoded_metadata(payload, "doc_id", "media")
    return M.frame_sample(decoded, "doc_id", "n_frames", 4)


register(
    "mm_frame_sample",
    _frames,
    """
    WITH d AS (
        SELECT doc_id,
               strpos('0123456789abcdef', substr(md5(text), 3, 1)) AS n_frames
        FROM documents
    )
    SELECT doc_id, CAST(unnest(range(0, n_frames, 4)) AS INTEGER) AS frame_idx
    FROM d
    """,
)
