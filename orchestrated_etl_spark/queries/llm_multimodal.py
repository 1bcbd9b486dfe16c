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

# ---------------------------------------------------------------------------
# resize stub (aspect-preserving integer fit into 256×256)
# ---------------------------------------------------------------------------


def _resized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = docs.select("doc_id", M.to_binary("text").alias("media"))
    return M.resized_metadata(payload, "doc_id", "media", target=256)


register(
    "mm_resize_stub",
    _resized,
    """
    WITH d AS (
        SELECT doc_id, md5(text) AS digest FROM documents
    ),
    dims AS (
        SELECT doc_id,
               16 * strpos('0123456789abcdef', substr(digest, 1, 1)) AS w,
               16 * strpos('0123456789abcdef', substr(digest, 2, 1)) AS h
        FROM d
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(CASE WHEN greatest(w, h) > 256
                     THEN (w * 256) // greatest(w, h) ELSE w END AS INTEGER) AS out_w,
           CAST(CASE WHEN greatest(w, h) > 256
                     THEN (h * 256) // greatest(w, h) ELSE h END AS INTEGER) AS out_h,
           CAST(CASE WHEN greatest(w, h) > 256 THEN 1 ELSE 0 END AS INTEGER) AS resized
    FROM dims
    """,
)

# ---------------------------------------------------------------------------
# feature-extract stub → similarity search (the multimodal→ANN composition)
# ---------------------------------------------------------------------------


def _fake_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media payloads → (stub) embeddings → exact cosine top-3 for every
    50th doc: the full multimodal feature-extraction → similarity-search
    composition with the model stubbed and every other part real."""
    from orchestrated_etl_spark.functions import similarity as SIM

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = docs.select("doc_id", M.to_binary("text").alias("media"))
    emb = M.fake_embeddings(payload, "doc_id", "media", dim=8)
    queries = emb.filter(F.col("doc_id") % 50 == 0)
    return SIM.brute_force_topk(queries, emb, "doc_id", "embedding", 3)


register(
    "mm_fake_embed_topk",
    _fake_embed_topk,
    """
    WITH e AS (
        SELECT doc_id,
               list_transform(range(1, 9),
                   j -> (strpos('0123456789abcdef',
                                substr(md5(text), CAST(j AS INTEGER), 1)) - 1)
                        / 15.0) AS embedding
        FROM documents
    ),
    scored AS (
        SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
               round(list_dot_product(q.embedding, c.embedding)
                     / (sqrt(list_dot_product(q.embedding, q.embedding))
                        * sqrt(list_dot_product(c.embedding, c.embedding))), 6)
                   AS cosine
        FROM e q JOIN e c ON q.doc_id != c.doc_id
        WHERE q.doc_id % 50 = 0
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
    """,
)
