"""orchestrated_etl_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline ``ryantanzr/Orchestrated-ETL`` (see SURVEY.md), re-expressed
Spark-first: lazy DataFrame plans optimized by Catalyst, shuffle-aware
operators designed for a 1000-executor / 100 TB deployment, and a set of
large-scale training-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal columns) the reference does not have.

Layout:
  session.py    SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
  schemas.py    explicit StructType schemas for every fixture table
  sources/      readers (parquet/csv/json catalog) + sink writers
  operators/    relational operators (standardise, enrich, joins, windows,
                setops, rollup, datetime, json, topk)
  functions/    LLM-data-pipeline functions (text, dedup, similarity,
                multimodal)
  plans/        Pipeline abstraction (source → transforms → sink, O1-O4)
  streaming/    Structured Streaming analogues (windows, watermark, dedup)
"""

__version__ = "0.1.0"
