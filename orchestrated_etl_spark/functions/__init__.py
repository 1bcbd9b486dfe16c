"""LLM-data-pipeline functions: text analysis, dedup, similarity search,
multimodal columns. All column builders are JVM-side expressions (no
row-at-a-time Python); the only Python boundary is the Arrow-batched
mapInPandas decode path in multimodal.py."""
