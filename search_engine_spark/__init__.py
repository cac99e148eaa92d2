"""search_engine_spark: a PySpark-native full-text indexing + BM25
query engine (SPIMI posting build, delta+varint compressed inverted
index, block-max WAND top-k), plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis).

Built from scratch against the behavioural surface of the reference
engine surveyed in SURVEY.md; all execution is Spark DataFrame / SQL
with Arrow-vectorized UDFs only where built-ins cannot express the
semantics.
"""

__version__ = "0.1.0"
