"""Document embeddings by feature hashing (the "hashing trick",
Weinberger et al. 2009) — the deterministic, model-free docs→vectors
link of the pipeline: text -> sparse tf -> signed-hash projection into
a fixed dim -> dense vector ready for the ANN / embedding-dedup
operators (similarity.py, dedup.embedding_dup_pairs).

Portable construction (exact DuckDB twin, no ML runtime):
  dim(tok)  = first 8 md5 hex chars of 'd:'||tok  as int, mod n_dims
  sign(tok) = +1 if first hex char of 'r:'||tok is in 0..7 else -1
  v[d]      = sum over tokens with dim d of sign * tf
Values are integers (signed tf sums), so the vector itself is
hash-exact; the l2 norm is the only float and is rounded 6dp.

Scale shape: explode + one (doc, dim) hash agg + one per-doc agg that
assembles the dense array from (dim, value) structs — two map-side-
combining shuffles, no UDF, no driver loop.  At 100 TB this is the
standard pre-embedding featurizer run before a learned encoder exists
(or as its cheap fallback), and its output feeds the bucketed ANN
layouts directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import shared_doc_tf

DEFAULT_DIMS = 64


def _dim_col(n_dims: int):
    h = F.md5(F.to_binary(F.concat(F.lit("d:"), F.col("tok")), F.lit("utf-8")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_dims).cast("int")


def _sign_col():
    h = F.md5(F.to_binary(F.concat(F.lit("r:"), F.col("tok")), F.lit("utf-8")))
    return F.when(F.substring(h, 1, 1).isin(*"01234567"), F.lit(1)).otherwise(F.lit(-1))


def hash_embed(docs: DataFrame, n_dims: int = DEFAULT_DIMS) -> DataFrame:
    """(doc_id, embedding: array<double>[n_dims]) — dense signed-tf
    feature-hash vectors.  Docs with no tokens are absent (they have
    no vector, exactly like the shingle-less docs in dedup)."""
    tf = shared_doc_tf(docs)
    cells = (
        tf.select("doc_id", _dim_col(n_dims).alias("dim"),
                  (_sign_col() * F.col("tf")).cast("long").alias("v"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("v").alias("v"))
    )
    # assemble the dense array: collect this doc's (dim, v) pairs into
    # a map, then read every index through it (missing -> 0.0)
    m = F.map_from_entries(F.collect_list(F.struct("dim", "v")))
    return (
        cells.groupBy("doc_id")
        .agg(m.alias("m"))
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_dims - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("m"), i.cast("int")), F.lit(0).cast("long")
                ).cast("double"),
            ).alias("embedding"),
        )
    )


def embed_summary(docs: DataFrame, n_dims: int = DEFAULT_DIMS) -> DataFrame:
    """Hash-exact scalar projection of :func:`hash_embed` for oracle
    comparison and quick audits: nnz, integer checksum
    sum((d+1) * v[d]), and the rounded l2 norm."""
    e = hash_embed(docs, n_dims)
    idx = F.sequence(F.lit(0), F.lit(n_dims - 1))
    nnz = F.aggregate(
        F.col("embedding"), F.lit(0).cast("long"),
        lambda acc, x: acc + F.when(x != 0, 1).otherwise(0),
    )
    checksum = F.aggregate(
        F.zip_with(idx, F.col("embedding"), lambda i, x: (i + 1).cast("double") * x),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    l2 = F.sqrt(F.aggregate(F.col("embedding"), F.lit(0.0),
                            lambda acc, x: acc + x * x))
    return e.select(
        "doc_id",
        nnz.alias("nnz"),
        checksum.cast("long").alias("checksum"),
        F.round(l2, 6).alias("l2"),
    )
