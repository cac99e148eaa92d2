"""Deduplication operators for training-data pipelines:

* exact (hash groupBy)
* MinHash + LSH (shingle -> minhash -> band -> bucket join)
* SimHash (bitwise majority over token hashes)
* n-gram Jaccard verification
* embedding-cosine near-dup

All built from portable primitives (md5, array ops) that DuckDB
evaluates identically, so every operator has an exact SQL oracle.
Hash choice: md5 hex strings — lexicographic min over hex == min over
the underlying 128-bit value, which makes MinHash portable without
engine-specific 64-bit hash functions.

Scale notes (100 TB):
- exact/minhash/simhash are single-shuffle groupBys with map-side
  partial aggregation; the LSH band join shuffles only (band, doc)
  pairs, never full texts.
- the pairwise Jaccard verifier is meant for LSH *candidates* (tiny);
  the all-pairs form used by the oracle check is test-scale only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import simple_tokens

DEFAULT_SHINGLE = 3
DEFAULT_MINHASHES = 8
DEFAULT_BAND_SIZE = 2


def shingles(col="text", n: int = DEFAULT_SHINGLE):
    """Distinct word n-gram shingles (1-based element_at, portable to
    DuckDB's 1-based list indexing).  Docs with fewer than ``n``
    tokens yield an empty array (Spark's ``sequence(1, 0)`` would
    descend, so the short case is guarded explicitly)."""
    toks = simple_tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(
        F.size(toks) >= n, F.array_distinct(grams)
    ).otherwise(F.array().cast("array<string>"))


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact dedup: md5(text) groups with >1 member."""
    return (
        docs.select("doc_id", F.md5(F.to_binary(F.col("text"), F.lit("utf-8"))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = DEFAULT_MINHASHES,
                       shingle_n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Per-doc MinHash signature: for seed s, min over shingles of
    md5(s || ':' || shingle) (hex-lexicographic min == numeric min)."""
    sh = shingles(n=shingle_n)

    def mh(seed: int):
        # NB: the lambda must take exactly one parameter — PySpark
        # passes the element index to a two-parameter callable, which
        # would silently clobber a `s=s` default argument
        prefix = f"{seed}:"
        return F.array_min(
            F.transform(sh, lambda x: F.md5(F.to_binary(F.concat(F.lit(prefix), x), F.lit("utf-8"))))
        ).alias(f"mh{seed}")

    return docs.select("doc_id", *[mh(s) for s in range(n_hashes)])


def lsh_candidate_pairs(docs: DataFrame, n_hashes: int = DEFAULT_MINHASHES,
                        band_size: int = DEFAULT_BAND_SIZE,
                        shingle_n: int = DEFAULT_SHINGLE) -> DataFrame:
    """LSH banding: docs sharing any band of ``band_size`` consecutive
    minhashes become a candidate pair (doc_a < doc_b, distinct)."""
    sigs = minhash_signatures(docs, n_hashes, shingle_n)
    n_bands = n_hashes // band_size
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.concat_ws("|", F.lit(str(b)), *[
                    F.col(f"mh{b * band_size + j}") for j in range(band_size)
                ]).alias(f"b{b}")
                for b in range(n_bands)
            ])
        ).alias("band"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8,
                        shingle_n: int = DEFAULT_SHINGLE) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold (shingle-join + count
    distinct).  At scale, feed LSH candidates instead of all pairs —
    this exact verifier is the second stage of minhash dedup."""
    sh = docs.select("doc_id", F.explode(shingles(n=shingle_n)).alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash over tokens: bit j of the fingerprint is the majority
    vote of bit j of md5(token) (j-th hex nibble's high bit), weighted
    by token multiplicity.  Portable: hex-char membership test."""
    tok = docs.select("doc_id", F.explode(simple_tokens()).alias("tok"))
    tok = tok.withColumn("h", F.md5(F.to_binary(F.col("tok"), F.lit("utf-8"))))
    bit_sum = [
        F.sum(
            F.when(F.substring("h", j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"),
                   F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"s{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sum)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_duplicates(docs: DataFrame, bits: int = 16) -> DataFrame:
    """Docs whose simhash collides exactly (bucket-level near-dup)."""
    sh = simhash(docs, bits)
    return (
        sh.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_doc"))
        .filter(F.col("n_docs") > 1)
    )


def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute-force all-pairs at test
    scale; the bucketed ANN path for production is in similarity.py)."""
    def norm(col):
        return F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")))

    e = embeddings.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.embedding"), F.col("b.embedding"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
