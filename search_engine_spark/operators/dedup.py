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


def shingle_rows(docs: DataFrame, col: str = "text",
                 n: int = DEFAULT_SHINGLE) -> DataFrame:
    """Distinct (doc_id, s) shingle rows, built relationally:
    posexplode the token array once, then window-lead to form the
    n-gram.

    Why not an array expression (transform over sequence with
    element_at)?  Catalyst collapses the projection and re-evaluates
    the tokenizer split inside EVERY ``element_at`` of the shingle
    lambda — O(tokens^2) re-splits per document (measured 20x+ wall
    slowdown).  Here the tokenizer runs exactly once per doc (explode
    generator), and the window/distinct shuffles parallelize the rest
    regardless of input file splits."""
    t = docs.select("doc_id", F.posexplode(simple_tokens(col)).alias("pos", "tok"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, n)]
    sh = t.select(
        "doc_id",
        F.concat_ws(" ", *parts).alias("s"),
        F.lead("tok", n - 1).over(w).isNotNull().alias("complete"),
    )
    return sh.filter("complete").select("doc_id", "s").distinct()


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
    md5(s || ':' || shingle) (hex-lexicographic min == numeric min).

    Shape: explode shingles once, then ONE hash-agg computing all
    n_hashes mins (min over duplicates == min over distinct, so no
    pre-dedup needed).  An earlier nested-higher-order-function
    version (array_min over transform, per signature column) blew
    past codegen limits and fell back to interpreted evaluation —
    ~60x slower; the explode+groupBy form stays in whole-stage
    codegen and is one shuffle.  Docs with fewer than ``shingle_n``
    tokens have no shingles and drop out (they cannot be LSH
    candidates anyway)."""
    ex = shingle_rows(docs, n=shingle_n)
    aggs = [
        F.min(
            F.md5(F.to_binary(F.concat(F.lit(f"{s}:"), F.col("s")), F.lit("utf-8")))
        ).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


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
    sh = shingle_rows(docs, n=shingle_n)
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


def near_dup_pairs(docs: DataFrame, threshold: float = 0.8,
                   n_hashes: int = DEFAULT_MINHASHES,
                   band_size: int = DEFAULT_BAND_SIZE,
                   shingle_n: int = DEFAULT_SHINGLE) -> DataFrame:
    """The full scale-path dedup pipeline: MinHash+LSH candidate
    generation followed by exact n-gram-Jaccard verification of the
    candidates ONLY.  This is the 100 TB form — the all-pairs
    verifier (``ngram_jaccard_pairs``) exists for oracle checks at
    test scale, but its shingle self-join is quadratic in docs per
    shingle; here the expensive join is restricted to the LSH
    candidate set."""
    cand = lsh_candidate_pairs(docs, n_hashes, band_size, shingle_n)
    sh = shingle_rows(docs, n=shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("s"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("s"))
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(za, "doc_a").join(zb, "doc_b")
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
