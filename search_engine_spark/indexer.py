"""Index build pipeline (Spark lifecycle equivalent of SURVEY.md §3.1).

Stages (each materialized => a resume checkpoint, tracked in the
``lineage`` table):

A. **tokenize**: pages -> ``postings_raw`` parquet, partitioned by
   ``bucket = pmod(xxhash64(term_key), n_term_buckets)``.  This is the
   SPIMI run store: the expensive Arrow-UDF tokenize pass happens
   exactly once; everything later is relational I/O over its output.
B. **doc stats**: groupBy(url) aggregate -> ``doc_stats`` with
   per-doc-shard local ids (``shard = pmod(xxhash64(url),
   n_doc_shards)``, ``local_id`` = rank of url inside the shard).
   Sharding by document is the explicit skew control: a head term's
   postings split into n_doc_shards bounded groups, so no single
   pack/score group ever exceeds the shard's doc count (the reference
   has no equivalent — single process; the north rule requires this).
C. **dictionary**: groupBy(term_key) -> (df, cf, idf=log2(N/df),
   display-case via bool_and(capital) — quirk Q7 made order-independent).
D. **pack**: per bucket-group job (resume unit): raw ⋈ doc_stats ⋈
   dictionary -> groupBy(term_key, shard) -> applyInPandas delta+varint
   pack with per-block max scores -> ``index`` parquet partitioned by
   bucket.

On an Iceberg-enabled cluster the writes become
``writeTo(tbl).partitionedBy(...)`` — same layout, same pruning.
"""

from __future__ import annotations

import json
import math
import os
import time
from collections.abc import Iterable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .codec import pack_postings
from .config import DEFAULT, EngineConfig
from .plans.tokenize import tokenize_pages

INDEX_SCHEMA = (
    "term_key string, bucket int, shard int, n int, doc_ids binary, "
    "tfs binary, lens binary, imps binary, block_last binary, block_max binary"
)


@dataclass
class IndexPaths:
    root: str

    @property
    def postings_raw(self) -> str:
        return os.path.join(self.root, "postings_raw")

    @property
    def doc_stats(self) -> str:
        return os.path.join(self.root, "doc_stats")

    @property
    def dictionary(self) -> str:
        return os.path.join(self.root, "dictionary")

    @property
    def index(self) -> str:
        return os.path.join(self.root, "index")

    @property
    def lineage(self) -> str:
        return os.path.join(self.root, "lineage")

    @property
    def meta(self) -> str:
        return os.path.join(self.root, "meta.json")


def _lineage_append(spark: SparkSession, paths: IndexPaths, rows: list[dict]) -> None:
    df = spark.createDataFrame(
        [(r["stage"], str(r["key"]), int(r.get("docs", 0)), int(r.get("terms", 0)),
          int(r.get("bytes", 0)), float(r.get("seconds", 0.0)), r.get("status", "done"))
         for r in rows],
        schema="stage string, key string, docs long, terms long, bytes long, "
               "seconds double, status string",
    )
    df.coalesce(1).write.mode("append").parquet(paths.lineage)


def _lineage_done(spark: SparkSession, paths: IndexPaths) -> set[tuple[str, str]]:
    if not os.path.isdir(paths.lineage):
        return set()
    try:
        rows = spark.read.parquet(paths.lineage).filter(F.col("status") == "done").collect()
    except Exception:
        return set()
    return {(r["stage"], r["key"]) for r in rows}


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def with_doc_shard(df: DataFrame, cfg: EngineConfig, col: str = "url") -> DataFrame:
    return df.withColumn("shard", F.pmod(F.xxhash64(F.col(col)), F.lit(cfg.n_doc_shards)).cast("int"))


def term_bucket(cfg: EngineConfig, col: str = "term_key"):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(cfg.n_term_buckets)).cast("int")


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: EngineConfig = DEFAULT,
    resume: bool = True,
) -> dict:
    """Run the full build.  ``resume=True`` skips stages/bucket-groups
    whose lineage rows are already 'done' (kill-safe, zero recompute of
    completed shards)."""
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    done = _lineage_done(spark, paths) if resume else set()

    # ---- stage A: tokenize -> postings_raw (partitioned by term bucket)
    if ("tokenize", "all") not in done:
        t0 = time.time()
        tokenized = tokenize_pages(pages, cfg).withColumn("bucket", term_bucket(cfg))
        (tokenized.write.mode("overwrite").partitionBy("bucket").parquet(paths.postings_raw))
        _lineage_append(spark, paths, [{
            "stage": "tokenize", "key": "all",
            "bytes": _dir_bytes(paths.postings_raw), "seconds": time.time() - t0,
        }])

    raw = spark.read.parquet(paths.postings_raw)

    # ---- stage B: doc_stats + per-shard local ids
    if ("doc_stats", "all") not in done:
        t0 = time.time()
        stats = (
            raw.groupBy("url")
            .agg(
                F.sum("tf").alias("length"),
                F.max("tf").alias("max_tf"),
                F.count(F.lit(1)).alias("unique_terms"),
            )
        )
        stats = with_doc_shard(stats, cfg)
        w = Window.partitionBy("shard").orderBy("url")
        stats = stats.withColumn("local_id", F.row_number().over(w).cast("long"))
        stats.write.mode("overwrite").partitionBy("shard").parquet(paths.doc_stats)
        _lineage_append(spark, paths, [{
            "stage": "doc_stats", "key": "all",
            "docs": spark.read.parquet(paths.doc_stats).count(),
            "seconds": time.time() - t0,
        }])

    doc_stats = spark.read.parquet(paths.doc_stats)
    n_docs = doc_stats.count()
    avgdl = doc_stats.agg(F.avg("length")).first()[0] or 0.0

    # ---- stage C: dictionary (df, cf, idf, display case)
    if ("dictionary", "all") not in done:
        t0 = time.time()
        dictionary = (
            raw.groupBy("term_key")
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.sum("tf").alias("cf"),
                F.bool_and("capital").alias("capital"),
                F.min(F.when(~F.col("capital"), F.col("term"))).alias("_lo"),
                F.min("term").alias("_any"),
            )
            .withColumn("display", F.coalesce(F.col("_lo"), F.col("_any")))
            .drop("_lo", "_any")
            .withColumn("idf", F.log2(F.lit(float(n_docs)) / F.col("df")))
            .withColumn("bucket", term_bucket(cfg))
        )
        (dictionary.repartition("bucket").sortWithinPartitions("term_key")
         .write.mode("overwrite").partitionBy("bucket").parquet(paths.dictionary))
        _lineage_append(spark, paths, [{
            "stage": "dictionary", "key": "all",
            "terms": spark.read.parquet(paths.dictionary).count(),
            "seconds": time.time() - t0,
        }])

    meta = {
        "n_docs": int(n_docs),
        "avgdl": float(avgdl),
        "k1": cfg.k1,
        "b": cfg.b,
        "blend_bm25": cfg.blend_bm25,
        "blend_bonus": cfg.blend_bonus,
        "stem": cfg.stem,
        "n_doc_shards": cfg.n_doc_shards,
        "n_term_buckets": cfg.n_term_buckets,
        "block_size": cfg.block_size,
    }
    with open(paths.meta, "w") as fh:
        json.dump(meta, fh)

    # ---- stage D: pack, one job per bucket group (resume granularity)
    dictionary = spark.read.parquet(paths.dictionary)
    doc_map = doc_stats.select("url", "shard", "local_id", "length")
    k1, b, bs = cfg.k1, cfg.b, cfg.block_size
    blend_a, blend_b = cfg.blend_bm25, cfg.blend_bonus
    avgdl_f = float(avgdl)

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("local_id")
        row = pack_postings(
            pdf["local_id"].to_numpy(), pdf["tf"].to_numpy(),
            pdf["length"].to_numpy(), pdf["important"].to_numpy(),
            idf=float(pdf["idf"].iloc[0]), k1=k1, b=b, avgdl=avgdl_f,
            blend_bm25=blend_a, blend_bonus=blend_b, block_size=bs,
        )
        return pd.DataFrame([{
            "term_key": pdf["term_key"].iloc[0],
            "bucket": int(pdf["bucket"].iloc[0]),
            "shard": int(pdf["shard"].iloc[0]),
            "n": row["n"],
            "doc_ids": row["doc_ids"], "tfs": row["tfs"], "lens": row["lens"],
            "imps": row["imps"], "block_last": row["block_last"],
            "block_max": row["block_max"],
        }])

    groups = _bucket_groups(cfg)
    for gid, buckets in enumerate(groups):
        if ("pack", str(gid)) in done:
            continue
        t0 = time.time()
        # a killed job may have left partial files for this group's
        # buckets — clear them so the re-run is idempotent
        import shutil

        for bkt in buckets:
            shutil.rmtree(os.path.join(paths.index, f"bucket={bkt}"), ignore_errors=True)
        part = (
            raw.filter(F.col("bucket").isin(buckets))
            .join(doc_map, "url")
            .join(dictionary.select("term_key", "idf"), "term_key")
            .select("term_key", "bucket", "shard", "local_id", "tf", "length",
                    "important", "idf")
        )
        packed = part.groupBy("term_key", "shard").applyInPandas(pack_group, schema=INDEX_SCHEMA)
        packed.write.mode("append").partitionBy("bucket").parquet(paths.index)
        _lineage_append(spark, paths, [{
            "stage": "pack", "key": str(gid), "seconds": time.time() - t0,
        }])

    _lineage_append(spark, paths, [{"stage": "build", "key": "all", "docs": n_docs}])
    return meta


def _bucket_groups(cfg: EngineConfig) -> list[list[int]]:
    ng = min(cfg.n_bucket_groups, cfg.n_term_buckets)
    return [
        [b for b in range(cfg.n_term_buckets) if b % ng == g]
        for g in range(ng)
    ]
