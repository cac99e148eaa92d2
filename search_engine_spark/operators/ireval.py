"""IR evaluation operator — the trec_eval step that closes the
reference's TREC loop (topic source -> run sink -> *metrics*):
given a run table and a qrels table, compute per-query precision@k,
average precision, and NDCG@k, distributed.

Scale shape: one left join of the run (|queries| * k rows — tiny next
to any corpus) against qrels on (qid, url), then per-qid window sums
over at most k rows each.  Every expression is codegen; the window
partitions by qid so there is no global sort.

Metric definitions (binary relevance, standard trec_eval forms):
- P@k        = (# relevant in top-k) / k
- AP         = (1/R) * sum_{r<=k, rel(r)=1} P(r), with R = TOTAL
               relevant for the query in the qrels — trec_eval's MAP
               normalization (unretrieved relevant docs contribute 0,
               so a shallow run over a deep qrels scores low, as it
               should; 0 relevant -> AP = 0)
- NDCG@k     = DCG@k / IDCG@k, DCG = sum rel(r) / log2(r + 1),
               IDCG over the first min(R, k) ranks (0 relevant -> 0)

Everything is rounded at 6dp on a value grid far coarser than 1e-6,
so the DuckDB twin matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ir_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query IR metrics.

    ``run``:   (qid, rank, url) — rank 1-based, <= k rows per qid kept
               (extra ranks are filtered).
    ``qrels``: (qid, url, rel) — rel > 0 means relevant; absent pairs
               are irrelevant.

    Returns (qid, n_ret, n_rel, n_rel_ret, p_at_k, ap, ndcg) — one row
    per qid present in the run."""
    rel = (
        qrels.filter(F.col("rel") > 0)
        .select("qid", "url", F.lit(1).alias("is_rel"))
        .distinct()
    )
    # R = total relevant per query (from qrels, independent of the run)
    totals = rel.groupBy("qid").agg(F.count(F.lit(1)).alias("n_rel"))

    j = (
        run.filter(F.col("rank") <= k)
        .join(F.broadcast(rel), ["qid", "url"], "left")
        .withColumn("is_rel", F.coalesce(F.col("is_rel"), F.lit(0)))
    )
    w = Window.partitionBy("qid").orderBy("rank")
    j = j.withColumn("cum_rel", F.sum("is_rel").over(w))
    j = j.withColumn("prec_at_r", F.col("cum_rel") / F.col("rank"))
    j = j.withColumn("gain", F.col("is_rel") / F.log2(F.col("rank") + 1))

    per = j.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_ret"),
        F.sum("is_rel").cast("long").alias("n_rel_ret"),
        F.sum(F.col("prec_at_r") * F.col("is_rel")).alias("ap_num"),
        F.sum("gain").alias("dcg"),
    )
    per = per.join(F.broadcast(totals), "qid", "left").withColumn(
        "n_rel", F.coalesce(F.col("n_rel"), F.lit(0)).cast("long")
    )
    # IDCG@k = sum_{i=1..min(R,k)} 1/log2(i+1), as a literal lookup
    # array (k is small and fixed at plan time)
    idcg_vals = []
    acc = 0.0
    import math

    for i in range(1, k + 1):
        acc += 1.0 / math.log2(i + 1)
        idcg_vals.append(acc)
    idcg = F.when(
        F.col("n_rel") > 0,
        F.element_at(
            F.array(*[F.lit(v) for v in idcg_vals]),
            F.least(F.col("n_rel"), F.lit(k)).cast("int"),
        ),
    )
    return per.select(
        "qid",
        F.col("n_ret").cast("long").alias("n_ret"),
        "n_rel",
        "n_rel_ret",
        F.round(F.col("n_rel_ret") / F.lit(k), 6).alias("p_at_k"),
        F.when(F.col("n_rel") > 0,
               F.round(F.col("ap_num") / F.col("n_rel"), 6))
        .otherwise(F.lit(0.0)).alias("ap"),
        F.when(F.col("n_rel") > 0, F.round(F.col("dcg") / idcg, 6))
        .otherwise(F.lit(0.0)).alias("ndcg"),
    )


def mean_metrics(per_query: DataFrame) -> DataFrame:
    """Run-level roll-up of :func:`ir_metrics` (MAP, mean NDCG, mean
    P@k) — the one-row summary a leaderboard reports."""
    return per_query.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("p_at_k"), 6).alias("mean_p_at_k"),
        F.round(F.avg("ap"), 6).alias("map"),
        F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
    )
