"""Multinomial Naive-Bayes document classifier — the trainable
quality/language classifier slot of a training-data pipeline (the
deterministic stand-in for the fastText classifiers RefinedWeb/Dolma
use for quality and language filtering; the reference engine has no
counterpart — its language handling is a static per-doc column,
ReadFile.java:120-131).

Training and scoring are both plain DataFrame aggregations:

* ``train_nb``: per-(class, token) counts and per-class totals over
  the labeled split — two map-side-combining groupBys; the model is
  ``(label, tok, lp)`` with ``lp = log2(count+1)`` plus a tiny
  per-class table ``(label, log2_prior, log2_denom)`` where
  ``log2_denom = log2(total_c + V)`` (Laplace alpha=1).
* ``score_nb``: score(d,c) = log2_prior_c
  + sum_t tf_dt * log2(count_ct + 1) - len_d * log2_denom_c.
  Unseen (class, token) pairs contribute log2(0+1) = 0, so the
  matched-only INNER join on ``tok`` computes the sum exactly — the
  same join shape as the BM25 idf join (model table keyed by token),
  followed by one (doc, class) agg and a C-row class join.
* ``predict_nb``: argmax over classes on the half-up 1e-6 integer
  micro-grid (the surprisal-buckets trick) with a label tie-break.
  The grid makes cross-engine flips REQUIRE the float score sum to
  land within ulps of a .5 grid edge (partition-order double sums
  can differ by a few ulps, so such a landing could still shift the
  micro value by 1) — astronomically unlikely on real scores, not
  impossible; the same residual-risk class as the surprisal
  buckets.

Scale shape (100 TB): training cost is two shuffles over (class,
token) — the dictionary-build shape; the model is vocab x classes
rows (1e6 x k at web scale), joined on ``tok`` with NO forced
broadcast (AQE decides; a 1e6-row model broadcasts, a 1e9-row one
shuffle-joins).  Scoring adds one (doc_id, label) hash agg and a
C-row nested-loop join (C = #classes, O(1)).  Nothing is per-row
Python; everything is codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import shared_doc_tf

MICRO = 1_000_000


def train_nb(docs: DataFrame, label_col: str = "lang"
             ) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB with Laplace alpha=1 on ``docs``.

    Returns ``(model, classes)``: ``model(label, tok, lp)`` with
    ``lp = log2(cnt+1)``; ``classes(label, log2_prior, log2_denom)``.
    """
    labels = docs.select("doc_id", F.col(label_col).alias("label"))
    tf = shared_doc_tf(docs).join(labels, "doc_id")
    ctk = tf.groupBy("label", "tok").agg(F.sum("tf").alias("cnt"))
    vocab_v = tf.select("tok").distinct().count()
    n_train = docs.count()
    model = ctk.select(
        "label", "tok", F.log2(F.col("cnt") + 1).alias("lp"))
    classes = (
        labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_docs"))
        .join(ctk.groupBy("label").agg(F.sum("cnt").alias("tot")), "label")
        .select(
            "label",
            F.log2(F.col("n_docs") / F.lit(float(n_train))).alias("log2_prior"),
            F.log2(F.col("tot") + F.lit(vocab_v)).alias("log2_denom"),
        )
    )
    return model, classes


def score_nb(docs: DataFrame, model: DataFrame,
             classes: DataFrame) -> DataFrame:
    """Per-(doc, class) log2-likelihood on the micro grid:
    ``(doc_id, label, score_micro)`` for every class."""
    tf = shared_doc_tf(docs)
    matched = (
        tf.join(model, "tok")
        .groupBy("doc_id", "label")
        .agg(F.sum(F.col("tf") * F.col("lp")).alias("matched"))
    )
    # anchor on docs, not on the tf frame: a token-less document
    # (empty/whitespace text) still gets a row — len 0, score =
    # prior — instead of silently vanishing from the output
    lens = (
        docs.select("doc_id")
        .join(tf.groupBy("doc_id").agg(F.sum("tf").alias("len")),
              "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("len"), F.lit(0)).alias("len"))
    )
    pairs = lens.crossJoin(classes)  # C rows on the right — O(1)
    scored = (
        pairs.join(matched, ["doc_id", "label"], "left")
        .select(
            "doc_id", "label",
            F.floor(
                (F.col("log2_prior")
                 + F.coalesce(F.col("matched"), F.lit(0.0))
                 - F.col("len") * F.col("log2_denom")) * MICRO + 0.5
            ).cast("long").alias("score_micro"),
        )
    )
    return scored


def predict_nb(docs: DataFrame, model: DataFrame, classes: DataFrame,
               label_col: str = "lang") -> DataFrame:
    """Argmax prediction per doc with a deterministic (score, label)
    tie-break: ``(doc_id, pred, score, is_correct)`` where ``score``
    is the winning log2-likelihood back on the 1e-6 grid and
    ``is_correct`` compares against the doc's own ``label_col``."""
    scored = score_nb(docs, model, classes)
    pick = F.struct(F.col("score_micro"), F.col("label"))
    best = scored.groupBy("doc_id").agg(
        F.max_by("label", pick).alias("pred"),
        F.max("score_micro").alias("best_micro"),
    )
    truth = docs.select("doc_id", F.col(label_col).alias("truth"))
    return best.join(truth, "doc_id").select(
        "doc_id", "pred",
        (F.col("best_micro") / MICRO).alias("score"),
        (F.col("pred") == F.col("truth")).alias("is_correct"),
    )
