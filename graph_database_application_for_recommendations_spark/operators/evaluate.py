"""Binary-signal evaluation: calibration (reliability) tables and exact
ROC-AUC — the acceptance metrics for every quality/filter signal in the
suite (rule-based scores, classifier probabilities, LM scores).

A filter signal is only as good as its measured discrimination: CCNet,
GPT-3 and FineWeb all validate their quality scorers against a labeled
target domain before trusting a threshold. These two operators make that
validation a first-class, oracle-checkable query instead of a notebook
afterthought.

Scale notes (100 TB): both operators reduce the corpus to a bounded
aggregate first — ``calibration_table`` to ``n_bins`` rows,
``binary_auc`` to the distinct-score histogram (6dp-rounded scores, so
≤10^6 rows and in practice far fewer) — and the only window runs over
that Aggregate-bounded table (the sanctioned histogram pattern). Nothing
corpus-sized sorts in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def calibration_table(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """(bin, n, n_pos, mean_score, pos_rate): the reliability diagram as
    a table — rows where a well-calibrated signal has pos_rate tracking
    mean_score. bin = min(floor(score·n_bins), n_bins−1), so a score of
    exactly 1.0 lands in the top bin instead of its own."""
    lab = F.col(label_col).cast("long")
    bin_ = F.least(
        F.floor(F.col(score_col) * n_bins).cast("long"), F.lit(n_bins - 1)
    )
    return (
        scored.select(bin_.alias("bin"), F.col(score_col).alias("_s"), lab.alias("_y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
            F.round(F.avg("_s"), 6).alias("mean_score"),
            F.round(F.avg("_y"), 6).alias("pos_rate"),
        )
    )


def binary_auc(
    scored: DataFrame, score_col: str = "score", label_col: str = "label"
) -> DataFrame:
    """One row: (n_pos, n_neg, n_distinct_scores, auc) — exact ROC-AUC
    with the tie convention of the Mann-Whitney U midrank statistic
    (ties count 1/2), kept INTEGER until the single final division:

      2·U = Σ_s pos_s · (2·cum_neg_below(s) + neg_s)
      AUC = 2U / (2·n_pos·n_neg)

    computed on the distinct-score histogram, so the cumulative window
    is Aggregate-bounded, never corpus-wide."""
    lab = F.col(label_col).cast("long")
    hist = (
        scored.select(F.col(score_col).alias("s"), lab.alias("_y"))
        .groupBy("s")
        .agg(
            F.sum("_y").alias("_pos"),
            F.sum(F.lit(1) - F.col("_y")).alias("_neg"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn(
        "_cumneg", F.coalesce(F.sum("_neg").over(w), F.lit(0))
    )
    # CASE-guarded: with a single class present AUC is undefined, and the
    # unguarded division would abort the job under ANSI mode
    return ranked.agg(
        F.sum("_pos").alias("n_pos"),
        F.sum("_neg").alias("n_neg"),
        F.count(F.lit(1)).alias("n_distinct_scores"),
        F.when(
            (F.sum("_pos") > 0) & (F.sum("_neg") > 0),
            F.round(
                F.sum(F.col("_pos") * (2 * F.col("_cumneg") + F.col("_neg")))
                / (2.0 * F.sum("_pos") * F.sum("_neg")),
                6,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("auc"),
    )


def confusion_matrix(
    predicted: DataFrame,
    actual: DataFrame,
    key_col: str = "doc_id",
    pred_col: str = "pred",
    true_col: str = "label",
) -> DataFrame:
    """(true_label, pred_label, n, share_of_true): the multiclass
    evaluation face next to ``binary_auc`` — per true class, where its
    items actually land (share_of_true rows sum to 1 per class; the
    diagonal is per-class recall).

    Plan: one key equi-join, one |classes|² aggregate; the per-class
    normalizing window runs over that Aggregate-bounded table."""
    joined = predicted.select(
        F.col(key_col).alias("_k"), F.col(pred_col).alias("pred_label")
    ).join(
        actual.select(F.col(key_col).alias("_k"), F.col(true_col).alias("true_label")),
        "_k",
    )
    counts = joined.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("true_label")
    return counts.select(
        "true_label",
        "pred_label",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share_of_true"),
    )
