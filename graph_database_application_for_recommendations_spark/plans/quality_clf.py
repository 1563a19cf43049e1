"""Learned quality filter — the fastText/CCNet-style classifier step of a
training-data pipeline (Wenzek et al. 2020 "CCNet", public; the GPT-3
data recipe's quality classifier is the same construction): hash token
features, train a logistic regression against a high-quality target
domain, score every document, keep the high-scorers.

Spark-native: tokenization stays in the JVM (functions/text.py tokens),
features are MLlib ``HashingTF`` (MurmurHash, deterministic), the model
is MLlib ``LogisticRegression`` — block-partitioned L-BFGS, the canonical
distributed trainer. Scores are float-iteration dependent (treeAggregate
order), so the registered query is rows-only with an earned invariant
twin (q_corpus_quality_clf_invariants): corpus/label counts are
SQL-anchored, train accuracy must beat the majority-class baseline (a
broken trainer cannot earn TRUE), scores must be valid probabilities,
and the output must stay 1:1 with the corpus.

Scale notes (100 TB): HashingTF is per-row (no vocab fit, no shuffle);
L-BFGS is one treeAggregate per iteration over hash-partitioned rows —
the standard MLlib scale path. Scoring is a broadcast of the (tiny)
coefficient vector. Nothing corpus-sized funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def quality_classifier_scores(
    documents: DataFrame,
    positive: Column,
    num_features: int = 4096,
    max_iter: int = 10,
    reg: float = 0.01,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, label, score): P(high-quality) per document from a
    logistic regression trained on ``positive`` as the target-domain
    label over hashed token-count features."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    base = documents.select(
        F.col(id_col).alias("doc_id"),
        positive.cast("double").alias("label"),
        tokens(F.col(text_col)).alias("toks"),
    )
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=num_features)
    feats = tf.transform(base)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        maxIter=max_iter,
        regParam=reg,
        standardization=True,
    )
    model = lr.fit(feats)
    return model.transform(feats).select(
        "doc_id",
        F.col("label").cast("int").alias("label"),
        F.round(vector_to_array("probability")[1], 6).alias("score"),
    )


# The invariants face (counts SQL-anchored, accuracy-beats-majority bar)
# lives in registry._quality_clf_invariants_q, computed from the memoized
# scores so the twin never re-fits the model.
