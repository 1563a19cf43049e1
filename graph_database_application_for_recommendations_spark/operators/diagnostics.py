"""Data-distribution diagnostics — the profiling pass you run *before*
choosing a join strategy at 100 TB.

``skew_report`` quantifies key skew (the decision input for salting /
fanout caps / AQE tuning on operators like the co-rating self-join);
``table_profile`` gives per-column null/distinct rates for quick data
quality triage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key_cols: list[str], top_n: int = 10) -> DataFrame:
    """Top-N heaviest keys with their share of all rows.

    (key..., n, share): share = n / total, rounded 6dp; ties broken by key
    for determinism. A top key with share >> 1/partitions is the signal to
    salt or cap that key's join.
    """
    from ..plans import materialize

    # one upstream execution: pin the per-key aggregate, then both the
    # total (= sum of counts) and the top-N read the pinned table — the
    # previous df.count() was a second full scan of the raw input
    counts = materialize(df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n")))
    total = counts.agg(F.sum("n")).first()[0] or 0
    return (
        counts.withColumn("share", F.round(F.col("n") / F.lit(float(total)), 6))
        .orderBy(F.desc("n"), *[F.asc(c) for c in key_cols])
        .limit(top_n)
    )


def table_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct): per-column profile in a
    single pass per metric family (exact distincts; swap for
    approx_count_distinct at extreme scale)."""
    cols = cols or df.columns
    total = df.count()
    rows = []
    agg_exprs = []
    for c in cols:
        agg_exprs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"))
        agg_exprs.append(F.countDistinct(c).alias(f"_dist_{c}"))
    stats = df.agg(*agg_exprs).collect()[0]
    spark = df.sparkSession
    rows = [(c, total, stats[f"_null_{c}"], stats[f"_dist_{c}"]) for c in cols]
    return spark.createDataFrame(rows, "column STRING, n_rows LONG, n_nulls LONG, n_distinct LONG")
