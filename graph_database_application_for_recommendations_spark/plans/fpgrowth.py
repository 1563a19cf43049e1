"""Frequent itemset mining over rating baskets — MLlib FP-Growth.

The classic market-basket surface (Han et al. 2000, public; MLlib
`pyspark.ml.fpm.FPGrowth`): each user's positively-rated books form a
basket; itemsets kept when their basket count reaches ``min_count``.
FP-Growth is EXACT — itemset frequencies are integer counts — so unlike
the float-iterative algorithms its output value-hash checks against a
SQL twin that recounts the same itemsets by self-joins (sizes 1-3
registered; the driver check caps size to keep the SQL polynomial while
the operator itself returns every size).

Scale notes: MLlib's parallel FP-Growth (PFP, Li et al. 2008) partitions
the conditional trees by item group — no driver-side tree; baskets are a
collect_set away from the ratings scan, and min_support bounds both tree
depth and output size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_itemsets(
    ratings: DataFrame,
    min_count: int = 3,
    min_rating: int = 6,
    max_size: int | None = 2,
) -> DataFrame:
    """(items, size, freq): frequent itemsets over per-user baskets of
    books rated >= ``min_rating``; items sorted within each set for a
    deterministic representation. Support is given as an ABSOLUTE count
    (``min_count`` baskets) because the interesting thresholds on sparse
    rating data are small integers; the fractional minSupport MLlib wants
    is derived as (min_count - 0.5)/n_baskets so its ceil() lands exactly
    on min_count regardless of float representation. ``max_size`` trims
    the output to the sizes the oracle recounts by self-joins (None =
    all sizes)."""
    from pyspark.ml.fpm import FPGrowth

    baskets = (
        ratings.filter(F.col("rating") >= min_rating)
        .groupBy("user_id")
        .agg(F.collect_set("isbn").alias("items"))
    )
    n_baskets = baskets.count()
    model = FPGrowth(
        itemsCol="items",
        minSupport=(min_count - 0.5) / max(n_baskets, 1),
        minConfidence=0.5,
    ).fit(baskets)
    out = model.freqItemsets.select(
        F.array_sort("items").alias("_items"),
        F.size("items").cast("int").alias("size"),
        F.col("freq").cast("long").alias("freq"),
    )
    if max_size is not None:
        out = out.filter(F.col("size") <= max_size)
    # scalar, driver-canonicalizable representation
    return out.select(
        F.concat_ws(",", "_items").alias("items"), "size", "freq"
    )


def association_rules_pairs(
    ratings: DataFrame,
    min_count: int = 3,
    min_rating: int = 6,
    min_confidence: float = 0.2,
) -> DataFrame:
    """(antecedent, consequent, freq_pair, confidence, lift): single-item
    association rules from the frequent pairs — confidence =
    n(a∧b)/n(a), lift = confidence / (n(b)/N). All integer-count
    arithmetic rounded 6dp, so the rule table value-hash checks against
    the SQL recount like the itemsets do."""
    from pyspark.ml.fpm import FPGrowth

    baskets = (
        ratings.filter(F.col("rating") >= min_rating)
        .groupBy("user_id")
        .agg(F.collect_set("isbn").alias("items"))
    )
    n_baskets = baskets.count()
    model = FPGrowth(
        itemsCol="items",
        minSupport=(min_count - 0.5) / max(n_baskets, 1),
        minConfidence=min_confidence,
    ).fit(baskets)
    singles = model.freqItemsets.filter(F.size("items") == 1).select(
        F.col("items")[0].alias("consequent"), F.col("freq").alias("_nb")
    )
    # frequent-singleton count is data-dependent (low min_count at corpus
    # scale = most of the item vocabulary) — count-gate like the iterative
    # drivers do; the fit already materialized freqItemsets, so the count
    # is a cheap post-fit scan
    from . import gate_node_vector_broadcast

    bc = gate_node_vector_broadcast(
        singles.count(), "frequent-singleton table", bytes_per_row=64
    )
    rules = (
        model.associationRules.filter(F.size("antecedent") == 1)
        .select(
            F.col("antecedent")[0].alias("antecedent"),
            F.col("consequent")[0].alias("consequent"),
            F.col("confidence"),
            F.col("support"),
        )
        .join(bc(singles), "consequent")
    )
    return rules.select(
        "antecedent",
        "consequent",
        F.round(F.col("support") * n_baskets, 0).cast("long").alias("freq_pair"),
        F.round("confidence", 6).alias("confidence"),
        F.round(
            F.col("confidence") / (F.col("_nb") / F.lit(float(n_baskets))), 6
        ).alias("lift"),
    )
