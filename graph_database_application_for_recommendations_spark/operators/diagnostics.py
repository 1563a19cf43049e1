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

from ..functions.hints import gated_broadcast


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


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """One row (k, n_rows, n_groups, n_risky_groups, n_risky_rows,
    risky_fraction): the k-anonymity audit (Sweeney 2002) over a set of
    quasi-identifier columns — a combination shared by fewer than ``k``
    rows re-identifies those rows, which is what a training-data release
    must check BEFORE the PII scrubber is trusted (the column-combination
    risk the per-value scrubber cannot see).

    risky_fraction = n_risky_rows / n_rows (6dp). NULL quasi-values form
    their own group on both engines. Plan: one |distinct combinations|
    aggregate, then a scalar aggregate over it."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    return groups.agg(
        F.lit(int(k)).alias("k"),
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0)).alias("n_risky_groups"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0)).alias("n_risky_rows"),
        F.round(
            F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0)) / F.sum("_n"), 6
        ).alias("risky_fraction"),
    )


def corpus_datasheet(
    documents: DataFrame,
    short_doc_tokens: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """One row — the release datasheet (Gebru et al. 2021, "Datasheets
    for Datasets") a corpus ships with: composition, concentration and
    redundancy at a glance.

    (n_docs, n_sources, n_langs, n_tokens, mean_doc_tokens,
     dup_doc_fraction, short_doc_fraction, top_source_share,
     lang_entropy_bits)

    - dup_doc_fraction = 1 − |distinct canonical fingerprints| / n_docs
      (what fingerprint dedup would delete — the suite's canonical
      token-set fingerprint, not raw md5(text), so whitespace variants
      count as the duplicates they are);
    - short_doc_fraction: docs under ``short_doc_tokens`` whitespace
      tokens;
    - top_source_share: the concentration number mixture design starts
      from;
    - lang_entropy_bits: Shannon entropy of the language distribution —
      0 = monolingual, log2(|langs|) = balanced.

    All counts exact integers; the entropy sums |langs| doubles. One
    corpus scan into bounded aggregates — the datasheet costs one pass."""
    from ..functions.text import canonical_fingerprint, tokens

    base = documents.select(
        F.col(id_col).alias("doc_id"),
        canonical_fingerprint(F.col(text_col)).alias("_fp"),
        F.size(tokens(F.col(text_col))).cast("long").alias("_nt"),
        F.col(source_col).alias("_src"),
        F.col(lang_col).alias("_lang"),
    )
    main = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("_src").alias("n_sources"),
        F.countDistinct("_lang").alias("n_langs"),
        F.sum("_nt").alias("n_tokens"),
        F.countDistinct("_fp").alias("_n_fp"),
        F.sum(F.when(F.col("_nt") < short_doc_tokens, 1).otherwise(0)).alias("_short"),
    )
    src_top = (
        base.groupBy("_src")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.max("_c").alias("_top_src"))
    )
    lang_h = (
        base.groupBy("_lang")
        .agg(F.count(F.lit(1)).alias("_c"))
        .crossJoin(gated_broadcast(base.agg(F.count(F.lit(1)).alias("_n")), "1-row global aggregate"))
        .agg(
            F.round(
                -F.sum(
                    (F.col("_c") / F.col("_n"))
                    * F.log2(F.col("_c") / F.col("_n"))
                ),
                6,
            ).alias("lang_entropy_bits")
        )
    )
    return (
        main.crossJoin(gated_broadcast(src_top, "1-row global aggregate"))
        .crossJoin(gated_broadcast(lang_h, "1-row global aggregate"))
        .select(
            "n_docs",
            "n_sources",
            "n_langs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("n_docs"), 6).alias("mean_doc_tokens"),
            F.round(F.lit(1.0) - F.col("_n_fp") / F.col("n_docs"), 6).alias(
                "dup_doc_fraction"
            ),
            F.round(F.col("_short") / F.col("n_docs"), 6).alias("short_doc_fraction"),
            F.round(F.col("_top_src") / F.col("n_docs"), 6).alias("top_source_share"),
            "lang_entropy_bits",
        )
    )


def join_size_audit(
    left: DataFrame, right: DataFrame, key_cols: list[str], top_n: int = 5
) -> DataFrame:
    """One row (n_left, n_right, join_rows, max_key_rows, top_keys_share):
    the EXACT output size of ``left ⋈ right`` on ``key_cols`` computed
    from the two key histograms — Σ_k c_left(k)·c_right(k) — without
    materializing the join. The pre-flight check before any fact-fact
    join: the skew decision (``skew_report`` says WHICH keys; this says
    HOW BAD), the broadcast/salt/cap decision, and the "will this join
    OOM the cluster" answer, all for the price of two aggregates and a
    histogram-sized equi-join.

    max_key_rows = the largest single key's contribution (one task's
    worth under hash partitioning — the straggler bound);
    top_keys_share = the top-``top_n`` keys' share of the join output.
    For a self-join pass the same frame twice."""
    lk = left.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_cl"))
    rk = right.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_cr"))
    contrib = lk.join(rk, key_cols).select(
        (F.col("_cl") * F.col("_cr")).alias("_rows")
    )
    # top-N via orderBy+limit (TakeOrdered — distributed), NOT a global
    # row_number window: with corpus-unique keys the contribution table
    # is corpus-sized and a global rank would single-task sort it.
    # Boundary ties are value-equal, so the top-N SUM is deterministic.
    top = contrib.orderBy(F.desc("_rows")).limit(int(top_n)).agg(
        F.sum("_rows").alias("_top")
    )
    totals = contrib.agg(
        F.sum("_rows").alias("join_rows"),
        F.max("_rows").alias("max_key_rows"),
    ).crossJoin(gated_broadcast(top, "1-row aggregate over an orderBy+limit top-N"))
    sides = left.agg(F.count(F.lit(1)).alias("n_left")).crossJoin(
        gated_broadcast(right.agg(F.count(F.lit(1)).alias("n_right")), "1-row global aggregate")
    )
    return sides.crossJoin(gated_broadcast(totals, "1-row global aggregate")).select(
        "n_left",
        "n_right",
        F.coalesce("join_rows", F.lit(0)).alias("join_rows"),
        F.coalesce("max_key_rows", F.lit(0)).alias("max_key_rows"),
        F.when(
            F.col("join_rows") > 0,
            F.round(F.col("_top") / F.col("join_rows"), 6),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("top_keys_share"),
    )
