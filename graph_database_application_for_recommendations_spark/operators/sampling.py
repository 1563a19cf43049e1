"""Deterministic sampling operators for training-data pipelines.

Corpus construction needs samples that are (a) reproducible across runs
and engines — a seed + the row's key decides membership, never partition
layout or `rand()` — and (b) cheap at 100 TB: `hash_sample` is a pure
filter (no shuffle, pushed into the scan's residual), `stratified_sample`
is one window over the stratum key.

Hashing rides the same md5 primitive as the dedup suite
(functions/text.py), so every sample is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_hash32

HASH_BUCKETS = 1_000_000


def sample_bucket(key, seed: int = 0) -> F.Column:
    """Deterministic bucket in [0, 1e6) for a key column: md5-based, so
    cross-engine reproducible. (2^32 % 1e6 != 0 leaves a ~0.03% uniformity
    bias — irrelevant for sampling, and exactly mirrored by the oracle.)"""
    col = F.col(key) if isinstance(key, str) else key
    return F.pmod(md5_hash32(col.cast("string"), seed), F.lit(HASH_BUCKETS))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction`` of the bucket space.

    Membership depends only on (key, seed): stable across runs, engines,
    partitionings, and — critically for train/eval splits — across corpus
    versions (a document keeps its split when other documents change).
    Plain filter: no shuffle, no state, scales to any input.
    """
    return df.filter(sample_bucket(key_col, seed) < int(fraction * HASH_BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fraction: float,
    seed: int = 0,
) -> DataFrame:
    """Exact per-stratum fraction: rank rows inside each stratum by their
    deterministic hash (key as tie-break) and keep ceil(fraction·|stratum|).

    Unlike ``hash_sample`` the per-stratum counts are exact, at the cost
    of one window shuffle on the stratum key. Hash-ordered ranking keeps
    the choice of WHICH rows deterministic and unbiased by key order.
    """
    w = Window.partitionBy(strata_col).orderBy(
        sample_bucket(key_col, seed), F.col(key_col)
    )
    cnt = Window.partitionBy(strata_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(cnt))
        .filter(F.col("_rn") <= F.ceil(F.col("_n") * fraction))
        .drop("_rn", "_n")
    )
