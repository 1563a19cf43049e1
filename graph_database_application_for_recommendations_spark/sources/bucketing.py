"""Bucketed table storage — co-located joins without a shuffle.

At 100 TB the dominant serving-join cost is shuffling the ratings fact on
its join key. Bucketing materializes that shuffle once at write time:
both sides bucketed by the same key into the same bucket count join with
zero Exchange (verified by plan assertion in tests/test_plans.py).

Bucketing requires the session catalog (``saveAsTable``); tables land in
``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (optionally sorted) catalog table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout — equality/range filters on
    the partition columns prune directories before any file is opened
    (verified by `PartitionFilters` plan assertion in tests/test_plans.py).
    The at-scale layout for point-lookup-heavy serving tables."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_sized(
    df: DataFrame,
    path: str,
    target_bytes: int = 128 << 20,
    mode: str = "overwrite",
) -> int:
    """Write parquet with file count sized to the data — the small-files
    guard for incremental pipelines: a corpus appended in thousands of tiny
    batches otherwise accumulates thousands of KB-sized files, and every
    later scan pays per-file open/footer costs that dwarf the reads.

    File count comes from the catalog size estimate (no pre-scan job;
    statless plans fall back to the current partitioning). Uses
    ``coalesce`` when shrinking — no shuffle, the narrow dependency just
    merges partitions at write time. Returns the file count used.
    """
    from ..plans import estimated_size_bytes

    size = estimated_size_bytes(df)
    if size is None:
        df.write.mode(mode).parquet(path)
        return df.rdd.getNumPartitions()
    n_files = max(1, -(-size // target_bytes))
    current = df.rdd.getNumPartitions()
    if n_files < current:
        df = df.coalesce(n_files)  # shrink: narrow merge, no shuffle
    elif n_files > current:
        df = df.repartition(n_files)  # grow: coalesce is a no-op upward
    df.write.mode(mode).parquet(path)
    return n_files
