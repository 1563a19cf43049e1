"""JSON-lines source/sink — schema-explicit, like every source here.

The reference only ingests CSV; JSONL is the interchange format most
training-data pipelines actually move documents/events in, so the engine
supports it first-class. Always pass a schema: inference reads the data
twice and types drift run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Schema-projected JSONL read.

    ``corrupt_col``: web-scale corpora always contain malformed lines; pass
    a column name to capture each bad line's raw text there (Spark's
    PERMISSIVE mode) instead of silently nulling it — the caller can route
    them to a quarantine sink and count them. Default (None) keeps the
    plain permissive read (bad lines -> all-null rows).

    Spark restriction: a query that references ONLY the corrupt-record
    column fails with AnalysisException on an uncached read (Spark refuses
    to pay the full parse just for the raw line); ``df.cache()`` the
    returned frame — or select at least one data column alongside — before
    filtering on ``corrupt_col`` alone. The quarantine test demonstrates
    the cache-first pattern."""
    if corrupt_col is None:
        return spark.read.schema(schema).json(path)
    from pyspark.sql.types import StringType, StructField

    with_corrupt = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType())]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_jsonl_stream(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Streaming JSONL source (file replay, same contract as the parquet
    event stream in streaming/events.py)."""
    return spark.readStream.schema(schema).json(path)
