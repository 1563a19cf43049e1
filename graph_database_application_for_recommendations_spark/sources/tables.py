"""Parquet sources for the driver's star-schema testdata.

All reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown, column pruning and partition pruning for free. Never collect here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_ts(raw: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a microsecond TIMESTAMP column.

    Two physical encodings exist across testdata generations:

    - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it, so it
      is read as raw nanos (``spark.sql.legacy.parquet.nanosAsLong``) and
      truncated here — the same ns->us truncation DuckDB's reader applies,
      so oracle compares stay exact.
    - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
      TIMESTAMP_NTZ, which half the timestamp function surface
      (``unix_micros`` et al.) rejects. Re-tag the same naive micros as a
      TIMESTAMP via pure NTZ arithmetic (``timestampdiff`` against an NTZ
      epoch literal) — a plain ``cast`` would route through the session
      timezone, and the driver's session timezone is unknown.

    Both branches yield byte-identical epoch micros, matching what DuckDB
    hands the oracle. A plain TIMESTAMP (UTC-adjusted MICROS — a third
    encoding a future generation could ship) passes through unchanged: it
    is already session-timezone-proof under ``unix_micros``, and running it
    through the NTZ ``timestampdiff`` branch would silently shift every
    event by the session zone offset. Any other type raises so a fourth
    encoding fails loudly instead of corrupting event times.
    """
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    ts_type = raw.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return raw.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
            ),
        )
    if isinstance(ts_type, TimestampType):
        return raw
    raise TypeError(
        f"events.ts arrived as {ts_type.simpleString()}; expected raw nanos "
        "(long), TIMESTAMP_NTZ, or TIMESTAMP — add an explicit branch for "
        "the new encoding (see docstring)"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table (see ``normalize_event_ts`` for events)."""
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(path))


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every star-schema table under ``sf_dir`` as a DataFrame."""
    return {t: load_table(spark, sf_dir, t) for t in STAR_TABLES}


def register_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view (for spark.sql access)."""
    for name, df in load_star(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
