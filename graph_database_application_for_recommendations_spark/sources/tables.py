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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; it is read as raw nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncated to microsecond
    timestamps — the same ns->us truncation DuckDB's reader applies, so
    oracle compares stay exact.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every star-schema table under ``sf_dir`` as a DataFrame."""
    return {t: load_table(spark, sf_dir, t) for t in STAR_TABLES}


def register_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view (for spark.sql access)."""
    for name, df in load_star(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
