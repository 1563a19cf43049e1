"""Reference-shaped CSV source/sink (SURVEY.md §2.1 S1-S3).

The reference ingests the Kaggle Book-Recommendation CSVs with pandas
(``data/load_data.py:5-7``: latin-1, blanks -> ''), plus csv-module row
streaming for the filter scripts. Spark-native equivalents with the same
semantics, including the '' -> NULL age normalization the loader applies
(P6, ``data/load_data.py:26``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Kaggle CSV schemas as seen by the reference (SURVEY.md §1.1). Everything
# is read as string first — the reference also receives strings and coerces
# with toInteger()/CASE (load_data.py:25-26,42,59).
USERS_CSV_SCHEMA = StructType(
    [
        StructField("User-ID", StringType()),
        StructField("Location", StringType()),
        StructField("Age", StringType()),
    ]
)

BOOKS_CSV_SCHEMA = StructType(
    [
        StructField("ISBN", StringType()),
        StructField("Book-Title", StringType()),
        StructField("Book-Author", StringType()),
        StructField("Year-Of-Publication", StringType()),
        StructField("Publisher", StringType()),
    ]
)

RATINGS_CSV_SCHEMA = StructType(
    [
        StructField("User-ID", StringType()),
        StructField("ISBN", StringType()),
        StructField("Book-Rating", StringType()),
    ]
)


def _read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S1 — header row, latin-1 (Spark's charset name: iso-8859-1), no
    schema inference (explicit schema)."""
    return (
        spark.read.option("header", True)
        .option("encoding", "iso-8859-1")
        .schema(schema)
        .csv(path)
    )


def read_users_csv(spark: SparkSession, path: str) -> DataFrame:
    """Users.csv -> (user_id, location, age) with '' and missing -> NULL age
    (P6: ``CASE row.Age WHEN '' THEN NULL ELSE toInteger(row.Age) END``)."""
    raw = _read_csv(spark, path, USERS_CSV_SCHEMA)
    return raw.select(
        F.col("User-ID").cast(LongType()).alias("user_id"),
        F.col("Location").alias("location"),
        F.when(F.col("Age") == "", None)
        .otherwise(F.col("Age").cast("double").cast(IntegerType()))
        .alias("age"),
    )


def read_books_csv(spark: SparkSession, path: str) -> DataFrame:
    raw = _read_csv(spark, path, BOOKS_CSV_SCHEMA)
    return raw.select(
        F.col("ISBN").alias("isbn"),
        F.col("Book-Title").alias("title"),
        F.col("Book-Author").alias("author"),
        F.col("Year-Of-Publication").cast(IntegerType()).alias("year"),
        F.col("Publisher").alias("publisher"),
    )


def read_ratings_csv(spark: SparkSession, path: str) -> DataFrame:
    raw = _read_csv(spark, path, RATINGS_CSV_SCHEMA)
    return raw.select(
        F.col("User-ID").cast(LongType()).alias("user_id"),
        F.col("ISBN").alias("isbn"),
        F.col("Book-Rating").cast(IntegerType()).alias("rating"),
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S3 — header CSV sink (the reference writes filtered_*.csv; we write
    partition-parallel instead of a single client-side stream)."""
    df.write.option("header", True).mode(mode).csv(path)
