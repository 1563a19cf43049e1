"""Local replica of the driver's DuckDB-oracle compare.

Runs the Spark query and the oracle SQL on the same parquet tables, sorts
columns by name and rows by value, and asserts exact equality — stricter
than the driver's hash compare, and it prints the first differing rows,
which the driver's verdict can't."""

from __future__ import annotations

import duckdb
import pandas as pd

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


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype("string")
    # normalize numeric dtypes across engines (int32 vs int64, Float64 ...)
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]) or pd.api.types.is_bool_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64").round(9)
    pdf = pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(drop=True)
    return pdf


def compare(name: str, spark_df, sql: str, sf_dir: str) -> None:
    got = canonicalize(spark_df.toPandas())
    con = duck_con(sf_dir)
    want = canonicalize(con.sql(sql).df())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"{name}: schema mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount spark={len(got)} oracle={len(want)}"
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    except AssertionError:
        diff = pd.concat([got, want]).drop_duplicates(keep=False)
        raise AssertionError(f"{name}: value mismatch; sample diff rows:\n{diff.head(10)}")
