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


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the kind the driver's value-hash keys on:
    an int column and a float column hash differently even when every value
    is numerically equal (0 vs 0.0), so the local compare must distinguish
    them too."""
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    return str(dtype)


def compare(name: str, spark_df, sql: str, sf_dir: str) -> None:
    got = canonicalize(spark_df.toPandas())
    con = duck_con(sf_dir)
    want = canonicalize(con.sql(sql).df())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"{name}: schema mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    # dtype-KIND parity (round-9: the r08 q_ingest_compaction red row was a
    # DuckDB HUGEINT cumsum reaching pandas as float64 against Spark's LONG
    # — value-equal, kind-different, invisible under check_dtype=False but
    # red under the driver's hash). Empty frames keep engine-default dtypes
    # (DuckDB renders an empty integer column as object), so kind parity is
    # only checkable when rows exist.
    if len(got) and len(want):
        kinds_got = {c: _kind(got[c].dtype) for c in got.columns}
        kinds_want = {c: _kind(want[c].dtype) for c in want.columns}
        mismatched = {
            c: (kinds_got[c], kinds_want[c])
            for c in got.columns
            if kinds_got[c] != kinds_want[c]
        }
        assert not mismatched, (
            f"{name}: dtype-kind mismatch (spark, oracle): {mismatched}"
        )
    assert len(got) == len(want), f"{name}: rowcount spark={len(got)} oracle={len(want)}"
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    except AssertionError:
        diff = pd.concat([got, want]).drop_duplicates(keep=False)
        raise AssertionError(f"{name}: value mismatch; sample diff rows:\n{diff.head(10)}")
