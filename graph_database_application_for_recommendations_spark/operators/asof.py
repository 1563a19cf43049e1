"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For every left row, attach the most recent right row with
``right.ts <= left.ts`` within the same key (the backward as-of join of
kdb/pandas/DuckDB). Built as a composition of existing DataFrame ops —
union + ordered window carry-forward — rather than a per-key cross join:

- one shuffle on (key), one sort within partitions (the window),
- no right-side fanout, so a hot key costs O(rows log rows), not O(n·m),
- ties (equal timestamps) match: the right row sorts before the left row
  at the same instant.

This is the standard scale-out formulation (a merge of both streams in
event-time order with last-observation-carried-forward).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Backward as-of join: left rows + latest right row at-or-before.

    Returns all left columns plus ``prefix``-renamed ``right_cols``
    (NULL when no right row precedes the left row).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]

    l_tag = left.select(
        F.col(key).alias("_k"),
        F.unix_micros(F.col(left_ts)).alias("_ts_us"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.unix_micros(F.col(right_ts)).alias("_ts_us"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # right rows sort before left rows at equal timestamps => '<=' semantics
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts_us", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag)
    carried = merged.select(
        "_is_left",
        "_l",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in right_cols
        ],
    ).filter(F.col("_is_left") == 1)
    return carried.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rv_{c}").alias(f"{prefix}{c}") for c in right_cols],
    )
