"""As-of (point-in-time) join — a custom operator Spark lacks natively.

For every left row, attach the nearest right row within the same key:
the most recent at-or-before (``backward`` — kdb/pandas/DuckDB default),
the earliest at-or-after (``forward``), or whichever is closer
(``nearest``, backward winning ties like pandas ``merge_asof``), with an
optional ``tolerance_us`` window. Built as a composition of existing
DataFrame ops — union + ordered window carry — rather than a per-key
cross join:

- one shuffle on (key), one sort within partitions per direction,
- no right-side fanout, so a hot key costs O(rows log rows), not O(n·m),
- the right row is carried as ONE struct, so all attached columns come
  from the SAME right row even when some of its fields are NULL
  (per-column carry would mix rows),
- ties (equal timestamps) match in both directions: the right row sorts
  on the matching side of the left row at the same instant.

This is the standard scale-out formulation (a merge of both streams in
event-time order with observation-carried-forward/backward).
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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join: left rows + the matching right row per ``direction``.

    Returns all left columns plus ``prefix``-renamed ``right_cols``
    (NULL when no right row matches, or the match falls outside
    ``tolerance_us`` of the left timestamp).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (key, right_ts)]

    r_struct = F.struct(
        F.unix_micros(F.col(right_ts)).alias("_rts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r_probe = right.select(r_struct.alias("_r"))
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.unix_micros(F.col(left_ts)).alias("_ts_us"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_probe.schema["_r"].dataType).alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.unix_micros(F.col(right_ts)).alias("_ts_us"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    merged = l_tag.unionByName(r_tag)

    def carried(dirn: str) -> F.Column:
        if dirn == "backward":
            # right rows sort before left at equal ts => '<=' matches
            w = (
                Window.partitionBy("_k")
                .orderBy(F.col("_ts_us").asc(), F.col("_is_left").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            return F.last("_r", ignorenulls=True).over(w)
        # forward: right rows sort after left at equal ts => '>=' matches
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts_us").asc(), F.col("_is_left").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        return F.first("_r", ignorenulls=True).over(w)

    def within_tol(rv: F.Column, ts: F.Column) -> F.Column:
        if tolerance_us is None:
            return rv
        return F.when(
            F.abs(ts - rv.getField("_rts")) <= F.lit(tolerance_us), rv
        )

    if direction == "nearest":
        picked = merged.select(
            "_is_left",
            "_ts_us",
            "_l",
            within_tol(carried("backward"), F.col("_ts_us")).alias("_rb"),
            within_tol(carried("forward"), F.col("_ts_us")).alias("_rf"),
        )
        back_closer = F.col("_rb").isNotNull() & (
            F.col("_rf").isNull()
            | (
                (F.col("_ts_us") - F.col("_rb").getField("_rts"))
                <= (F.col("_rf").getField("_rts") - F.col("_ts_us"))
            )
        )
        out = picked.withColumn(
            "_rv", F.when(back_closer, F.col("_rb")).otherwise(F.col("_rf"))
        )
    else:
        out = merged.select(
            "_is_left",
            "_ts_us",
            "_l",
            within_tol(carried(direction), F.col("_ts_us")).alias("_rv"),
        )
    return out.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col("_rv").getField(c).alias(f"{prefix}{c}") for c in right_cols],
    )
