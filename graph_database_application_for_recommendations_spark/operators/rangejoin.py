"""Binned range join — the scale pattern for theta joins Spark lacks.

A time-window join WITHOUT an equi key (``|r.ts − l.ts| ≤ W``) gets
planned by Spark as a broadcast nested loop — O(|L|·|R|) comparisons, the
classic silent killer on event tables. The standard fix (Databricks'
range-join hint does the same under the hood) is to manufacture an equi
key: quantize time into bins of width ``bin ≥ W``, assign each right row
its single bin, expand each left row to the bins its window can touch
(at most 3 when ``bin == W``), equi-join on the bin, and post-filter the
exact predicate. Each qualifying pair meets in exactly one bin (the
right row's), so no dedup pass is needed. Shuffle cost ∝ 3·|L| + |R|,
candidate volume ∝ pairs-per-bin — never the cross product.

(The user-keyed variant of this join is ``operators/events.py``'s
conversion funnel, where the user id already provides the equi key; this
operator is for the keyless case — e.g. attach every event near an
anomaly timestamp, corpus-wide.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_bin_join(
    left: DataFrame,
    right: DataFrame,
    window_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    bin_us: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with ``|right.ts − left.ts| ≤ window_us``.

    Returns every left column, every right column suffixed ``_r`` on
    collision, plus ``dt_us = right_ts − left_ts`` (signed). ``bin_us``
    defaults to ``window_us`` (the 3-probe optimum); raising it trades
    fewer probe rows for fatter bins.
    """
    if bin_us is None:
        bin_us = window_us
    if bin_us < window_us:
        raise ValueError("bin_us must be >= window_us (else windows span >3 bins)")
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    lcols = left.columns
    rcols = right.columns
    rmap = {c: f"{c}_r" if c in lcols else c for c in rcols}

    probe = left.select(
        *lcols,
        l_us.alias("_lus"),
        F.explode(
            F.sequence(
                F.floor((l_us - window_us) / bin_us),
                F.floor((l_us + window_us) / bin_us),
            )
        ).alias("_bin"),
    )
    build = right.select(
        *[F.col(c).alias(rmap[c]) for c in rcols],
        r_us.alias("_rus"),
        F.floor(r_us / bin_us).alias("_bin"),
    )
    return (
        probe.join(build, "_bin")
        .filter(F.abs(F.col("_rus") - F.col("_lus")) <= window_us)
        .select(
            *lcols,
            *[rmap[c] for c in rcols],
            (F.col("_rus") - F.col("_lus")).alias("dt_us"),
        )
    )
