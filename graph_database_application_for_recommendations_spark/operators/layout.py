"""Lakehouse data-layout optimization: Morton (Z-order) clustering keys,
fixed-size row blocks, per-block zone maps, and a pruning-effectiveness
report comparing a linear (x-major) sort against a Z-ordered sort.

Zone maps — per-block (min, max) of each column — are how columnar engines
skip data: a block whose [min, max] misses the predicate is never read.
A layout sorted on ONE key gives tight zone maps for that key only; every
block spans the full range of the other key, so predicates on it prune
nothing. Interleaving the bits of two bucketized keys (Morton order,
Morton 1966) keeps BOTH key ranges bounded inside every run of consecutive
cells, so multi-dimensional predicates prune. This is the computation
behind Delta Lake's ``OPTIMIZE ZORDER BY`` (Armbrust et al., "Delta Lake",
VLDB 2020) and Snowflake's clustering keys / clustering-depth metric
(Dageville et al., SIGMOD 2016), expressed as an auditable query instead
of a storage-engine side effect.

Scale notes (100 TB):
- bucketization needs only the global (min, max) of each key — a one-row
  aggregate broadcast back onto the scan — then per-row JVM bit arithmetic
  (no Python, no shuffle);
- block assignment deliberately avoids one global sort task: the
  (layout, cell) histogram is bounded by 2·4^bits rows, the prefix-sum
  window runs over that bounded table only, and the residual row_number
  partitions by (layout, cell) — the same two-level rank pattern as
  ``packing.pack_documents``. (A writer materializing the layout would
  use ``repartitionByRange + sortWithinPartitions``, Spark's sampled
  range sort; this module computes the exact layout audit.)
- zone maps and the pruning report aggregate over ~rows/rows_per_block
  blocks with map-side combine; nothing here is driver-side.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hints import gated_broadcast


def morton_key(xb: Column, yb: Column, bits: int) -> Column:
    """Interleave the low ``bits`` bits of two bucket ids: x fills the odd
    bit positions, y the even — z = Σ_i x_i·2^(2i+1) + y_i·2^(2i).
    The terms occupy disjoint bit positions, so integer ``+`` IS bitwise
    OR; everything stays in whole-stage codegen."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(operator.add, terms).cast("long")


def zorder_key(
    df: DataFrame, xcol: str, ycol: str, bits: int = 8
) -> DataFrame:
    """Input rows + (xb, yb, zkey): each key min-max-bucketized into
    [0, 2^bits) with exact integer arithmetic, then Morton-interleaved.

    Overflow contract (round-7 ADVICE): the exact formula
    ``(v − min)·2^bits DIV span`` multiplies BEFORE dividing, so it is
    only exact while ``span = max − min + 1 ≤ 2^(63−bits)`` (~2^55 at
    the default bits=8) — beyond that the product wraps BIGINT and
    silently misbuckets under non-ANSI Spark. The expression therefore
    branches on the actual span: in-contract spans (every registered
    binding — epoch-micros spans are ~2^45) take the exact
    multiply-then-DIV; wider spans fall back to divide-first
    ``(v − min) DIV ceil(span/2^bits)`` — overflow-free, still
    monotonic, still lands in [0, 2^bits), merely allowing the last
    bucket to run ragged. Spans that overflow BIGINT themselves
    (min < 0 ≤ max with max − min ≥ 2^63) are out of contract."""
    nb = 1 << bits
    exact_max_span = 1 << (63 - bits)
    bounds = df.agg(
        F.min(xcol).cast("long").alias("_minx"),
        F.max(xcol).cast("long").alias("_maxx"),
        F.min(ycol).cast("long").alias("_miny"),
        F.max(ycol).cast("long").alias("_maxy"),
    )

    def _bucket(col: str, mn: str, mx: str) -> Column:
        span = f"({mx} - {mn} + 1)"
        return F.expr(
            f"CASE WHEN {span} <= {exact_max_span} "
            f"THEN (CAST({col} AS BIGINT) - {mn}) * {nb} DIV {span} "
            f"ELSE (CAST({col} AS BIGINT) - {mn}) DIV (({span} + {nb - 1}) DIV {nb}) "
            f"END"
        )

    out = (
        df.where(F.col(xcol).isNotNull() & F.col(ycol).isNotNull())
        .crossJoin(gated_broadcast(bounds, "1-row global min/max aggregate"))
        .withColumn("xb", _bucket(xcol, "_minx", "_maxx"))
        .withColumn("yb", _bucket(ycol, "_miny", "_maxy"))
        .withColumn("zkey", morton_key(F.col("xb"), F.col("yb"), bits))
    )
    return out.drop("_minx", "_maxx", "_miny", "_maxy")


def _layout_blocks(
    df: DataFrame,
    xcol: str,
    ycol: str,
    id_col: str,
    bits: int,
    rows_per_block: int,
) -> DataFrame:
    """(layout, block_id, xb, yb) for both layouts: rows totally ordered by
    (cell, x, y, id) and cut into fixed blocks of ``rows_per_block`` rows —
    the parquet-row-group model. Layouts differ only in the cell id:
    ``linear`` = x-major (xb·2^bits + yb), ``zorder`` = Morton."""
    nb = 1 << bits
    keyed = zorder_key(df, xcol, ycol, bits).select(
        F.col(xcol).cast("long").alias("x"),
        F.col(ycol).cast("long").alias("y"),
        F.col(id_col).alias("rid"),
        "xb",
        "yb",
        (F.col("xb") * nb + F.col("yb")).alias("cell_linear"),
        F.col("zkey").alias("cell_z"),
    )
    lay = keyed.select(
        "x",
        "y",
        "rid",
        "xb",
        "yb",
        F.explode(
            F.array(
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.col("cell_linear").alias("cell"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"), F.col("cell_z").alias("cell")
                ),
            )
        ).alias("_lc"),
    ).select("x", "y", "rid", "xb", "yb", F.col("_lc.layout").alias("layout"), F.col("_lc.cell").alias("cell"))

    # two-level global rank: bounded (layout, cell) histogram -> prefix
    # offsets (window over <= 2*4^bits rows) -> per-cell residual rank
    hist = lay.groupBy("layout", "cell").agg(F.count(F.lit(1)).alias("_n"))
    w_pre = (
        Window.partitionBy("layout")
        .orderBy("cell")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = hist.select(
        "layout", "cell", F.coalesce(F.sum("_n").over(w_pre), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("layout", "cell").orderBy("x", "y", "rid")
    ranked = lay.join(gated_broadcast(offs, "fixed-size construction: <= 2*4^bits (layout, cell) histogram rows"), ["layout", "cell"]).withColumn(
        "_r", F.col("_off") + F.row_number().over(w_in) - 1
    )
    return ranked.select(
        "layout",
        "xb",
        "yb",
        F.expr(f"_r DIV {int(rows_per_block)}").alias("block_id"),
    )


def layout_zonemaps(
    df: DataFrame,
    xcol: str,
    ycol: str,
    id_col: str,
    bits: int = 8,
    rows_per_block: int = 128,
) -> DataFrame:
    """The zone-map table itself, for both layouts: (layout, block_id,
    n_rows, min_xb, max_xb, min_yb, max_yb). Reading it side by side shows
    the trade directly — linear blocks have x-span ~0 and y-span ~full,
    Z-order blocks bound both."""
    blocks = _layout_blocks(df, xcol, ycol, id_col, bits, rows_per_block)
    return blocks.groupBy("layout", "block_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xb").alias("min_xb"),
        F.max("xb").alias("max_xb"),
        F.min("yb").alias("min_yb"),
        F.max("yb").alias("max_yb"),
    )


def layout_pruning(
    df: DataFrame,
    xcol: str,
    ycol: str,
    id_col: str,
    bits: int = 8,
    rows_per_block: int = 128,
    x_lo: int = 64,
    x_hi: int = 127,
    y_lo: int = 64,
    y_hi: int = 127,
) -> DataFrame:
    """Pruning effectiveness of a rectangle predicate (xb ∈ [x_lo, x_hi] ∧
    yb ∈ [y_lo, y_hi], bucket space, inclusive) under each layout:

    (layout, n_blocks, blocks_scanned, rows_scanned, rows_matched,
     scan_fraction, avg_x_span, avg_y_span)

    A block is scanned iff its zone map overlaps the rectangle — exactly
    the min/max skip test a columnar reader applies per row group.
    rows_matched is layout-invariant (same predicate, same rows) and doubles
    as the cross-layout sanity check; scan_fraction = rows_scanned / total
    is the fraction of the table a reader touches."""
    blocks = _layout_blocks(df, xcol, ycol, id_col, bits, rows_per_block)
    matched = (
        (F.col("xb") >= x_lo)
        & (F.col("xb") <= x_hi)
        & (F.col("yb") >= y_lo)
        & (F.col("yb") <= y_hi)
    )
    zm = blocks.groupBy("layout", "block_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xb").alias("min_xb"),
        F.max("xb").alias("max_xb"),
        F.min("yb").alias("min_yb"),
        F.max("yb").alias("max_yb"),
        F.sum(F.when(matched, 1).otherwise(0)).alias("n_matched"),
    )
    scanned = (
        (F.col("min_xb") <= x_hi)
        & (F.col("max_xb") >= x_lo)
        & (F.col("min_yb") <= y_hi)
        & (F.col("max_yb") >= y_lo)
    )
    return zm.groupBy("layout").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(scanned, 1).otherwise(0)).alias("blocks_scanned"),
        F.sum(F.when(scanned, F.col("n_rows")).otherwise(0)).alias("rows_scanned"),
        F.sum("n_matched").alias("rows_matched"),
        F.round(
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0)) / F.sum("n_rows"), 6
        ).alias("scan_fraction"),
        F.round(F.avg(F.col("max_xb") - F.col("min_xb") + 1), 6).alias("avg_x_span"),
        F.round(F.avg(F.col("max_yb") - F.col("min_yb") + 1), 6).alias("avg_y_span"),
    )


def zonemap_delta_table(
    df: DataFrame,
    xcol: str,
    ycol: str,
    file_col,
) -> DataFrame:
    """(file_id, n_rows, min_x, max_x, min_y, max_y): the per-file
    statistics row a lakehouse writer commits with each data file
    (Delta Lake ``add.stats``, Iceberg manifest column bounds) —
    computed here for whatever ``file_col`` expression partitions the
    batch into files (e.g. the ingestion day).

    This is another instance of the sidecar algebra: rows from disjoint
    sub-batches re-aggregate by (MIN, MAX, SUM) — a commutative monoid —
    so ``consolidate_zonemaps(deltas)`` over any batching equals the
    single-pass table and the stats never require a corpus rescan."""
    return (
        df.where(F.col(xcol).isNotNull() & F.col(ycol).isNotNull())
        .groupBy(file_col.alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(xcol).alias("min_x"),
            F.max(xcol).alias("max_x"),
            F.min(ycol).alias("min_y"),
            F.max(ycol).alias("max_y"),
        )
    )


def consolidate_zonemaps(deltas: DataFrame) -> DataFrame:
    """Merge per-sub-batch stats rows into the per-file stats table:
    (MIN, MAX, SUM) re-aggregate keyed by file_id."""
    return deltas.groupBy("file_id").agg(
        F.sum("n_rows").alias("n_rows"),
        F.min("min_x").alias("min_x"),
        F.max("max_x").alias("max_x"),
        F.min("min_y").alias("min_y"),
        F.max("max_y").alias("max_y"),
    )


def zonemap_scan_decisions(
    stats: DataFrame,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
) -> DataFrame:
    """stats + ``scanned``: the per-file min/max skip test for a
    rectangle predicate (x ∈ [x_lo, x_hi] ∧ y ∈ [y_lo, y_hi], raw
    units) — exactly the planning decision a reader makes from the
    stats table alone, before touching any data file."""
    scanned = (
        (F.col("min_x") <= x_hi)
        & (F.col("max_x") >= x_lo)
        & (F.col("min_y") <= y_hi)
        & (F.col("max_y") >= y_lo)
    )
    return stats.select(
        "file_id", "n_rows", "min_x", "max_x", "min_y", "max_y", scanned.alias("scanned")
    )


def compaction_plan(
    stats: DataFrame, target_rows: int, small_threshold: int
) -> DataFrame:
    """(file_id, n_rows, bin_id): the small-file compaction plan a
    lakehouse OPTIMIZE job executes — files below ``small_threshold``
    rows, taken in file_id order, packed greedily into bins of
    ~``target_rows`` via bin = cum_rows_before DIV target (each bin may
    overshoot by at most its last file, the standard first-fit-in-order
    policy). Pure planning from the stats sidecar — no data files read.

    The cumulative window is bounded: ``stats`` is already the per-file
    aggregate (one row per file), never corpus rows."""
    small = stats.where(F.col("n_rows") < small_threshold)
    w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        small.withColumn("_cum", F.coalesce(F.sum("n_rows").over(w), F.lit(0)))
        .withColumn("bin_id", F.expr(f"_cum DIV {int(target_rows)}"))
        .select("file_id", "n_rows", "bin_id")
    )
