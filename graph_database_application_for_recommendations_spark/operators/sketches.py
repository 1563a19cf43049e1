"""Mergeable sketch summaries as maintained sidecar state: count-min
(frequency estimates) and HyperLogLog registers (distinct counts).

These complete the incremental-maintenance algebra (DESIGN.md round 7)
with its two remaining monoid classes:

* count-min cells are ADDITIVE INTEGERS — the full group algebra: batch
  deltas sum, retraction works by negation, and the consolidated sketch
  is bit-identical to a single-pass build under any batching;
* HLL registers merge by MAX — a commutative idempotent monoid, NOT a
  group: union and replay-idempotence hold, but retraction is
  information-theoretically impossible (a max forgets who set it) — the
  one sidecar in the family where deletion genuinely requires a rebuild,
  and the docstrings say so rather than pretending otherwise.

Everything is md5-derived (functions.text.md5_hash32/60), so every
bucket index and register value is reproducible in ANSI SQL — both
sketch STATES are value-hash oracle-checkable, not just their estimates.

Sources (public): Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch" (J. Algorithms 2005); Flajolet et al.,
"HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm" (AofA 2007); Heule et al., "HyperLogLog in practice"
(EDBT 2013) for the register-merge discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_hash32, md5_hash60, tokens

CMS_DEPTH = 4
CMS_WIDTH = 1024
HLL_P = 10  # 2^10 registers
HLL_HASH_BITS = 60  # md5_hash60 payload width


def _cms_bucket(token: Column, row: int, width: int) -> Column:
    """Row ``row``'s bucket for a token: md5_hash32(token, seed=row+1) %
    width — seeds start at 1 because seed 0 means 'unsalted' in
    md5_hash32, and every CMS row must hash independently."""
    return md5_hash32(token, seed=row + 1) % width


def cms_delta_table(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, c): a batch's count-min sketch of its token stream —
    one token explode, one posexplode over the ``depth`` per-row buckets,
    one (row, bucket) count aggregate. The sketch is bounded state
    (depth × width cells) regardless of corpus size, and cells are
    additive integers: deltas from disjoint batches consolidate by plain
    SUM into exactly the single-pass sketch (and negate for retraction,
    like every group-algebra sidecar — etl._negate)."""
    tok = documents.select(
        F.explode(tokens(F.col(text_col))).alias("token")
    )
    buckets = F.array(*[_cms_bucket(F.col("token"), r, width) for r in range(depth)])
    return (
        tok.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def consolidate_cms(deltas: DataFrame) -> DataFrame:
    """(row, bucket, c) summed over any union/append of cms_delta_table
    outputs; zero-sum cells (fully retracted) drop — a missing cell reads
    as 0 at lookup, so the consolidated sketch equals the direct one."""
    return (
        deltas.groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
        .filter(F.col("c") != 0)
    )


def cms_point_estimates(
    sketch: DataFrame,
    terms: list[str],
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(token, est): count-min frequency estimates for a fixed term list
    — est = min over rows of the term's cell, the classic one-sided
    estimator (est ≥ true count, overshoot bounded by ‖counts‖₁·e/width
    with probability 1−e^−depth). The probe table is |terms|·depth rows
    joined against the bounded sketch — never touches the corpus."""
    spark = sketch.sparkSession
    probe = spark.createDataFrame([(t,) for t in terms], "token string").select(
        "token",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("token"), r, width) for r in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        probe.join(sketch, ["row", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


def hll_register_table(
    df: DataFrame,
    key_col: str,
    p: int = HLL_P,
) -> DataFrame:
    """(bucket, max_rho): the HyperLogLog register state of a column —
    bucket = the low ``p`` bits of a 60-bit md5 hash, rho = 1 + the
    number of leading zeros in the remaining 60−p bits (w = 0 ⇒ the
    all-zero suffix ⇒ rho = 60−p+1). Bounded state (2^p rows), merged
    across batches by MAX (hll_merge) — idempotent and commutative, so
    replay is free; NOT invertible, so retraction requires a rebuild
    (the documented monoid/group boundary of the sidecar algebra).

    Every step is integer/string arithmetic shared with the DuckDB
    oracle: h = md5_hash60(key); bucket = h % 2^p; w = h >> p (a true
    bit shift — a double-precision division would lose bits above 2^53);
    rho via the minimal binary width of w (both engines render bin()
    without leading zeros)."""
    m = 1 << p
    suffix_bits = HLL_HASH_BITS - p
    h = md5_hash60(F.col(key_col).cast("string"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        df.select((h % m).cast("long").alias("bucket"), rho.cast("long").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(deltas: DataFrame) -> DataFrame:
    """(bucket, max_rho) max-merged over any union/append of
    hll_register_table outputs — the monoid face: merge(a, b) = cellwise
    max, associative/commutative/idempotent, so the consolidated
    registers equal a single-pass build under any batching or replay."""
    return deltas.groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: DataFrame, p: int = HLL_P) -> float:
    """Driver-side scalar estimate from a (bucket, max_rho) register
    table — the raw HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007 §4; the empirical alpha_m). The
    register table is the oracle-checked artifact; the estimate is a
    bounded O(2^p) fold of it (collected: 2^p ≤ thousands of rows, a
    sketch, never data)."""
    m = 1 << p
    rows = {r["bucket"]: r["max_rho"] for r in registers.collect()}
    alpha = 0.7213 / (1.0 + 1.079 / m)
    z = sum(2.0 ** -rows.get(b, 0) for b in range(m))
    est = alpha * m * m / z
    zeros = m - len(rows)
    if est <= 2.5 * m and zeros:
        import math

        est = m * math.log(m / zeros)
    return est
