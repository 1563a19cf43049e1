"""Int8 embedding quantization — the storage-side compression path for
100 TB embedding tables (symmetric per-vector scheme: q = round(127·x /
max|x|), reconstructed as q·scale with scale = max|x|/127 — the standard
int8 recipe, e.g. FAISS ScalarQuantizer QT_8bit-style, public).

Where PQ (operators/pq.py) compresses for *search* (lossy codes + ADC),
int8 quantization compresses for *storage and transfer*: 4× smaller than
float32 with ≤ scale/2 per-coordinate error, exactly invertible modulo
that bound. Everything is native column expressions over one posexplode —
JVM codegen, no UDFs, no shuffle beyond the scan."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vector as V


def quantize_int8_flat(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, dim, q, scale): per-coordinate int8 codes in oracle-
    checkable long form. ``q`` ∈ [-127, 127]; ``scale`` (the per-vector
    dequant multiplier max|x|/127, rounded 9dp for the value hash)
    repeats per row so a reader needs no second table. Zero vectors
    quantize to all-zero codes with scale 0."""
    v = V.as_double(F.col(vec_col))
    # compute the per-vector max BEFORE the explode: in a single select
    # Catalyst places the Generate under the projection and re-evaluates
    # array_max once per exploded ROW — O(d²) per vector. Two selects pin
    # the scalar to the pre-explode projection (verified in the plan:
    # Project[_m] below Generate).
    pre = embeddings.select(
        F.col(id_col),
        v.alias("_v"),
        F.array_max(F.transform(v, lambda x: F.abs(x))).alias("_m"),
    )
    src = pre.select(id_col, "_m", F.posexplode("_v").alias("dim", "val"))
    q = (
        F.when(F.col("_m") > 0, F.round(127.0 * F.col("val") / F.col("_m"), 0))
        .otherwise(F.lit(0.0))
        .cast("int")
    )
    return src.select(
        id_col,
        "dim",
        q.alias("q"),
        F.round(F.col("_m") / 127.0, 9).alias("scale"),
    )


def dequantize_int8(quantized: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(vec_id, embedding array<double>): reassemble approximate vectors
    from the flat code table — q·scale per coordinate, positions restored
    by sort."""
    return (
        quantized.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", (F.col("q") * F.col("scale")).alias("x")))
            ).alias("_pv")
        )
        .select(id_col, F.transform("_pv", lambda s: s["x"]).alias("embedding"))
    )
