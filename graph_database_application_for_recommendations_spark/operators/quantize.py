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
from ..functions.hints import assert_broadcastable, gated_broadcast


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


def quantize_binary_flat(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, word_idx, word): 1-bit sign quantization (binary
    quantization, the vector-DB "BQ" layout — 32× smaller than float32),
    packed into 32-BIT words carried as longs. 32-bit words, not 64:
    bit 63 would flip the long's sign and DuckDB's `<<` refuses the
    overflowing shift, so the 32-bit layout keeps every word a plain
    positive integer both engines agree on exactly. bit j of word w is
    set iff x[32w + j] > 0.

    One posexplode + one map-side-combinable sum per vector (each set
    bit is a distinct power of two, so SUM == bitwise OR); no UDFs.
    """
    src = embeddings.select(
        F.col(id_col), F.posexplode(V.as_double(F.col(vec_col))).alias("i", "x")
    )
    bitval = F.expr("CASE WHEN x > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(i % 32 AS INT)) ELSE CAST(0 AS BIGINT) END")
    return (
        src.select(id_col, F.expr("i div 32").cast("int").alias("word_idx"), bitval.alias("_b"))
        .groupBy(id_col, "word_idx")
        .agg(F.sum("_b").alias("word"))
    )


def _pack_binary_wide(
    embeddings: DataFrame, id_col: str, vec_col: str, out_id: str, out_words: str
) -> DataFrame:
    """(out_id, out_words array<long>): word_idx-ordered packed form."""
    flat = quantize_binary_flat(embeddings, id_col, vec_col)
    return (
        flat.groupBy(F.col(id_col).alias(out_id))
        .agg(
            F.array_sort(F.collect_list(F.struct("word_idx", "word"))).alias("_pw")
        )
        .select(out_id, F.transform("_pw", lambda s: s["word"]).alias(out_words))
    )


def topk_binary(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rerank: int = 100,
) -> DataFrame:
    """(query_id, neighbor_id, hamming, similarity): BQ + rescore ANN —
    the modern vector-DB pattern. Candidates are the ``rerank`` smallest
    Hamming distances per query over the packed sign bits (popcount of
    XOR — integer ops over a 32× smaller table than the float scan, the
    entire point of BQ); the exact cosine re-ranks candidates to the
    final top-k. Fully deterministic: Hamming ties break on neighbor_id,
    cosine ties on neighbor_id, so the result is a pure function of the
    vectors and both stages are SQL-recomputable (q_simsearch_binary).

    Scale: queries (packed words + raw vectors) broadcast; the corpus
    side streams through ONE scan of its packed table for the Hamming
    pass and touches raw floats only for |queries|·rerank candidate
    rows. Per-query top-rerank/top-k windows are partitioned by query.
    """
    from pyspark.sql import Window

    # every broadcast below (packed queries, candidates, raw query vecs)
    # is bounded by |queries| — stats-check the contract once at entry
    queries = assert_broadcastable(queries, "topk_binary query side")
    qw = _pack_binary_wide(queries, id_col, vec_col, "query_id", "_qw")
    cw = _pack_binary_wide(corpus, id_col, vec_col, "neighbor_id", "_cw")
    ham = (
        cw.crossJoin(gated_broadcast(qw, "caller contract: packed query side, "
                                     "|queries| rows; stats-checked at entry"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("_qw", "_cw", lambda a, b: F.bit_count(a.bitwiseXOR(b))),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("hamming"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    cand = ham.withColumn("_rn", F.row_number().over(w1)).filter(
        F.col("_rn") <= rerank
    ).drop("_rn")
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        V.l2_normalize(V.as_double(F.col(vec_col))).alias("_qv"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        V.l2_normalize(V.as_double(F.col(vec_col))).alias("_cv"),
    )
    # candidates are |queries|·rerank rows — broadcast them INTO the
    # corpus-side float scan rather than shuffling the corpus on id
    scored = (
        cv.join(
            gated_broadcast(cand, "caller contract: |queries| x rerank candidate rows"),
            "neighbor_id",
        )
        .join(gated_broadcast(qv, "caller contract: query-set rows"), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.round(V.dot(F.col("_qv"), F.col("_cv")), V.SIM_SCALE).alias("similarity"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("similarity"), F.asc("neighbor_id"))
    return scored.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= k
    ).drop("_rn")
