"""Sequence packing and domain mixing for LLM training-data pipelines.

``pack_chunks`` is GPT-style concatenate-and-chunk packing: documents are
laid out in a deterministic global order (``id_col`` ascending), the
concatenated token stream is cut into fixed ``ctx_len`` windows, and each
document is mapped to its (pack, offset) coordinates. The global running
token sum is the crux at scale — a naive ``Window.orderBy`` with no
partition key collapses the whole corpus onto one task. Here it is a
two-level distributed prefix sum:

  1. per-block partial sums (``floor(id / block_size)``) — one map-side-
     combinable aggregate producing ``n_docs / block_size`` rows;
  2. an exclusive prefix over that tiny block dimension (single-partition
     window over ~n/65k rows — at 10^11 docs and the default block size
     that is ~1.5M rows; raise ``block_size`` to shrink it further);
  3. broadcast the block offsets back and finish with a *per-block*
     running sum (bounded-memory window partitioned by block).

``mix_corpus`` is the data-mixture step: per-domain deterministic hash
sampling toward target weights. Membership depends only on (key, seed) —
the same md5 bucket primitive as ``operators/sampling.py`` — so a mixture
is reproducible across runs, engines, and corpus versions, and the filter
pushes to the scan (no shuffle, no state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hints import gated_broadcast
from ..functions.text import tokens
from .sampling import HASH_BUCKETS, sample_bucket

DEFAULT_BLOCK = 65_536


def pack_chunks(
    documents: DataFrame,
    ctx_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_size: int = DEFAULT_BLOCK,
) -> DataFrame:
    """(doc_id, n_tokens, pack_id, pack_last, pack_offset): assign every
    document its coordinates in the packed fixed-length training stream.

    ``pack_id``/``pack_last`` are the first/last context windows the
    document's tokens land in (documents spanning a boundary appear in
    more than one pack — standard chunk-style packing, no padding waste
    except the final window); ``pack_offset`` is the start position
    within ``pack_id``.

    Requires a numeric, roughly dense ``id_col`` (true for ingest-assigned
    ids); sparse key spaces only make the block dimension smaller per
    block, never incorrect, since empty blocks simply don't appear.
    """
    tok = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).withColumn(
        # integer `div`, not floor(double division): a / on longs goes
        # through double and ids above 2^53 would land in wrong blocks
        # (ADVICE r2)
        "_blk",
        F.expr(f"CAST(doc_id AS BIGINT) div {int(block_size)}"),
    )

    totals = tok.groupBy("_blk").agg(F.sum("n_tokens").alias("_bt"))
    w_blk = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_blk", F.coalesce(F.sum("_bt").over(w_blk), F.lit(0)).alias("_boff")
    )

    w_in = (
        Window.partitionBy("_blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_boff") + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    out = tok.join(gated_broadcast(offsets, "block-prefix histogram: one row per doc_id DIV block_size block"), "_blk").withColumn("_start", start)
    last_tok = F.col("_start") + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    return out.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("_start") / ctx_len).alias("pack_id"),
        F.floor(last_tok / ctx_len).alias("pack_last"),
        F.pmod(F.col("_start"), F.lit(ctx_len)).cast("long").alias("pack_offset"),
    )


def pack_stats(packed: DataFrame, ctx_len: int = 512) -> DataFrame:
    """(n_docs, n_tokens, n_packs, boundary_docs): packing summary —
    ``boundary_docs`` counts documents split across a window boundary."""
    return packed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.ceil(F.sum("n_tokens") / F.lit(float(ctx_len)))).cast("long").alias("n_packs"),
        F.sum((F.col("pack_last") > F.col("pack_id")).cast("long")).alias(
            "boundary_docs"
        ),
    )


def shuffle_corpus(
    documents: DataFrame,
    n_shards: int = 32,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """(doc_id, shard, pos): deterministic global training order.

    Epoch shuffling at 100 TB can't be a global sort by ``rand()`` — it
    would be a full-data shuffle with run-dependent output. Instead the
    order is a pure function of (key, seed): shard = hash bucket, position
    = rank of a second, independent hash within the shard. One window per
    shard (the parallel unit — bounded by shard size, which the caller
    scales with the corpus); a new seed is a new epoch permutation with
    zero data movement beyond the per-shard rank.
    """
    col = F.col(key_col)
    out = documents.select(
        col.alias("doc_id"),
        F.pmod(sample_bucket(key_col, seed), F.lit(n_shards)).cast("int").alias("shard"),
        sample_bucket(key_col, seed + 1).alias("_ord"),
    )
    w = Window.partitionBy("shard").orderBy("_ord", "doc_id")
    return out.withColumn("pos", (F.row_number().over(w) - 1).cast("long")).drop("_ord")


def write_training_shards(
    documents: DataFrame,
    path: str,
    n_shards: int = 32,
    key_col: str = "doc_id",
    seed: int = 0,
    mode: str = "overwrite",
) -> None:
    """Materialize the epoch order as shard-partitioned parquet: directory
    per shard, rows carrying their in-shard position — a trainer streams
    ``shard=K`` files in ``pos`` order and reads exactly the deterministic
    permutation ``shuffle_corpus`` defines. One write, partition-pruned
    reads per data-parallel rank, rebuildable bit-for-bit from (corpus,
    seed)."""
    order = shuffle_corpus(documents, n_shards=n_shards, key_col=key_col, seed=seed)
    out = documents.join(order.withColumnRenamed("doc_id", key_col), key_col)
    (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def mix_corpus(
    documents: DataFrame,
    weights: dict[str, float],
    domain_col: str = "source",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Deterministic domain re-weighting: keep each row with its domain's
    target fraction, decided by the row key's hash bucket.

    The weight table is a codegen'd map literal (domains are few); the
    whole operator is one scan-resident filter — the 100 TB cost is the
    read, nothing else. Thresholds are precomputed integers so the Spark
    plan and any SQL oracle compare identical values.
    """
    thresholds = {dom: int(frac * HASH_BUCKETS) for dom, frac in weights.items()}
    mapping = F.create_map(
        *[F.lit(x) for dom, thr in sorted(thresholds.items()) for x in (dom, thr)]
    )
    thr = F.coalesce(
        mapping[F.col(domain_col)], F.lit(int(default_fraction * HASH_BUCKETS))
    )
    return documents.filter(sample_bucket(key_col, seed) < thr)


def temperature_fractions(
    domain_counts: dict[str, int], temperature: float = 2.0
) -> dict[str, float]:
    """Per-domain keep fractions implementing temperature-scaled mixture
    balancing (the mT5/XLM-R recipe, Xue et al. 2021 §3.1, public):
    target sampling probability p_d ∝ n_d^(1/T), realized by DOWN-sampling
    only (fractions normalized so the most up-weighted domain keeps
    everything — no duplication, which ``mix_corpus``'s hash filter cannot
    express).

    T=1 reproduces the natural distribution (all fractions 1); T→∞
    approaches uniform over domains (small domains kept whole, large ones
    cut). Feed the result straight into ``mix_corpus(weights=...)``; the
    counts come from a one-pass groupBy the caller already runs for
    ``q_text_source_stats``.
    """
    if not domain_counts or temperature <= 0:
        raise ValueError("need non-empty counts and temperature > 0")
    total = sum(domain_counts.values())
    p = {d: (n / total) ** (1.0 / temperature) for d, n in domain_counts.items()}
    z = sum(p.values())
    # fraction of domain d to KEEP so the kept corpus follows p/z:
    # keep_d ∝ (p_d/z) / (n_d/total); scale so max = 1 (pure down-sampling)
    raw = {d: (p[d] / z) / (domain_counts[d] / total) for d in domain_counts}
    m = max(raw.values())
    return {d: raw[d] / m for d in raw}


def pack_length_buckets(
    documents: DataFrame,
    ctx_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_size: int = DEFAULT_BLOCK,
) -> DataFrame:
    """(doc_id, n_tokens, bucket_len, bucket_pack, slot): length-bucketed
    packing — the padding-efficiency alternative to concat-and-chunk
    (``pack_chunks``): each document rounds up to the next power-of-two
    bucket (capped at ``ctx_len``; longer docs truncate into the top
    bucket), and a pack holds ``ctx_len / bucket_len`` same-bucket docs,
    so no document ever straddles a window and per-pack padding is
    bounded by the bucket rounding. A pack is identified by
    (bucket_len, bucket_pack); ``slot`` is the position inside it.
    Assignment is deterministic: doc_id order within each bucket.

    The within-bucket rank is the scale crux: buckets are
    low-cardinality (≤ log2(ctx_len)+1 values), so a window partitioned
    by bucket alone would funnel ~1/10th of the corpus through single
    tasks — the same killer as an unpartitioned window. Same cure as
    ``pack_chunks``: rank = per-(bucket, id-block) row_number (bounded
    by ``block_size``) + an exclusive prefix over the tiny
    (bucket × block) histogram, broadcast back.
    """
    # power-of-two bucket ladder, identical CASE tree on both engines
    # (no float log2: exactness at powers of two is not guaranteed there)
    n = F.size(tokens(F.col(text_col))).cast("long")
    bl = F.lit(ctx_len)
    step = ctx_len
    while step > 1:
        step //= 2
        bl = F.when(n <= step, F.lit(step)).otherwise(bl)
    tok = documents.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        bl.alias("bucket_len"),
    ).withColumn("_blk", F.expr(f"CAST(doc_id AS BIGINT) div {int(block_size)}"))

    hist = tok.groupBy("bucket_len", "_blk").agg(F.count(F.lit(1)).alias("_c"))
    w_blk = (
        Window.partitionBy("bucket_len")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = hist.select(
        "bucket_len",
        "_blk",
        F.coalesce(F.sum("_c").over(w_blk), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("bucket_len", "_blk").orderBy("doc_id")
    ranked = (
        tok.join(gated_broadcast(offsets, "block-prefix histogram: (log2 bucket_len, doc_id block) rows"), ["bucket_len", "_blk"])
        .withColumn("_rk", F.col("_off") + F.row_number().over(w_in) - 1)
    )
    cap = F.lit(ctx_len) / F.col("bucket_len")  # exact: both powers of two
    return ranked.select(
        "doc_id",
        "n_tokens",
        F.col("bucket_len").cast("long").alias("bucket_len"),
        F.floor(F.col("_rk") / cap).cast("long").alias("bucket_pack"),
        F.pmod(F.col("_rk"), cap).cast("long").alias("slot"),
    )


def curriculum_order(
    documents: DataFrame,
    n_tiles: int = 10,
    seed: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, decile, pos): quality-curriculum training order — the
    corpus is consumed decile by decile (decile 1 = most prose-like
    first, the standard easy-to-hard curriculum), deterministically
    hash-shuffled WITHIN each decile so no other ordering bias leaks in.
    ``pos`` is 0-based within the decile; the training loader reads
    (decile ASC, pos ASC).

    The within-decile rank is the same scale crux as the length buckets
    (``pack_length_buckets``): deciles are 10 values, so a window
    partitioned by decile alone funnels ~corpus/10 through single
    tasks. Two-level instead: block on the top bits of the md5 order key
    (prefix blocking preserves the (hash, id) order), per-(decile,
    block) bounded windows, exclusive prefix over the tiny
    (decile × 256 blocks) histogram, broadcast back.
    """
    from ..functions.text import md5_hash60
    from .textstats import quality_deciles

    dec = quality_deciles(documents, n_tiles, id_col=id_col, text_col=text_col)
    h = md5_hash60(F.col("doc_id").cast("string"), seed)
    base = dec.select("doc_id", "decile", h.alias("_h")).withColumn(
        "_blk", F.expr(f"_h div {1 << 52}")  # top 8 bits of the 60-bit hash
    )
    hist = base.groupBy("decile", "_blk").agg(F.count(F.lit(1)).alias("_c"))
    w_blk = (
        Window.partitionBy("decile")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = hist.select(
        "decile", "_blk", F.coalesce(F.sum("_c").over(w_blk), F.lit(0)).alias("_off")
    )
    w_in = Window.partitionBy("decile", "_blk").orderBy("_h", "doc_id")
    return (
        base.join(gated_broadcast(offsets, "fixed-size construction: n_tiles x 256 hash-block histogram rows"), ["decile", "_blk"])
        .select(
            "doc_id",
            "decile",
            (F.col("_off") + F.row_number().over(w_in) - 1).alias("pos"),
        )
    )


def unimax_budgets(
    domain_counts: dict[str, int], budget: float
) -> dict[str, float]:
    """Per-domain document budgets implementing UniMax (Chung et al.
    2023, "UniMax: Fairer and More Effective Language Sampling", public):
    spread ``budget`` as uniformly as possible across domains, capping
    each domain at its availability (one epoch — pure down-sampling,
    same realization contract as temperature_fractions/mix_corpus).

    Computed in CLOSED water-filling form, not by iterative subtraction:
    with domains sorted ascending by (count, name), the fully-taken set
    is the maximal prefix where n_k ≤ (budget − cum_{k−1})/(L−k+1) (the
    greedy share can only stay constant once a domain caps out, so the
    condition is prefix-monotone), and every remaining domain gets the
    identical level t = (budget − cum_{k*})/(L − k*). The closed form is
    what the SQL oracle computes too, so the float operations are
    bit-identical across engines — an iterative loop would drift in the
    last ulp.
    """
    if not domain_counts or budget < 0:
        raise ValueError("need non-empty counts and budget >= 0")
    items = sorted(domain_counts.items(), key=lambda kv: (kv[1], kv[0]))
    L = len(items)
    cum = 0
    kstar = 0
    for k, (_, n) in enumerate(items, start=1):
        if n <= (budget - cum) / (L - k + 1):
            cum += n
            kstar = k
        else:
            break
    t = (budget - cum) / (L - kstar) if kstar < L else 0.0
    return {
        d: float(n) if k <= kstar else t
        for k, (d, n) in enumerate(items, start=1)
    }
