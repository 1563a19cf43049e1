"""FastRP node embeddings as an iterative DataFrame program
(SURVEY.md §2.7 G2).

Reference: Neo4j GDS ``gds.fastRP.write`` with embeddingDimension=64,
relationshipWeightProperty='rating' on the undirected bipartite User–Book
graph (``algorithms/Alg_KNN_FastRP.py:53-70``).

Algorithm (Chen et al., "Fast and Accurate Network Embeddings via Very
Sparse Random Projection", CIKM 2019 — public paper; GDS implements the
same scheme):

1. Init each node with a very sparse random vector R_v ∈ {−√s, 0, +√s}^d,
   P(±) = 1/(2s), s = 3. Seeded deterministically per (node, dim) via
   murmur3 ``F.hash`` — no RNG state, so resumable and partition-order
   independent.
2. k rounds of weighted-mean message passing over the edges, L2-normalizing
   after each round:  h^(i) = normalize( D^-1 · W · h^(i-1) ).
3. Final embedding = Σ_i α_i · h^(i) (GDS default iterationWeights
   [0.0, 1.0, 1.0]), L2-normalized.

Scale notes: the per-iteration aggregate is a single groupBy(node) with one
sum buffer per vector slot — a partial-aggregatable shuffle of |E| rows
(map-side combined to one row per partition×node) — no per-node neighbor
lists are ever collected, so hub nodes (books rated by millions of users at
100 TB) cannot OOM an executor; AQE splits any skewed reduce partition.
An eager cache between rounds (``plans.materialize``) stops round N from
re-executing rounds 0..N-1 per action (on a cluster, a checkpoint dir or
intermediate parquet would serve the same purpose for crash recovery).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cache_wide, materialize

SPARSITY = 3


def _init_embeddings(nodes: DataFrame, dim: int, seed: int) -> DataFrame:
    """Very sparse random projection vectors, hash-seeded per (node, dim)."""
    scale = math.sqrt(SPARSITY)
    return nodes.select(
        "node_id",
        F.expr(
            f"transform(sequence(0, {dim - 1}), i -> "
            f"CASE pmod(hash(node_id, i, {seed}), {2 * SPARSITY}) "
            f"WHEN 0 THEN {scale}d WHEN 1 THEN {-scale}d ELSE 0d END)"
        ).alias("vec"),
    )


def _normalize(df: DataFrame, col: str = "vec") -> DataFrame:
    nrm = F.sqrt(F.aggregate(F.col(col), F.lit(0.0), lambda a, x: a + x * x))
    return df.withColumn(
        col, F.when(nrm > 0, F.transform(F.col(col), lambda x: x / nrm)).otherwise(F.col(col))
    )


def _propagate(
    edges: DataFrame, emb: DataFrame, dim: int, broadcast_emb: bool = False
) -> DataFrame:
    """One round: h_dst = Σ_src w·h_src / Σ_src w  (weighted neighbor mean).

    One HashAggregate with ``dim`` sum buffers (one per vector slot) keeps
    the shuffle at |E| rows — map-side combined down to one row per
    (partition, dst) — instead of the |E|·dim row blowup a posexplode
    formulation pays. Re-assembly back to an array is a codegen'd
    projection, no second aggregate.

    ``broadcast_emb`` skips shuffling the (large) edge list into the join:
    right for node tables that fit an executor (the caller gates on node
    count); huge graphs fall back to the shuffle join.
    """
    emb_side = emb.withColumnRenamed("node_id", "src")
    if broadcast_emb:
        emb_side = F.broadcast(emb_side)
    sums = [
        F.sum(F.col("vec")[i] * F.col("weight")).alias(f"_s{i}") for i in range(dim)
    ]
    return (
        edges.join(emb_side, "src")
        .groupBy("dst")
        .agg(*sums, F.sum("weight").alias("_w"))
        .select(
            F.col("dst").alias("node_id"),
            F.array(*[F.col(f"_s{i}") / F.col("_w") for i in range(dim)]).alias("vec"),
        )
    )


def fastrp(
    nodes: DataFrame,
    edges: DataFrame,
    dim: int = 64,
    iteration_weights: tuple[float, ...] = (0.0, 1.0, 1.0),
    seed: int = 42,
) -> DataFrame:
    """Returns ``(node_id, embedding ARRAY<DOUBLE> dim d)`` for every node.

    ``edges`` must already be undirected-doubled (plans/graphs.py).
    Isolated nodes keep their (normalized) random projection at weight of
    the first nonzero iteration — GDS behaves the same way modulo sign.
    """
    # nodes is typically *derived* (e.g. a distinct over the edge list);
    # without a cache every downstream action — init, broadcast gate,
    # isolated check, each iteration's zero-fill rejoin — would re-run
    # that distinct. This cache alone is worth ~2x on the whole algorithm.
    nodes = nodes.cache()
    # the propagate map side (join + partial agg over |E| rows) inherits the
    # edge cache's partitioning — a narrow source (one parquet file, a small
    # shuffle output) would pin the whole per-iteration kernel to a handful
    # of cores; spread it across the cluster once, reuse every iteration
    par = nodes.sparkSession.sparkContext.defaultParallelism
    edges = cache_wide(edges, par)
    n_nodes = nodes.count()
    emb = materialize(_normalize(_init_embeddings(nodes, dim, seed)))
    zero = F.expr(f"transform(sequence(0, {dim - 1}), i -> 0d)")
    acc = nodes.select("node_id", zero.alias("acc"))

    # ~(dim * 8)B per node: broadcast the node-vector table while it fits
    # comfortably in an executor; beyond that, shuffle join
    broadcast_emb = n_nodes * dim * 8 < 256 * 1024 * 1024

    # isolated nodes (no in-edges) drop out of the propagate aggregate and
    # need a zero-fill rejoin each round; skip that join entirely when the
    # graph has none (always true for graphs built from an edge list)
    # distinct first (map-side combinable) so the probe side broadcasts;
    # a raw |E|-row right side would force a shuffle join here
    reached = edges.select(F.col("dst").alias("node_id")).distinct()
    has_isolated = nodes.join(F.broadcast(reached), "node_id", "left_anti").count() > 0

    for alpha in iteration_weights:
        prev = emb
        emb = _normalize(_propagate(edges, emb, dim, broadcast_emb))
        if has_isolated:
            emb = nodes.join(emb, "node_id", "left").select(
                "node_id", F.coalesce("vec", zero).alias("vec")
            )
        emb = materialize(emb, supersedes=prev)
        if alpha != 0.0:
            # the accumulator is materialized per round too, so each round's
            # pinned state is exactly {current emb, current acc} — the
            # superseded round is dead and safe to unpersist
            prev_acc = acc
            acc = acc.join(emb, "node_id").select(
                "node_id",
                F.zip_with("acc", "vec", lambda a, v: a + F.lit(alpha) * v).alias("acc"),
            )
            acc = materialize(acc, supersedes=prev_acc)  # no-op on uncached df

    return _normalize(acc.withColumnRenamed("acc", "vec")).select(
        "node_id", F.col("vec").alias("embedding")
    )


def user_embeddings_from_fastrp(emb: DataFrame) -> DataFrame:
    """Project the User-node rows back to (user_id, embedding) — the
    reference's S11 users+embedding projection for the KNN stage."""
    return emb.filter(F.col("node_id").startswith("u:")).select(
        F.split(F.col("node_id"), ":")[1].cast("long").alias("user_id"), "embedding"
    )
