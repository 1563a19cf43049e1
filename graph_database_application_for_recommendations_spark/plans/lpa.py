"""Weighted label propagation — the community-detection stage
(SURVEY.md §2.7 G1).

Reference: Neo4j GDS Louvain over the user–user co-rating graph
(``algorithms/Alg_Community_Detection.py:36-50``). Louvain's local-move
phase is inherently sequential; per SURVEY.md §7 the first-class
distributed stand-in is synchronous weighted label propagation with the
same *interface* (user_id -> community int) and an explicit modularity
metric (modularity.py) to report the quality the reference prints.

Determinism: labels start as node ids; each round every node adopts the
label with the highest incident weight sum (ties -> smallest label).
Synchronous updates + deterministic tie-break => the result depends only
on the graph, not on partitioning. A max-iteration cap bounds the known
2-coloring oscillation of synchronous LPA on bipartite-ish structures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cache_wide, gate_node_vector_broadcast, materialize, release_checkpoint


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    weight_col: str = "weight",
) -> DataFrame:
    """``edges`` is an undirected-doubled (src, dst, weight) edge list over
    long node ids. Returns ``(node_id, community)``.

    Each round is one shuffle (groupBy dst,label) + an argmax hash
    aggregate; an eager cache per round (``plans.materialize``) stops round
    N from re-executing rounds 1..N-1. The edge list is cached up front —
    it is re-scanned every round, and deriving it (e.g. the co-rating
    self-join) is often the most expensive plan in the job.
    """
    edges = cache_wide(edges, edges.sparkSession.sparkContext.defaultParallelism)
    labels = materialize(
        edges.select(F.col("src").alias("node_id"))
        .union(edges.select(F.col("dst")))
        .distinct()
        .withColumn("community", F.col("node_id"))
    )
    # materialized label tables are LogicalRDDs with no size stats — hint
    # the broadcast while |V| is small so each round's edges ⋈ labels join
    # doesn't re-shuffle the edge list; huge graphs fall back to shuffle
    n_nodes = labels.count()
    bc = gate_node_vector_broadcast(n_nodes, "LPA label table")
    prev_pin: tuple[DataFrame, DataFrame] | None = None

    for _ in range(max_iter):
        scores = (
            edges.join(
                bc(labels.select(F.col("node_id").alias("src"), "community")), "src"
            )
            .groupBy("dst", "community")
            .agg(F.sum(weight_col).alias("score"))
        )
        # argmax via hash aggregate (map-side combine, no sort): highest
        # score, ties -> smallest label; ids are numeric so max(-id)=min(id)
        new_labels = (
            scores.groupBy("dst")
            .agg(
                F.max(
                    F.struct(
                        F.col("score"),
                        (-F.col("community")).alias("_neg"),
                        F.col("community").alias("choice"),
                    )
                ).alias("best")
            )
            .select(F.col("dst").alias("node_id"), F.col("best.choice").alias("community"))
        )
        # isolated nodes (no edges) keep their own id as community. The
        # convergence flag rides along so ONE job both fills the new label
        # cache and counts the changes (the r9 shape paid materialize's
        # count + checkpoint + a separate old⋈new comparison pass per
        # round); the lazy checkpoint truncates the plan now and its blocks
        # materialize inside the next round's fill. Rename instead of
        # alias: gated_broadcast wraps its input in the witness subquery
        # alias, which would clobber a caller alias.
        # broadcast the NEW side (the ≤|V|-row aggregate output, same count
        # gate): BuildRight LeftOuter is broadcast-joinable, and the old
        # label table streams through as the all-nodes base. For a node
        # absent from new_labels (no in-edges) the old label IS its own id
        # (initialized so, and it can never move), so coalescing to the old
        # label keeps the isolated-node contract unchanged.
        flagged = (
            labels.withColumnRenamed("community", "_old")
            .join(bc(new_labels), "node_id", "left")
            .select(
                "node_id",
                F.coalesce("community", F.col("_old")).alias("community"),
                (
                    F.col("community").isNotNull()
                    & (F.col("community") != F.col("_old"))
                ).alias("_moved"),
            )
        )
        tmp = flagged.cache()
        changed = tmp.filter("_moved").count()
        new_labels = tmp.select("node_id", "community").localCheckpoint(eager=False)
        if prev_pin is not None:
            p_tmp, p_ck = prev_pin
            p_tmp.unpersist(blocking=False)
            p_ck.unpersist(blocking=False)
            release_checkpoint(p_ck)
        prev_pin = (tmp, new_labels)
        labels = new_labels
        if changed == 0:
            break

    # canonicalize community ids to the smallest member id so output ids are
    # stable regardless of which label happened to win propagation
    canon = labels.groupBy("community").agg(F.min("node_id").alias("canon"))
    return labels.join(canon, "community").select(
        "node_id", F.col("canon").alias("community")
    )
