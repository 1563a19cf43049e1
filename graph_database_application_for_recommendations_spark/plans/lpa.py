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

from . import cache_wide, gate_node_vector_broadcast, materialize


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
        # isolated nodes (no edges) keep their own id as community
        new_labels = materialize(
            labels.select("node_id")
            .join(new_labels, "node_id", "left")
            .select("node_id", F.coalesce("community", F.col("node_id")).alias("community"))
        )
        # rename instead of alias: gated_broadcast wraps its input in the
        # witness subquery alias, which would clobber a caller alias
        changed = (
            new_labels.join(
                bc(labels.withColumnRenamed("community", "_old")), "node_id"
            )
            .filter(F.col("community") != F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    # canonicalize community ids to the smallest member id so output ids are
    # stable regardless of which label happened to win propagation
    canon = labels.groupBy("community").agg(F.min("node_id").alias("canon"))
    return labels.join(canon, "community").select(
        "node_id", F.col("canon").alias("community")
    )
