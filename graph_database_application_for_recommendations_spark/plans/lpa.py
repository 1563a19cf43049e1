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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    weight_col: str = "weight",
) -> DataFrame:
    """``edges`` is an undirected-doubled (src, dst, weight) edge list over
    long node ids. Returns ``(node_id, community)``.

    Each round is one shuffle (groupBy dst,label) + one window (argmax per
    node); ``localCheckpoint`` cuts lineage so round N doesn't replay
    rounds 1..N-1. The edge list is cached up front — it is re-scanned
    every round, and deriving it (e.g. the co-rating self-join) is often
    the most expensive plan in the job.
    """
    edges = edges.cache()
    labels = (
        edges.select(F.col("src").alias("node_id"))
        .union(edges.select(F.col("dst")))
        .distinct()
        .withColumn("community", F.col("node_id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        scores = (
            edges.join(
                labels.select(F.col("node_id").alias("src"), "community"), "src"
            )
            .groupBy("dst", "community")
            .agg(F.sum(weight_col).alias("score"))
        )
        w = Window.partitionBy("dst").orderBy(F.desc("score"), F.asc("community"))
        new_labels = (
            scores.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col("dst").alias("node_id"), "community")
        )
        # isolated nodes (no edges) keep their own id as community
        new_labels = (
            labels.select("node_id")
            .join(new_labels, "node_id", "left")
            .select("node_id", F.coalesce("community", F.col("node_id")).alias("community"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node_id")
            .filter(F.col("n.community") != F.col("o.community"))
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
