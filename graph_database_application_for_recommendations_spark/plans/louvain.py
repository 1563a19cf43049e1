"""Distributed Louvain community detection (SURVEY.md §2.7 G1).

Reference: Neo4j GDS ``gds.louvain.write`` on the weighted user–user
co-rating graph (``algorithms/Alg_Community_Detection.py:36-50``).

Louvain's classic local-move phase is sequential; the distributed
formulation here follows the parallel-Louvain literature (synchronous
local moves + graph coarsening — e.g. "Distributed Louvain" / Spark-GraphX
community implementations, public):

1. **Local move (synchronous red/black sweeps).** Every node evaluates
   moving to a neighboring community, scoring the standard modularity gain
   ΔQ ∝ k_i→c − deg_i · tot_c / 2m (ties → smallest community id). Only
   half the nodes (hash parity, alternating per sweep) apply their move —
   the red/black gating from the parallel-Louvain literature that prevents
   the symmetric-swap oscillation of fully synchronous moves. A modularity
   guard keeps the best sweep's assignment.
2. **Coarsen.** Communities contract to supernodes (intra-community weight
   becomes a self-loop), and the local-move phase repeats on the coarse
   graph, composing the mapping back to original nodes, until modularity
   stops improving or ``max_levels`` is reached.

Every step is joins + groupBys over (node, community, weight) tuples —
shuffle-partitioned, no driver-side per-node state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cache_wide, materialize
from .modularity import modularity


def _local_move(edges: DataFrame, max_sweeps: int) -> DataFrame:
    """One Louvain phase on ``edges`` (undirected-doubled src,dst,weight).

    Returns (node_id, community); keeps the best-modularity assignment
    across sweeps.

    Physical note: per-sweep label/degree tables come out of
    ``plans.materialize`` as LogicalRDDs with no size stats, which Catalyst
    will never auto-broadcast. Left un-hinted, every sweep's
    edges ⋈ labels join plans as a sort-merge join that re-shuffles the
    whole edge list. We gate an explicit broadcast on the node count
    (node tables are |V|, tiny next to |E|); graphs too big to broadcast
    fall back to the shuffle join.
    """
    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    m2 = edges.agg(F.sum("weight")).collect()[0][0]
    deg = (
        edges.groupBy("src").agg(F.sum("weight").alias("deg"))
        .withColumnRenamed("src", "node_id")
        .coalesce(par)
        .cache()
    )
    n_nodes = deg.count()
    bc = (lambda df: F.broadcast(df)) if n_nodes * 24 < 256 * 1024 * 1024 else (lambda df: df)
    labels = materialize(deg.select("node_id", F.col("node_id").alias("community")))
    stale = 0

    for sweep in range(max_sweeps):
        dst_comm = labels.select(
            F.col("node_id").alias("dst"), F.col("community").alias("c")
        )
        # red/black gating: only nodes whose hash parity matches this sweep
        # may move — filtering the edge list on src parity BEFORE the
        # per-sweep join halves the sweep's dominant shuffle/agg (the
        # inactive half's argmax would be computed and then discarded)
        active_edges = edges.filter(
            F.pmod(F.hash("src"), F.lit(2)) == (sweep % 2)
        )
        # k_i→c: weight from node i into community c (self-loops count into
        # the node's own community like GDS does)
        k_ic = (
            active_edges.join(bc(dst_comm), "dst")
            .groupBy(F.col("src").alias("node_id"), "c")
            .agg(F.sum("weight").alias("k_ic"))
        )
        tot = labels.join(bc(deg), "node_id").groupBy("community").agg(
            F.sum("deg").alias("tot")
        )
        cand = (
            k_ic.join(bc(tot), k_ic.c == tot.community)
            .join(bc(deg), "node_id")
            .join(bc(labels.select("node_id", F.col("community").alias("c_own"))), "node_id")
            .select(
                "node_id",
                "c",
                "c_own",
                # remove own degree from tot when evaluating the current
                # community (standard ΔQ bookkeeping)
                (
                    F.col("k_ic")
                    - F.col("deg")
                    * (
                        F.col("tot")
                        - F.when(F.col("c") == F.col("c_own"), F.col("deg")).otherwise(F.lit(0.0))
                    )
                    / F.lit(m2)
                ).alias("gain"),
            )
        )
        # argmax via hash aggregate, not a row_number() sort-window: the
        # aggregate gets a map-side partial combine and skips the per-sweep
        # full sort of the candidate table (tie-break gain desc, c asc —
        # node/community ids are numeric, so max(-c) == min(c))
        chosen = (
            cand.groupBy("node_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("gain"),
                        (-F.col("c")).alias("_neg_c"),
                        F.col("c").alias("choice"),
                    )
                ).alias("best")
            )
            .select("node_id", F.col("best.choice").alias("choice"))
        )
        # ``chosen`` only contains this sweep's active-parity nodes (the
        # edge prefilter above), so a left join + coalesce applies exactly
        # their moves; inactive nodes keep their community
        new_labels = (
            labels.join(chosen, "node_id", "left")
            .select(
                "node_id",
                F.coalesce("choice", "community").alias("community"),
            )
            .coalesce(par)
        )
        new_labels = materialize(new_labels)
        # convergence = no label changed; cheap count on the (small,
        # materialized) label tables instead of a full-edge modularity
        # evaluation per sweep — with red/black gating the moves are
        # monotone enough that the per-sweep exact-Q guard isn't worth a
        # 2-join pass over the edge list (the per-level Q guard in
        # louvain() still rejects a non-improving level)
        changed = (
            new_labels.alias("n")
            .join(bc(labels.alias("o")), "node_id")
            .filter(F.col("n.community") != F.col("o.community"))
            .count()
        )
        labels.unpersist(blocking=False)
        labels = new_labels
        if changed == 0:
            # a half-sweep may be flat while the other half still has
            # moves; stop only after both parities stall
            stale += 1
            if stale >= 2:
                break
        else:
            stale = 0

    return labels


def _coarsen(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Contract communities to supernodes; intra edges become self-loops."""
    if labels.count() * 24 < 256 * 1024 * 1024:
        labels = F.broadcast(labels)
    src_map = labels.select(F.col("node_id").alias("src"), F.col("community").alias("c_src"))
    dst_map = labels.select(F.col("node_id").alias("dst"), F.col("community").alias("c_dst"))
    return (
        edges.join(src_map, "src")
        .join(dst_map, "dst")
        .groupBy(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )


def louvain(
    edges: DataFrame, max_levels: int = 3, max_sweeps: int = 5
) -> tuple[DataFrame, float]:
    """Full Louvain: returns ((node_id, community), modularity).

    ``edges``: undirected-doubled (src, dst, weight). Community ids are
    canonicalized to the smallest member node id.
    """
    par = edges.sparkSession.sparkContext.defaultParallelism
    edges = cache_wide(edges, par)
    mapping: DataFrame | None = None  # original node_id -> current community
    cur_edges = edges
    prev_q = float("-inf")

    for _ in range(max_levels):
        labels = _local_move(cur_edges, max_sweeps)
        first_level = mapping is None
        composed = (
            labels
            if first_level
            else mapping.join(
                # the coarse-level label table shrinks every level — hint it
                # while broadcastable
                (F.broadcast(labels) if labels.count() * 24 < 256 * 1024 * 1024 else labels)
                .withColumnRenamed("node_id", "community_prev"),
                mapping.community == F.col("community_prev"),
            ).select(mapping.node_id, labels.community)
        )
        q = modularity(
            edges, composed.select("node_id", "community")
        )
        if q <= prev_q + 1e-9:
            break
        prev_q, mapping = q, materialize(composed, supersedes=mapping)
        prev_edges = cur_edges
        cur_edges = materialize(_coarsen(cur_edges, labels))
        # this level's labels and edge list are dead once the coarse graph
        # and composed mapping are pinned (first level: composed IS labels,
        # which now backs the mapping — keep it)
        if not first_level:
            labels.unpersist(blocking=False)
        if prev_edges is not edges:
            prev_edges.unpersist(blocking=False)

    assert mapping is not None
    canon = mapping.groupBy("community").agg(F.min("node_id").alias("canon"))
    if canon.count() * 24 < 256 * 1024 * 1024:
        canon = F.broadcast(canon)
    final = mapping.join(canon, "community").select(
        "node_id", F.col("canon").alias("community")
    )
    return final, prev_q
