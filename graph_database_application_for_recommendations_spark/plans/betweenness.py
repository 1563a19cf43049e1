"""Approximate betweenness centrality — sampled Brandes over DataFrames.

Brandes' algorithm (J. Math. Sociology 2001, public) computes exact
betweenness from per-source shortest-path DAGs; the standard scalable
variant (Brandes & Pich 2007, public) runs it from a node sample and
scales by n/k. GDS ships both as ``gds.betweenness`` (samplingSize).

Distributed formulation: all k sampled sources run their BFS
*simultaneously* — state rows are (source, node, dist, sigma), so each
superstep is one equi-join of the whole frontier against the once-cached
edge list and one (source, node) aggregate, and the number of rounds is
the graph diameter, independent of k. The backward (dependency) pass
walks distance levels top-down over the pinned shortest-path DAG with the
same join shape. Nothing in either pass is wider than |state| =
k·|reachable| rows; no per-source driver loop.

Sigma (shortest-path counts) accumulates in doubles — counts grow
combinatorially and only enter the result through the sigma_u/sigma_w
ratio, which is the standard formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cache_wide


def betweenness_approx(
    edges: DataFrame,
    num_sources: int = 16,
    seed: int = 7,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 64,
) -> DataFrame:
    """(node_id, betweenness): sampled-source Brandes estimate over an
    undirected (doubled) edge list.

    ``betweenness`` is the ordered-pair dependency sum over the sampled
    sources, scaled by n/k (the Brandes-Pich unbiased estimator); for an
    undirected interpretation halve it. With ``num_sources`` ≥ n the
    estimate is *exact* Brandes (scale factor 1) — the form the unit
    tests pin against hand-computed values. Sources are a deterministic
    md5-hash sample, so results are a pure function of (graph, seed).
    """
    from ..functions.text import md5_hash60

    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    e = cache_wide(e, par, "_s")
    nodes = e.select(F.col("_s").alias("node_id")).distinct()
    n_nodes = nodes.count()
    if n_nodes == 0:
        e.unpersist(blocking=False)
        id_type = edges.schema[src].dataType.simpleString()
        return spark.createDataFrame([], f"node_id {id_type}, betweenness double")
    k = min(num_sources, n_nodes)
    sources = (
        nodes.orderBy(
            md5_hash60(F.col("node_id").cast("string"), seed), "node_id"
        )
        .limit(k)
        .select(F.col("node_id").alias("source"))
        .localCheckpoint()
    )

    # --- forward pass: multi-source BFS with path counting ---------------
    # ONE job per level (r10, guide §1.2/§2.4): the emptiness-test count
    # doubles as the cache fill, levels are pinned with plan-truncating
    # LAZY checkpoints (blocks ride the next level's job), and the
    # frontier/visited join sides — (source, node) state with exact counts
    # riding the fills — take count-gated broadcasts instead of the
    # stats-blind sort-merge a LogicalRDD otherwise plans (which re-sorted
    # the edge cache every level).
    from . import gate_node_vector_broadcast

    visited = sources.select(
        "source",
        F.col("source").alias("node_id"),
        F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint()
    levels = [visited]
    level_counts = [k]
    n_visited = k
    frontier = visited
    n_frontier = k
    for level in range(1, max_iter + 1):
        bc_f = gate_node_vector_broadcast(
            n_frontier, "Brandes frontier (source,node,sigma)", bytes_per_row=40
        )
        bc_v = gate_node_vector_broadcast(
            n_visited, "Brandes visited set (source,node)", bytes_per_row=24
        )
        nxt = (
            e.join(
                bc_f(frontier.select("source", F.col("node_id").alias("_s"), "sigma")),
                "_s",
            )
            .groupBy("source", F.col("_d").alias("node_id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(
                bc_v(visited.select("source", "node_id")),
                ["source", "node_id"],
                "left_anti",
            )
            .select("source", "node_id", F.lit(level).alias("dist"), "sigma")
        )
        # per-level states are small relative to the cluster (<= k·|V| rows
        # across ALL levels); coalesce before pinning so the accumulated
        # union doesn't collect hundreds of near-empty partitions whose
        # per-task overhead dominates the supersteps
        tmp = nxt.coalesce(max(par // 4, 1)).cache()
        n_new = tmp.count()
        if n_new == 0:
            tmp.unpersist(blocking=False)
            break
        pinned = tmp.localCheckpoint(eager=False)
        levels.append(pinned)
        level_counts.append(n_new)
        visited = visited.unionByName(pinned)
        frontier = pinned
        n_frontier = n_new
        n_visited += n_new
    max_level = len(levels) - 1

    # --- shortest-path DAG: edges (u -> w) with dist_w = dist_u + 1 ------
    u_side = visited.select(
        "source",
        F.col("node_id").alias("_s"),
        F.col("dist").alias("_du"),
        F.col("sigma").alias("_sigma_u"),
    )
    w_side = visited.select(
        "source",
        F.col("node_id").alias("_d"),
        F.col("dist").alias("_dw"),
        F.col("sigma").alias("_sigma_w"),
    )
    bc_vis = gate_node_vector_broadcast(
        n_visited, "Brandes visited state (source,node,dist,sigma)", bytes_per_row=40
    )
    dag = (
        e.join(bc_vis(u_side), "_s")
        .join(bc_vis(w_side), ["source", "_d"])
        .filter(F.col("_dw") == F.col("_du") + 1)
        .select(
            "source",
            F.col("_s").alias("u"),
            F.col("_d").alias("w"),
            "_du",
            "_dw",
            "_sigma_u",
            "_sigma_w",
        )
        .coalesce(par)
        .localCheckpoint()
    )

    # --- backward pass: dependency accumulation level by level -----------
    # delta(u) = Σ_w sigma_u/sigma_w · (1 + delta(w)) over DAG successors;
    # processing levels top-down computes each node's delta exactly once.
    # ZERO scheduled jobs per level (r10): each level's contribution is
    # pinned with a cache + plan-truncating lazy checkpoint — the caller's
    # single action on the returned aggregate materializes the whole
    # top-down chain in order (the walks-step discipline). The per-level
    # join sides are level-sized with counts recorded during the forward
    # pass, so both joins take count-gated broadcasts.
    deltas: DataFrame | None = None  # (source, node_id, delta)
    n_deltas = 0
    for level in range(max_level, 0, -1):
        w_delta = levels[level].select(
            "source", F.col("node_id").alias("w"), F.lit(0.0).alias("_z")
        )
        if deltas is not None:
            bc_d = gate_node_vector_broadcast(
                n_deltas, "Brandes delta table (source,node,delta)", bytes_per_row=32
            )
            w_delta = w_delta.join(
                bc_d(deltas.select("source", F.col("node_id").alias("w"), "delta")),
                ["source", "w"],
                "left",
            )
        else:
            w_delta = w_delta.withColumn("delta", F.lit(None).cast("double"))
        w_delta = w_delta.select(
            "source", "w", F.coalesce("delta", "_z").alias("_dw_delta")
        )
        bc_w = gate_node_vector_broadcast(
            level_counts[level], "Brandes level-delta join side", bytes_per_row=32
        )
        contrib = (
            dag.filter(F.col("_dw") == level)
            .join(bc_w(w_delta), ["source", "w"])
            .groupBy("source", F.col("u").alias("node_id"))
            .agg(
                F.sum(
                    F.col("_sigma_u")
                    / F.col("_sigma_w")
                    * (F.lit(1.0) + F.col("_dw_delta"))
                ).alias("delta")
            )
            .coalesce(max(par // 4, 1))
            .cache()
            .localCheckpoint(eager=False)
        )
        deltas = contrib if deltas is None else deltas.unionByName(contrib)
        # contribution rows are bounded by the DAG edges feeding the level:
        # at most the predecessor level's size per source-node pair side —
        # bound the broadcast gate by the accumulated level sizes
        n_deltas += level_counts[level - 1]
    e.unpersist(blocking=False)
    if deltas is None:
        id_type = edges.schema[src].dataType.simpleString()
        return spark.createDataFrame([], f"node_id {id_type}, betweenness double")
    scale = float(n_nodes) / k
    return (
        deltas.filter(F.col("node_id") != F.col("source"))
        .groupBy("node_id")
        .agg(F.round(F.sum("delta") * F.lit(scale), 6).alias("betweenness"))
    )
