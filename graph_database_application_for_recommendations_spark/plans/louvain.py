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

from . import cache_wide, gate_node_vector_broadcast, materialize, release_checkpoint
from ..functions.hints import gated_broadcast
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
    bc = gate_node_vector_broadcast(n_nodes, "louvain label table")
    labels = materialize(deg.select("node_id", F.col("node_id").alias("community")))
    stale = 0
    prev_pin: tuple[DataFrame, DataFrame] | None = None

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
        # their moves; inactive nodes keep their community. The convergence
        # signal rides along as a ``_moved`` flag so ONE job both fills the
        # new label cache and counts the moves — no separate old⋈new
        # comparison pass per sweep. (With red/black gating the moves are
        # monotone enough that a per-sweep exact-Q guard isn't worth a
        # 2-join pass over the edge list; the per-level Q guard in
        # louvain() still rejects a non-improving level.)
        flagged = (
            labels.join(chosen, "node_id", "left")
            .select(
                "node_id",
                F.coalesce("choice", "community").alias("community"),
                (
                    F.col("choice").isNotNull()
                    & (F.col("choice") != F.col("community"))
                ).alias("_moved"),
            )
            .coalesce(par)
            .cache()
        )
        changed = flagged.filter("_moved").count()
        # LAZY checkpoint: plan truncation now (the next sweep references
        # this table ~5 times — untruncated that compounds 5^sweeps), block
        # materialization riding the next sweep's fill job, which reads the
        # flagged cache filled by the count above. The superseded sweep's
        # resources are dead once this fill has run.
        new_labels = flagged.select("node_id", "community").localCheckpoint(eager=False)
        if prev_pin is not None:
            p_cache, p_ck = prev_pin
            p_cache.unpersist(blocking=False)
            p_ck.unpersist(blocking=False)
            release_checkpoint(p_ck)
        prev_pin = (flagged, new_labels)
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


def _louvain_sequential(
    src, dst, weight, max_levels: int = 10, max_sweeps: int = 20
):
    """Exact sequential Louvain on driver-local numpy edge arrays.

    Input is a directed-doubled edge list; returns ``(node_ids, community,
    q)`` with ``community`` indexed by position in ``node_ids``.

    Move rule mirrors the distributed scorer (argmax of
    k_i→c − deg_i·(tot_c − [c=c_i]·deg_i)/2m), but moves require a STRICT
    improvement over staying, so modularity is monotone non-decreasing and
    the node-ascending iteration order makes the result deterministic.
    """
    import numpy as np

    # a doubled edge list has set(dst) ⊆ set(src), so the sorted node index
    # comes from src alone (half the sort of the concatenated form) and the
    # ordinal maps from two binary searches — bit-identical to
    # np.unique(concat, return_inverse=True) since np.unique sorts. The
    # subset check is O(|E|) compares; any violation (a caller handing a
    # non-doubled list) falls back to the general form.
    node_ids = np.unique(src)
    s = np.searchsorted(node_ids, src)
    d = np.searchsorted(node_ids, dst)
    if len(node_ids) == 0 or not np.array_equal(node_ids[np.minimum(d, len(node_ids) - 1)], dst):
        node_ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        s, d = inv[: len(src)].copy(), inv[len(src) :].copy()
    n0 = len(node_ids)
    w = np.asarray(weight, dtype=np.float64)
    m2 = w.sum()
    mapping = np.arange(n0)  # original node index -> current community label
    q_best = -1.0

    for _level in range(max_levels):
        n = int(max(s.max(), d.max())) + 1 if len(s) else 0
        order = np.argsort(s, kind="stable")
        s_o, d_o, w_o = s[order], d[order], w[order]
        indptr = np.searchsorted(s_o, np.arange(n + 1))
        deg = np.bincount(s_o, weights=w_o, minlength=n)
        comm = np.arange(n)
        tot = deg.copy()

        # k_i→c scatter buffer reused across nodes (zeroed on the touched
        # slots after each node) — avoids a per-node np.unique sort, which
        # dominates the sweep at avg degree in the hundreds
        buf = np.zeros(n)
        # pruned sweeps (Ozaki et al. 2016, standard Louvain speedup):
        # sweep 1 visits every node; later sweeps only nodes adjacent to a
        # move — a node whose neighborhood didn't change almost always
        # re-makes the same decision, and the active set shrinks
        # geometrically. Processing order stays node-ascending among the
        # active set, so the result remains deterministic.
        active = np.ones(n, dtype=bool)
        for _sweep in range(max_sweeps):
            moved = 0
            next_active = np.zeros(n, dtype=bool)
            for i in np.flatnonzero(active):
                lo, hi = indptr[i], indptr[i + 1]
                if lo == hi:
                    continue
                cs = comm[d_o[lo:hi]]
                ws = w_o[lo:hi]
                np.add.at(buf, cs, ws)
                ci = comm[i]
                deg_i = deg[i]
                # candidate list may repeat a community; duplicate entries
                # carry identical gains, so argmax/tie-break are unaffected
                gain = buf[cs] - deg_i * (tot[cs] - (cs == ci) * deg_i) / m2
                # staying scores k_i→ci (0 if no edge into own community)
                # with the own-degree correction applied
                stay_gain = buf[ci] - deg_i * (tot[ci] - deg_i) / m2
                maxg = gain.max()
                buf[cs] = 0.0
                if maxg > stay_gain:
                    cb = int(cs[gain == maxg].min())  # ties -> smallest id
                    if cb != ci:
                        tot[ci] -= deg_i
                        tot[cb] += deg_i
                        comm[i] = cb
                        moved += 1
                        next_active[d_o[lo:hi]] = True
                        next_active[i] = True
            if moved == 0:
                break
            active = next_active

        # modularity of this level's partition (on the coarse graph == on
        # the original graph, coarsening preserves Q)
        in_c = np.bincount(comm[s_o], weights=w_o * (comm[s_o] == comm[d_o]), minlength=n)
        tot_c = np.bincount(comm[s_o], weights=w_o, minlength=n)
        q = in_c.sum() / m2 - (tot_c**2).sum() / (m2 * m2)
        if q <= q_best + 1e-9:
            break
        q_best = q
        # relabel communities densely, compose mapping, coarsen edges
        uniq, comp = np.unique(comm, return_inverse=True)
        mapping = comp[mapping]
        key = comp[s] * len(uniq) + comp[d]
        if len(uniq) * len(uniq) <= max(4 * len(key), 1 << 22):
            # dense label-pair grid: one bincount pass instead of sorting
            # the |E|-long key array through np.unique. Both forms sum the
            # weights in original array order (bincount and
            # bincount-over-inverse are the same accumulation), so the
            # coarse weights are bit-identical.
            wsum = np.bincount(key, weights=w, minlength=len(uniq) * len(uniq))
            # presence from an unweighted count so zero-weight pairs keep
            # their row exactly like the np.unique form would
            uk = np.flatnonzero(np.bincount(key, minlength=len(uniq) * len(uniq)))
            w = wsum[uk]
        else:
            uk, pos = np.unique(key, return_inverse=True)
            w = np.bincount(pos, weights=w)
        s, d = uk // len(uniq), uk % len(uniq)
        if len(uniq) == n:  # no contraction -> converged
            break

    return node_ids, mapping, q_best


def _coarsen(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Contract communities to supernodes; intra edges become self-loops."""
    labels = gate_node_vector_broadcast(labels.count(), "coarsening label table")(labels)
    src_map = labels.select(F.col("node_id").alias("src"), F.col("community").alias("c_src"))
    dst_map = labels.select(F.col("node_id").alias("dst"), F.col("community").alias("c_dst"))
    return (
        edges.join(src_map, "src")
        .join(dst_map, "dst")
        .groupBy(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )


def louvain(
    edges: DataFrame, max_levels: int = 3, max_sweeps: int = 5,
    local_threshold: int = 5_000_000,
) -> tuple[DataFrame, float]:
    """Full Louvain: returns ((node_id, community), modularity).

    ``edges``: undirected-doubled (src, dst, weight). Community ids are
    canonicalized to the smallest member node id.

    Hybrid coarsening (the standard shape in the distributed-Louvain
    literature): any level whose edge list fits the driver
    (≤ ``local_threshold`` rows, ~24 B/row) collects and runs the EXACT
    sequential algorithm locally — better modularity than synchronous
    sweeps, and it trades dozens of small Spark jobs for one numpy loop.
    Levels above the threshold run the distributed synchronous local-move;
    coarsening shrinks the graph geometrically, so even with a 100 TB
    input only level 0 (and rarely level 1) is distributed — the level-1
    supernode graph is usually thousands of nodes.
    """
    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    if not (local_threshold and edges.count() <= local_threshold):
        # hash-partition the edge cache on src: every per-sweep aggregate
        # downstream groups on src or (src, c) after broadcast joins that
        # preserve the probe side's partitioning, and HashPartitioning(src)
        # satisfies both clustered distributions — so the sweeps' dominant
        # k_i→c aggregation and the per-node argmax both run exchange-free,
        # every sweep, for one setup shuffle (same strategy as FastRP's
        # dst-partitioned cache). Skipped when level 0 solves locally —
        # the local path reads the edges exactly once.
        edges = cache_wide(edges, par, "src")
    mapping: DataFrame | None = None  # original node_id -> current community
    cur_edges = edges
    prev_q = float("-inf")

    for level in range(max_levels):
        if local_threshold and cur_edges.count() <= local_threshold:
            pdf = cur_edges.toPandas()
            node_ids, comm_idx, q_local = _louvain_sequential(
                pdf["src"].to_numpy(),
                pdf["dst"].to_numpy(),
                pdf["weight"].to_numpy(),
                max_levels=max_levels - level,
                max_sweeps=max_sweeps,
            )
            if q_local > prev_q + 1e-9:
                import pandas as pd

                local_map = spark.createDataFrame(
                    pd.DataFrame(
                        {"community_prev": node_ids, "community": comm_idx}
                    ).astype("int64")
                )
                if mapping is None:
                    # level 0 is itself driver-sized: the sequential solve
                    # IS the whole algorithm (community_prev = node_id)
                    mapping = materialize(
                        local_map.select(
                            F.col("community_prev").alias("node_id"), "community"
                        )
                    )
                else:
                    # left join: every supernode appears in the coarse edge
                    # list (coarsening keeps self-loops), but if one ever
                    # slipped through it must keep its old community rather
                    # than vanish from the result. Offset local labels so the
                    # two label spaces cannot collide.
                    offset = int(mapping.agg(F.max("community")).collect()[0][0]) + 1
                    mapping = materialize(
                        mapping.join(
                            gated_broadcast(
                                local_map,
                                "driver-local numpy phase output: bounded "
                                "by the coarse graph the gated hybrid "
                                "already pulled to the driver",
                            ),
                            mapping.community == F.col("community_prev"),
                            "left",
                        ).select(
                            mapping.node_id,
                            F.coalesce(
                                local_map.community + F.lit(offset), mapping.community
                            ).alias("community"),
                        ),
                        supersedes=mapping,
                    )
                prev_q = q_local
            break
        labels = _local_move(cur_edges, max_sweeps)
        first_level = mapping is None
        composed = (
            labels
            if first_level
            else mapping.join(
                # the coarse-level label table shrinks every level — hint it
                # while broadcastable
                gate_node_vector_broadcast(labels.count(), "coarse-level labels")(labels)
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
    canon = gate_node_vector_broadcast(canon.count(), "canonical community ids")(canon)
    final = mapping.join(canon, "community").select(
        "node_id", F.col("canon").alias("community")
    )
    return final, prev_q
