#!/usr/bin/env python
"""Capture representative ROUND plans for the loop-internal iterative
shapes (LFMIS decision rounds, min-label CC sweeps, Brandes BFS levels).

The registry-level capture (capture_plans.py) only sees the final
checkpoint-backed table (a Scan ExistingRDD), so the per-round plan —
where the join strategies and job shapes actually live — is rebuilt here
EXACTLY the way the loop builds it: every loop-carried table enters the
round as a localCheckpoint-backed LogicalRDD (stats-less), the pinned
edge/corpus cache enters as the cached frame, and the round body is the
same expression the loop runs.

Usage: python scripts/capture_iter_rounds.py <suffix>
Writes plans/r10/{lfmis_round,cc_round,betweenness_level}_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

from graph_database_application_for_recommendations_spark.session import get_spark
from graph_database_application_for_recommendations_spark.sources.tables import load_table  # noqa: F401


def explain_str(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def write(out_dir, name, suffix, header, plan):
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(header + "\n\n")
        f.write(plan)
    print("wrote", path, flush=True)


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gdar-round-plans")
    spark.sparkContext.setLogLevel("ERROR")
    from graph_database_application_for_recommendations_spark.operators import dedup
    from graph_database_application_for_recommendations_spark.plans import materialize

    # --- corpus-derived duplicate graph (the q_ingest_neardup shape) ------
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id"), F.col("text")
    )
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", 32, 8, 3, 0.5)
    edges = materialize(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    )
    ids = materialize(docs.select("doc_id"))
    n_ids = ids.count()

    # --- one LFMIS round, as greedy_first_writer builds it ----------------
    # loop-carried state: undecided (all ids, round-1 state) and kept
    # (empty limit(0) in round 1; a pinned slice in later rounds — use a
    # pinned non-empty slice so the kept-side join is representative)
    undecided = materialize(ids.select("doc_id"))
    kept = materialize(ids.select("doc_id").limit(32))
    n_kept = kept.count()
    try:
        from graph_database_application_for_recommendations_spark.plans import (
            gate_node_vector_broadcast,
        )

        bc_u = gate_node_vector_broadcast(n_ids, "LFMIS undecided id set", bytes_per_row=16)
        bc_k = gate_node_vector_broadcast(max(n_kept, 1), "LFMIS kept id set", bytes_per_row=16)
        gated = True
    except Exception:
        gated = False
    if "--gated" in sys.argv and gated:
        ua = bc_u(undecided.select(F.col("doc_id").alias("a")))
        ka = bc_k(kept.select(F.col("doc_id").alias("a")))
    else:
        ua = undecided.select(F.col("doc_id").alias("a"))
        ka = kept.select(F.col("doc_id").alias("a"))
    pending = edges.join(ua, "a", "semi").select(F.col("b").alias("doc_id")).distinct()
    frontier = undecided.join(pending, "doc_id", "left_anti")
    killed = edges.join(ka, "a", "semi").select(F.col("b").alias("doc_id")).distinct()
    new_kept = kept.unionByName(frontier.join(killed, "doc_id", "left_anti"))
    write(
        out_dir,
        "lfmis_round",
        suffix,
        "# ONE LFMIS decision round (greedy_first_writer), inputs pinned as\n"
        "# the loop pins them (edges/undecided/kept all LogicalRDD).",
        explain_str(new_kept),
    )

    # --- one min-label CC sweep round (neardup_components distributed) ----
    if "--gated" in sys.argv:
        # the r10 loop partitions the doubled edge cache on the aggregate key
        from graph_database_application_for_recommendations_spark.plans import (
            cache_wide as _cw,
        )

        und = _cw(
            edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b"))),
            spark.sparkContext.defaultParallelism,
            "b",
        )
    else:
        und = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        und = und.cache()
        und.count()
    labels = materialize(
        und.select(F.col("a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("group_id"))
    )
    n_nodes = labels.count()
    if "--gated" in sys.argv:
        bc_l = gate_node_vector_broadcast(n_nodes, "CC label table", bytes_per_row=16)
    else:
        bc_l = lambda df: df  # noqa: E731
    neigh = (
        und.join(bc_l(labels.withColumnRenamed("doc_id", "a")), "a")
        .groupBy(F.col("b").alias("doc_id"))
        .agg(F.min("group_id").alias("neigh_min"))
    )
    stepped = labels.join(bc_l(neigh), "doc_id", "left").select(
        "doc_id",
        F.least(F.col("group_id"), F.coalesce("neigh_min", F.col("group_id"))).alias(
            "group_id"
        ),
    )
    new_labels = (
        stepped.alias("x")
        .join(
            bc_l(
                stepped.select(
                    F.col("doc_id").alias("group_id"), F.col("group_id").alias("_gg")
                )
            ),
            "group_id",
            "left",
        )
        .select(
            "doc_id",
            F.least(F.col("group_id"), F.coalesce("_gg", F.col("group_id"))).alias(
                "group_id"
            ),
        )
    )
    write(
        out_dir,
        "cc_round",
        suffix,
        "# ONE min-label + pointer-jump sweep round (neardup_components,\n"
        "# distributed path), labels entering as the loop pins them.",
        explain_str(new_labels),
    )

    # --- one Brandes forward BFS level (betweenness_approx) ---------------
    from graph_database_application_for_recommendations_spark.plans import cache_wide

    from graph_database_application_for_recommendations_spark.registry import (
        COMPONENTS_MIN_WEIGHT,
        _corating_double,
    )

    e2 = _corating_double(spark, sf_dir).filter(
        F.col("weight") >= COMPONENTS_MIN_WEIGHT
    )
    par = spark.sparkContext.defaultParallelism
    e = cache_wide(
        e2.select(F.col("src").alias("_s"), F.col("dst").alias("_d")), par, "_s"
    )
    sources = (
        e.select(F.col("_s").alias("source")).distinct().limit(16).localCheckpoint()
    )
    visited = sources.select(
        "source",
        F.col("source").alias("node_id"),
        F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    ).localCheckpoint()
    n_f = visited.count()
    frontier = visited
    if "--gated" in sys.argv:
        bc_f = gate_node_vector_broadcast(n_f, "Brandes frontier", bytes_per_row=40)
        bc_v = gate_node_vector_broadcast(n_f, "Brandes visited set", bytes_per_row=24)
    else:
        bc_f = lambda df: df  # noqa: E731
        bc_v = lambda df: df  # noqa: E731
    nxt = (
        e.join(
            bc_f(frontier.select("source", F.col("node_id").alias("_s"), "sigma")),
            "_s",
        )
        .groupBy("source", F.col("_d").alias("node_id"))
        .agg(F.sum("sigma").alias("sigma"))
        .join(
            bc_v(visited.select("source", "node_id")), ["source", "node_id"], "left_anti"
        )
        .select("source", "node_id", F.lit(1).alias("dist"), "sigma")
    )
    write(
        out_dir,
        "betweenness_level",
        suffix,
        "# ONE Brandes forward BFS level (betweenness_approx), frontier and\n"
        "# visited entering as the loop pins them.",
        explain_str(nxt),
    )


if __name__ == "__main__":
    main()
