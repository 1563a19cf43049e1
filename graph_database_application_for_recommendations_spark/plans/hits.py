"""HITS hubs & authorities over the bipartite positive-rating graph.

Kleinberg's HITS (JACM 1999, public) on user→book edges: users are hubs,
books are authorities — a natural recommendation signal the symmetric
co-rating projection cannot express (on a symmetric graph HITS collapses
to eigenvector centrality, which ``plans/eigenvector.py`` already covers;
the bipartite form is the one GDS ships as ``gds.alpha.hits``).

Round shape: the edge list is cached TWICE, hash-partitioned on user_id
and on isbn — the classic space-for-shuffle trade — so BOTH half-round
aggregates (authority = Σ over in-edges of hub scores, grouped by isbn;
hub = Σ of authority scores, grouped by user_id) consume a broadcast
score vector and group on their cache's own partitioning key:
zero per-round shuffles, mirroring the pagerank/eigenvector contract.
Each half-round L2-normalizes with a scalar aggregate that doubles as
the cache-fill action (the eigenvector fold).

Like pagerank, the broadcast-vector round assumes the score vector fits
the broadcast threshold (fine to ~10⁷ nodes per side); past that, drop
the ``F.broadcast`` hint and the same code becomes a shuffle join on the
cache's partitioning key, which the co-partitioned caches still serve
without re-exchanging the edge side.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cache_wide, gate_node_vector_broadcast, release_checkpoint


def hits(
    edges: DataFrame,
    iters: int = 8,
    hub_col: str = "user_id",
    auth_col: str = "isbn",
) -> DataFrame:
    """(kind, id, score): 'hub' rows keyed by ``hub_col`` and 'authority'
    rows keyed by ``auth_col`` after ``iters`` rounds of
    a ← normalize(Eᵀh); h ← normalize(E a), from the uniform unit hub
    vector. Ids are cast to string so both sides share one schema; scores
    rounded to 6dp (sum-order differences are far below the rounding
    grain, so the result is engine-reproducible — oracle-checked).
    """
    spark = edges.sparkSession
    par = spark.sparkContext.defaultParallelism
    e = edges.select(F.col(hub_col).alias("_h"), F.col(auth_col).alias("_a")).distinct()
    e_by_hub = cache_wide(e, par, "_h")
    e_by_auth = cache_wide(e, par, "_a")
    hubs = e_by_hub.select("_h").distinct()
    n_hubs = hubs.count()
    if n_hubs == 0:
        e_by_hub.unpersist(blocking=False)
        e_by_auth.unpersist(blocking=False)
        return spark.createDataFrame([], "kind string, id string, score double")
    h = hubs.select("_h", F.lit(1.0 / math.sqrt(n_hubs)).alias("_s"))
    # both vectors are re-broadcast every half-round; gate each on its own
    # side's node count (louvain's 256 MB gate — round-8 VERDICT item 2).
    # ids are strings here, so budget a fatter row than the long-keyed trio.
    # n_auths comes from the FIRST half-round's checkpointed output (one
    # row per authority) — a cheap local scan, where a dedicated
    # distinct().count() would shuffle the edge cache once per call
    # (round-9 code review).
    bc_hub = gate_node_vector_broadcast(n_hubs, "HITS hub vector", bytes_per_row=48)
    bc_auth = None
    a = None
    prev_a: tuple[DataFrame, DataFrame] | None = None
    prev_h: tuple[DataFrame, DataFrame] | None = None

    def _half(edge_cache: DataFrame, vec: DataFrame, join_key: str, group_key: str, bc, prev):
        """One half-round in ONE job (the r9 shape paid two): the combined
        count+Σ_s² aggregate is the cache-fill action for the raw sum table
        (count feeds the first iteration's authority-side broadcast gate,
        Σ_s² the normalizer), and the normalized view is pinned with a LAZY
        localCheckpoint — plan truncation is immediate (without it the
        analyzer cost on the alternating half-round chain compounds ~3x per
        round: measured 1.4s → 150s by iteration 6 on sf0.001), while the
        block materialization rides the NEXT half-round's fill job. ``prev``
        is this side's previous (raw cache, out checkpoint) pair — its out
        was first materialized by the opposite side's fill in between, so
        both are dead by the time this side runs again. The final ``a``/``h``
        caches stay: they back the returned rows."""
        raw = (
            edge_cache.join(bc(vec), join_key)
            .groupBy(group_key)
            .agg(F.sum("_s").alias("_s"))
        ).cache()
        row = raw.agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_s") * F.col("_s")).alias("_nsq"),
        ).first()
        norm = math.sqrt(row["_nsq"])
        out = raw.select(group_key, (F.col("_s") / F.lit(norm)).alias("_s")).localCheckpoint(
            eager=False
        )
        if prev is not None:
            prev_raw, prev_out = prev
            prev_raw.unpersist(blocking=False)
            prev_out.unpersist(blocking=False)
            release_checkpoint(prev_out)
        return out, raw, row["_n"]

    for _ in range(iters):
        a, a_raw, n_a = _half(e_by_auth, h, "_h", "_a", bc_hub, prev_a)
        prev_a = (a_raw, a)
        if bc_auth is None:
            bc_auth = gate_node_vector_broadcast(
                n_a, "HITS authority vector", bytes_per_row=48
            )
        h, h_raw, _ = _half(e_by_hub, a, "_a", "_h", bc_auth, prev_h)
        prev_h = (h_raw, h)
    e_by_hub.unpersist(blocking=False)
    e_by_auth.unpersist(blocking=False)
    return (
        h.select(
            F.lit("hub").alias("kind"),
            F.col("_h").cast("string").alias("id"),
            F.round("_s", 6).alias("score"),
        )
        .unionByName(
            a.select(
                F.lit("authority").alias("kind"),
                F.col("_a").cast("string").alias("id"),
                F.round("_s", 6).alias("score"),
            )
        )
    )
