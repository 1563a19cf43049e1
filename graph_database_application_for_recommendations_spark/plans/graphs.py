"""Graph construction helpers: the Spark analog of GDS graph projections
(SURVEY.md §2.1 S9-S11).

A "projected graph" here is just a pair of DataFrames (nodes, edges); the
reference's named in-memory projections map to cached temp views
(see catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected(edges: DataFrame) -> DataFrame:
    """U2 — double each edge (GDS ``orientation: 'UNDIRECTED'``,
    reference Alg_KNN_FastRP.py:43)."""
    cols = edges.columns
    flipped = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), *[c for c in cols if c not in ("src", "dst")]
    ).select(*cols)
    return edges.unionByName(flipped)


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node_id, component): connected components of an edge list,
    ``component`` = MIN node id in the component. GDS exposes this as
    ``gds.wcc``; it is also the invariant-checkable core of the iterative
    min-label machinery the community/dedup plans share — unlike LPA or
    Louvain labels, CC labels are fully determined by the graph, so the
    driver can hash-compare them against a recursive-CTE SQL oracle.

    Delegates to the hybrid local/distributed min-label solver
    (operators/dedup.py::neardup_components — numpy fixpoint under the
    driver-size gate, O(diameter)-shuffle label propagation above it).
    """
    from ..operators.dedup import neardup_components

    return neardup_components(edges, id_a=src, id_b=dst).select(
        F.col("doc_id").alias("node_id"), F.col("group_id").alias("component")
    )


def bipartite_rating_graph(ratings: DataFrame) -> tuple[DataFrame, DataFrame]:
    """S9 — the undirected weighted User–Book graph FastRP runs on
    (reference Alg_KNN_FastRP.py:28-50).

    Node ids live in one string key space (``u:<user_id>`` / ``b:<isbn>``)
    so users and books can share the embedding table.
    """
    users = ratings.select(F.concat(F.lit("u:"), F.col("user_id")).alias("node_id")).distinct()
    books = ratings.select(F.concat(F.lit("b:"), F.col("isbn")).alias("node_id")).distinct()
    nodes = users.unionByName(books)
    directed = ratings.select(
        F.concat(F.lit("u:"), F.col("user_id")).alias("src"),
        F.concat(F.lit("b:"), F.col("isbn")).alias("dst"),
        F.col("rating").cast("double").alias("weight"),
    )
    return nodes, undirected(directed)
