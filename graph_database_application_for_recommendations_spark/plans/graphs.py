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
