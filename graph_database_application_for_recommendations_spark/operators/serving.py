"""UI-facing serving queries (SURVEY.md §2.8: q_rated_books,
q_community_members — reference ``streamlit_app.py``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hints import gated_broadcast


def rated_books(ratings: DataFrame, books: DataFrame, user_id: int) -> DataFrame:
    """P4+J1+T3 — one user's rated books, best first.

    Reference ``streamlit_app.py:33-46``::

        MATCH (u:User {id:$userId})-[r:RATED]->(b:Book)
        RETURN b.title AS title, b.author AS author, r.rating AS rating
        ORDER BY r.rating DESC

    Point-lookup filter is pushed into the parquet scan by Catalyst; the
    books dim is broadcast. Tie-break (title, author) added for determinism.
    """
    return (
        ratings.filter(F.col("user_id") == user_id)
        .join(gated_broadcast(books, "dimension leaf: books metadata table, "
                              "small vs the ratings fact side by data model"), "isbn")
        .select("title", "author", "rating")
        .orderBy(F.desc("rating"), F.asc("title"), F.asc("author"))
    )


def community_members(users_with_community: DataFrame, min_size: int = 2) -> DataFrame:
    """A4+A5+U1+T3 — members of communities with more than one user.

    Reference ``streamlit_app.py:15-30``::

        MATCH (u:User) WHERE u.community IS NOT NULL
        WITH u.community AS communityId, COLLECT(u) AS users, COUNT(u) AS size
        WHERE size > 1
        UNWIND users AS user
        RETURN communityId, user.id AS userId ORDER BY communityId, userId

    COLLECT+UNWIND round-trips through an array; relationally that's a
    windowed count — same rows, no array materialization, and it keeps the
    result flat (documented deviation: we also return the community size).
    """
    w = Window.partitionBy("community")
    return (
        users_with_community.filter(F.col("community").isNotNull())
        .withColumn("size", F.count(F.lit(1)).over(w))
        .filter(F.col("size") >= min_size)
        .select(
            F.col("community").alias("communityId"),
            F.col("user_id").alias("userId"),
            F.col("size").cast("long").alias("size"),
        )
        .orderBy("communityId", "userId")
    )
