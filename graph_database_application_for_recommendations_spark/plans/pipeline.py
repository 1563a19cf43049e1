"""The precompute-then-serve pipeline (SURVEY.md §3 EP3).

Reference flow (``algorithms/Alg_KNN_FastRP.py:140-163`` and
``Alg_Community_Detection.py:53-60``): project graph → FastRP write-back →
KNN write-back → Louvain write-back; serving queries then read the
precomputed properties. GDS "write-back into the database" maps to
materialized parquet tables; each serving query reads them like the
reference's Cypher reads node properties.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corating import corating_edges
from ..operators.knn import knn_exact, knn_hyperplane
from ..sources.views import load_ref_tables
from . import fastrp as _fastrp
from . import lpa as _lpa
from .graphs import bipartite_rating_graph, undirected
from .modularity import modularity


@dataclass
class PipelineResult:
    embeddings: DataFrame  # (user_id, embedding)
    similar_to: DataFrame  # (src, dst, similarity)
    communities: DataFrame  # (user_id, community)
    modularity: float


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str | None = None,
    dim: int = 64,
    knn_top_k: int = 20,
    knn_cutoff: float = 0.8,
    lpa_max_iter: int = 10,
    seed: int = 42,
    knn_lsh_threshold: int = 8000,
    community_algorithm: str = "lpa",
) -> PipelineResult:
    """End-to-end algorithm pipeline over the reference-shaped tables.

    KNN parameters default to the reference call site
    (Alg_KNN_FastRP.py:158: topK=20, cutoff=0.8) — meaningful here because
    FastRP embeddings of co-rated users genuinely exceed 0.8 cosine, unlike
    the driver's random test embeddings.

    Physical strategy switch: beyond ``knn_lsh_threshold`` users, the
    O(n²) exact KNN becomes the dominant cost, so the pipeline moves to
    the LSH candidate join (same output contract, approximate recall) —
    the same call the reference makes is itself approximate (GDS KNN is
    NN-descent, not exhaustive).
    """
    ref = load_ref_tables(spark, sf_dir)
    ratings = ref.ratings

    # G2: FastRP on the undirected weighted bipartite graph (S9)
    nodes, edges = bipartite_rating_graph(ratings)
    emb_all = _fastrp.fastrp(nodes, edges, dim=dim, seed=seed)
    user_emb = _fastrp.user_embeddings_from_fastrp(emb_all)

    # G3: KNN over the user embeddings (S11 + J8)
    user_emb = user_emb.cache()
    knn_fn = knn_exact if user_emb.count() <= knn_lsh_threshold else knn_hyperplane
    sim = knn_fn(user_emb, id_col="user_id", vec_col="embedding",
                 top_k=knn_top_k, cutoff=knn_cutoff)

    # G1: community detection on the co-rating projection (S10 + J3) —
    # 'louvain' matches the reference algorithm (Alg_Community_Detection.py),
    # 'lpa' is the cheaper default with the same interface
    co = corating_edges(ratings).select(
        F.col("u1").alias("src"), F.col("u2").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )
    if community_algorithm == "louvain":
        from .louvain import louvain

        nodes_comm, q = louvain(co)
        comm = nodes_comm.select(F.col("node_id").alias("user_id"), "community")
    else:
        comm = _lpa.label_propagation(co, max_iter=lpa_max_iter).select(
            F.col("node_id").alias("user_id"), "community"
        )
        q = modularity(co, comm.select(F.col("user_id").alias("node_id"), "community"))

    if out_dir:
        user_emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings_users.parquet")
        sim.write.mode("overwrite").parquet(f"{out_dir}/similar_to.parquet")
        comm.write.mode("overwrite").parquet(f"{out_dir}/communities.parquet")

    return PipelineResult(user_emb, sim, comm, q)
