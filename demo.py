#!/usr/bin/env python
"""Interactive demo driver — the Spark analog of the reference's Streamlit
app (``streamlit_app.py``): pick an algorithm, get recommendations +
similar users + a viz-ready graph export, with per-request wall-clock like
the reference's UI timer (streamlit_app.py:80-87,114).

Usage:
    python demo.py [--sf-dir /root/testdata/sf0.001] [--user 1]
                   [--algorithm knn|community|both]
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--user", type=int, default=1)
    ap.add_argument("--algorithm", choices=["knn", "community", "both"], default="both")
    args = ap.parse_args()

    from graph_database_application_for_recommendations_spark.plans.pipeline import run_pipeline
    from graph_database_application_for_recommendations_spark.recommender import get_recommender
    from graph_database_application_for_recommendations_spark.session import get_spark

    spark = get_spark("gdar-demo")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"== algorithm pipeline (FastRP → KNN → communities) over {args.sf_dir}")
    t0 = time.time()
    pipe = run_pipeline(spark, args.sf_dir, knn_cutoff=0.6, community_algorithm="louvain")
    print(
        f"   similar_to edges: {pipe.similar_to.count()}, "
        f"communities: {pipe.communities.select('community').distinct().count()}, "
        f"modularity: {pipe.modularity:.4f}  [{time.time() - t0:.1f}s]"
    )

    algos = ["knn", "community"] if args.algorithm == "both" else [args.algorithm]
    for algo in algos:
        rec = get_recommender(spark, args.sf_dir, algo, pipeline=pipe)
        print(f"\n== {algo} recommender, user {args.user}")
        t0 = time.time()
        for book in rec.recommend_books(args.user):
            print(f"   recommend: {book}")
        for user in rec.get_similar_users(args.user):
            print(f"   similar:   {user}")
        graph = rec.get_graph_data(args.user)
        print(f"   graph rows: {len(graph)}")
        print(f"   recommendation round-trip: {time.time() - t0:.2f}s")

        # graph visualization HTML, like streamlit_app.py:99-108
        from graph_database_application_for_recommendations_spark.operators import recommend as _rec_ops
        from graph_database_application_for_recommendations_spark.sources.views import load_ref_tables
        from graph_database_application_for_recommendations_spark.viz import write_html

        ref = load_ref_tables(spark, args.sf_dir)
        if algo == "knn":
            gdf = _rec_ops.graph_data_knn(pipe.similar_to, ref.ratings, ref.books, args.user)
            nodes, edges = _rec_ops.viz_export_knn(gdf)
        else:
            gdf = _rec_ops.graph_data_community(
                ref.users.join(pipe.communities, "user_id", "left"),
                ref.ratings, ref.books, args.user,
            )
            nodes, edges = _rec_ops.viz_export(gdf)
        out = write_html(nodes, edges, f"viz_{algo}_user{args.user}.html",
                         title=f"{algo} recommendations for user {args.user}")
        print(f"   graph HTML: {out}")

    spark.stop()


if __name__ == "__main__":
    main()
