"""Louvain invariants (SURVEY.md §5: assert partition quality, not ids)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_application_for_recommendations_spark.plans.graphs import undirected
from graph_database_application_for_recommendations_spark.plans.louvain import louvain
from graph_database_application_for_recommendations_spark.plans.lpa import label_propagation
from graph_database_application_for_recommendations_spark.plans.modularity import modularity


@pytest.fixture(scope="module")
def three_cliques(spark):
    edges = []
    for clique in ([1, 2, 3, 4], [11, 12, 13, 14], [21, 22, 23, 24]):
        for i in clique:
            for j in clique:
                if i < j:
                    edges.append((i, j, 10.0))
    edges += [(4, 11, 1.0), (14, 21, 1.0)]  # weak bridges
    return undirected(spark.createDataFrame(edges, "src LONG, dst LONG, weight DOUBLE"))


def test_louvain_separates_cliques(spark, three_cliques):
    comm, q = louvain(three_cliques)
    got = {r["node_id"]: r["community"] for r in comm.collect()}
    assert set(got) == {1, 2, 3, 4, 11, 12, 13, 14, 21, 22, 23, 24}
    groups = [{got[i] for i in c} for c in ([1, 2, 3, 4], [11, 12, 13, 14], [21, 22, 23, 24])]
    assert all(len(g) == 1 for g in groups)
    assert len({next(iter(g)) for g in groups}) == 3
    assert q == pytest.approx(0.6557, abs=0.01)


def test_louvain_distributed_path_separates_cliques(spark, three_cliques):
    """local_threshold=0 forces the distributed red/black sweeps + coarsen
    loop (driver-sized inputs otherwise take the exact sequential gate)."""
    comm, q = louvain(three_cliques, local_threshold=0)
    got = {r["node_id"]: r["community"] for r in comm.collect()}
    groups = [{got[i] for i in c} for c in ([1, 2, 3, 4], [11, 12, 13, 14], [21, 22, 23, 24])]
    assert all(len(g) == 1 for g in groups)
    assert len({next(iter(g)) for g in groups}) == 3
    assert q == pytest.approx(0.6557, abs=0.01)


def test_louvain_at_least_as_good_as_lpa(spark, three_cliques):
    _, q_louvain = louvain(three_cliques)
    lpa = label_propagation(three_cliques)
    q_lpa = modularity(three_cliques, lpa)
    assert q_louvain >= q_lpa - 1e-9


def test_louvain_coarsening_merges_chain(spark):
    """A ring of 4 tight pairs: level-1 finds pairs, coarsening can merge
    further; modularity must never decrease across levels (guarded)."""
    pairs = [(1, 2), (3, 4), (5, 6), (7, 8)]
    edges = [(a, b, 20.0) for a, b in pairs]
    ring = [(2, 3, 3.0), (4, 5, 3.0), (6, 7, 3.0), (8, 1, 3.0)]
    df = undirected(
        pytest.importorskip("pyspark").sql.SparkSession.getActiveSession().createDataFrame(
            edges + ring, "src LONG, dst LONG, weight DOUBLE"
        )
    )
    comm, q = louvain(df)
    got = {r["node_id"]: r["community"] for r in comm.collect()}
    # every tight pair must land in one community
    for a, b in pairs:
        assert got[a] == got[b]
    assert q > 0.3
