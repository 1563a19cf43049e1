"""Mimics the driver's t2 gate: every registered query must match its
DuckDB oracle at sf0.001 (fast) — the driver itself runs sf0.01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_database_application_for_recommendations_spark import registry

from .conftest import SF_SMALL
from .oracle_utils import compare

CASES = sorted(registry.oracle_sql().keys())

# ---- corpus-sized unpartitioned-Window guard (round-4 VERDICT item 3) ----
# An unpartitioned Window forces its whole input through ONE task's sort.
# That is only acceptable when the input is provably bounded: every path
# from the window down to a leaf must pass through an Aggregate (value
# histogram / vocab / distinct dimension), a Limit (top-k), or a
# Deduplicate before reaching a scan. LocalRelation/OneRowRelation leaves
# are driver-literal and bounded by construction. This is a cardinality
# heuristic, not a proof (an Aggregate keyed by a corpus-unique column
# would slip through), but it catches exactly the anti-pattern class the
# round-4 verdict flagged twice (IVF seeding, quality-deciles NTILE).

_BOUNDING = {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate", "Distinct"}
_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation"}


def _kids(node):
    s = node.children()
    return [s.apply(i) for i in range(s.size())]


def _reaches_unbounded_leaf(node) -> bool:
    if node.nodeName() in _BOUNDING:
        return False
    cs = _kids(node)
    if not cs:
        return node.nodeName() not in _BOUNDED_LEAVES
    return any(_reaches_unbounded_leaf(c) for c in cs)


def unpartitioned_corpus_windows(df) -> list[str]:
    """Offending Window nodes in ``df``'s optimized logical plan."""

    def walk(n):
        yield n
        for c in _kids(n):
            yield from walk(c)

    plan = df._jdf.queryExecution().optimizedPlan()
    return [
        node.simpleString(60)
        for node in walk(plan)
        if node.nodeName() == "Window"
        and node.partitionSpec().isEmpty()
        and _reaches_unbounded_leaf(_kids(node)[0])
    ]


def test_window_guard_flags_the_reverted_antipattern(spark):
    """Sensitivity check: the guard must flag the exact shapes the round-4
    verdict found (global row_number over a raw scan; global NTILE over a
    per-doc projection) and must pass the sanctioned histogram shape."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    bad_rank = docs.withColumn(
        "rk", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert unpartitioned_corpus_windows(bad_rank), "guard missed a global row_number over a scan"
    bad_ntile = docs.select("doc_id", "n_chars").withColumn(
        "tile", F.ntile(10).over(Window.orderBy("n_chars", "doc_id"))
    )
    assert unpartitioned_corpus_windows(bad_ntile), "guard missed a global NTILE"
    hist = docs.groupBy("n_chars").count()
    ok = hist.withColumn(
        "cum",
        F.sum("count").over(
            Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    assert not unpartitioned_corpus_windows(ok), "guard flagged the histogram pattern"
    topk = docs.orderBy("doc_id").limit(8).withColumn(
        "rk", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert not unpartitioned_corpus_windows(topk), "guard flagged a limit-bounded window"


@pytest.mark.parametrize("name", CASES)
def test_parity_sf0001(spark, name):
    fn = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    compare(name, fn(spark, SF_SMALL), sql, SF_SMALL)


def test_all_registered_queries_are_driver_canonicalizable(spark):
    """The driver canonicalizes results with pandas sort_values, which
    throws ``unhashable type`` on array/map columns and aborts the WHOLE
    sweep (round-1 CORRECTNESS aborted at q_pipeline_fastrp_embeddings,
    leaving 8 queries unchecked). Pin: every registered query's schema
    is scalar-only (schema resolution; pipeline queries run their
    algorithm jobs once at sf0.001 and are cached for other tests)."""
    bad = {}
    py_udf = {}
    global_windows = {}
    cartesian = {}
    for name, fn in registry.queries().items():
        df = fn(spark, SF_SMALL)
        offenders = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if any(t in f.dataType.simpleString() for t in ("array", "map", "struct"))
        ]
        if offenders:
            bad[name] = offenders
        # plan hygiene, piggybacked on the same sweep: row-at-a-time
        # Python UDFs (BatchEvalPython) are banned engine-wide — Arrow
        # kernels show as ArrowEvalPython/MapInPandas/FlatMapGroupsInPandas
        # and are fine
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            py_udf[name] = True
        # ... as are corpus-sized unpartitioned Windows (round-4 VERDICT
        # item 3): single-task global sorts, the engine's documented
        # scale anti-pattern (operators/packing.py:7)
        gw = unpartitioned_corpus_windows(df)
        if gw:
            global_windows[name] = gw
        # ... and non-broadcast cartesian products, the other silent
        # scale-killer class. Engine code never emits one (crossJoin is
        # always broadcast-hinted -> BroadcastNestedLoopJoin); the ONE
        # sanctioned site is MLlib's own recommendForAllUsers, whose
        # blocked user-factor x item-factor CartesianProduct +
        # collect_top_k IS the canonical ALS serving plan.
        if "CartesianProduct" in plan and name not in ("q_recsys_als",):
            cartesian[name] = True
    assert not bad, f"non-canonicalizable columns: {bad}"
    assert not py_udf, f"row-at-a-time Python UDFs in plans: {sorted(py_udf)}"
    assert not global_windows, (
        f"corpus-sized unpartitioned Windows (single-task global sorts): {global_windows}"
    )
    assert not cartesian, f"non-broadcast cartesian products: {sorted(cartesian)}"


@pytest.mark.parametrize(
    "name",
    [n for n in CASES if n.startswith("q_events") or n == "q_ingest_events"],
)
def test_events_parity_is_session_timezone_proof(spark, name):
    """The driver's session timezone is unknown; every event-time output is
    epoch-micros arithmetic, so parity must hold under any session tz."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        compare(name, registry.queries()[name](spark, SF_SMALL),
                registry.oracle_sql()[name], SF_SMALL)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_every_rows_only_query_has_an_attestable_twin():
    """Round-4 discipline: a rows-only registration (no oracle SQL) must
    name an oracle-backed companion in registry.ROWS_ONLY_TWINS — so every
    surface keeps a driver hash row even when its own output can't be
    value-hashed."""
    from graph_database_application_for_recommendations_spark import registry

    q = set(registry.queries())
    o = set(registry.oracle_sql())
    rows_only = q - o
    missing = rows_only - set(registry.ROWS_ONLY_TWINS)
    assert not missing, f"rows-only queries without a declared twin: {sorted(missing)}"
    bad_twins = {
        name: twin
        for name, twin in registry.ROWS_ONLY_TWINS.items()
        if twin not in o
    }
    assert not bad_twins, f"twins that are not oracle-backed: {bad_twins}"
    stale = set(registry.ROWS_ONLY_TWINS) - rows_only
    assert not stale, f"twin map entries for queries that are no longer rows-only: {sorted(stale)}"


def test_window_rotation_is_lru_and_counts_rows_only_appearances():
    """Round-5 VERDICT item 1: rows-only queries must rotate on their real
    driver-artifact history (their ``no_oracle`` rows), not a pinned rank,
    and the window must be LRU on last-round-seen so stale attestations
    (e.g. the §2.8 serving catalog, last green r02 before this fix) come
    back to the front instead of being starved behind fresher rows."""
    import glob
    import json
    import os
    import re

    from graph_database_application_for_recommendations_spark import registry

    att = registry._DRIVER_ATTESTATIONS
    order = registry._window_order()

    # (a) The order is sorted by (last_round, count): never-attested first,
    # then strictly oldest-attested first.
    keys = [att.get(n, (0, 0))[::-1] for n in order]
    assert keys == sorted(keys), "window order is not LRU on (last_round, count)"

    # (b) Every rows-only query that left a no_oracle row in an artifact is
    # ranked by that appearance — no (1, 0) pinning.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen_rows_only: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if (
                    isinstance(row, dict)
                    and row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None
                ):
                    seen_rows_only[name] = max(seen_rows_only.get(name, 0), rnd)
    for name, rnd in seen_rows_only.items():
        if name in registry.QUERIES:
            count, last = att.get(name, (0, 0))
            assert last >= rnd, (
                f"{name} appeared rows-only in r{rnd} but is ranked last_round={last}"
            )
