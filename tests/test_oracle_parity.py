"""Mimics the driver's t2 gate: every registered query must match its
DuckDB oracle at sf0.001 (fast) — the driver itself runs sf0.01."""

from __future__ import annotations

import pytest

from graph_database_application_for_recommendations_spark import registry

from .conftest import SF_SMALL
from .oracle_utils import compare

CASES = sorted(registry.oracle_sql().keys())


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
    assert not bad, f"non-canonicalizable columns: {bad}"
    assert not py_udf, f"row-at-a-time Python UDFs in plans: {sorted(py_udf)}"


@pytest.mark.parametrize("name", [n for n in CASES if n.startswith("q_events")])
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
