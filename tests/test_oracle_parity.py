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
    for name, fn in registry.queries().items():
        df = fn(spark, SF_SMALL)
        offenders = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if any(t in f.dataType.simpleString() for t in ("array", "map", "struct"))
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, f"non-canonicalizable columns: {bad}"


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
