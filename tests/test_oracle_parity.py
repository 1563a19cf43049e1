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
