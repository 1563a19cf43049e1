#!/usr/bin/env python
"""Capture .explain("formatted") output for named registry queries.

Usage: python scripts/capture_plans.py <suffix> <query> [<query> ...]

Writes plans/r10/<query>_<suffix>.txt for each query. The plan is taken
from the DataFrame the registry builder returns at $SPARK_GRAFT_SF_DIR
(default sf0.1) — for the iterative algorithms the loop has already
executed eagerly by then, so the captured plan is the final table's
(noted in the file header).
"""

from __future__ import annotations

import os
import sys

from graph_database_application_for_recommendations_spark import registry
from graph_database_application_for_recommendations_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("gdar-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} — explain('formatted')\n")
            f.write(
                "# (iterative drivers execute eagerly while building; this is the\n"
                "#  final returned table's plan)\n\n"
            )
            f.write(plan)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
