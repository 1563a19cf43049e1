"""SQL surface: register the reference-shaped tables (and write-back
tables, when supplied) as temp views so users can query the engine with
plain ``spark.sql`` — the Spark-native analog of pointing a Cypher shell
at the reference's Neo4j instance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .tables import register_star_views
from .views import load_ref_tables

REF_VIEWS = ("users", "books", "ratings", "raw_ratings")


def register_ref_views(
    spark: SparkSession,
    sf_dir: str,
    derived: dict[str, DataFrame] | None = None,
) -> None:
    """Register star tables, the reference-shaped views, and optionally the
    pipeline's write-back tables (similar_to / communities / embeddings)."""
    register_star_views(spark, sf_dir)
    ref = load_ref_tables(spark, sf_dir)
    for name in REF_VIEWS:
        getattr(ref, name).createOrReplaceTempView(name)
    for name, df in (derived or {}).items():
        df.createOrReplaceTempView(name)
