"""SparkSession builder tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32); the configs
below are the ones that matter at cluster scale too:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  the co-rating self-join (SURVEY.md §2.3 J3) is skew-prone on popular books.
- Arrow on for the few pandas-interop edges (multimodal mapInPandas).
- Shuffle partitions sized to the local core count; on a real cluster this
  is set per-job (or left to AQE's coalescing with a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "gdar-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sp = shuffle_partitions if shuffle_partitions is not None else max(cpus, 8)
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # initialPartitionNum deliberately left at shuffle.partitions: a 4x
        # over-partitioned start bought ~1.4x on the one big skewed
        # aggregation but cost far more across the iterative algorithms
        # (Louvain 32s->55s, FastRP pipeline 40s->65s at sf0.1) — many small
        # per-sweep shuffles pay task overhead 4x with nothing to coalesce
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode puts every executor thread's working set plus all
        # cached/checkpointed blocks in the one driver JVM — 8g thrashes
        # storage eviction once a few iterative algorithms have run
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # static conf, default 100: the full query mix compiles several
        # hundred generated classes, so the default cache thrashes — every
        # eviction recompiles a class that then restarts JIT-cold, which
        # showed up as a 3-8x lottery on individual bench queries. Classes
        # are small; 10k entries is a few hundred MB ceiling at worst.
        .config("spark.sql.codegen.cache.maxEntries", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
