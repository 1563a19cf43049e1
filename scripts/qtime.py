#!/usr/bin/env python
"""Micro-bench for individual registry queries.

Usage: python scripts/qtime.py <query> [<query> ...]

Methodology mirrors bench.py: one sf0.01 warmup pass over the named
queries, then N timed passes at $SPARK_GRAFT_SF_DIR (default sf0.1) with a
registry/catalog cache reset before each, reporting per-pass and min
times. $QTIME_PASSES controls N (default 2).
"""

from __future__ import annotations

import os
import sys
import time

from graph_database_application_for_recommendations_spark import registry
from graph_database_application_for_recommendations_spark.session import get_spark

_TICK = os.sysconf("SC_CLK_TCK")


def _proc_tree_cpu() -> float:
    """Total utime+stime seconds of this process and every live descendant
    (the pyspark JVM + python workers). On a CPU-credit-throttled VM,
    wall-clock is noise; consumed CPU is the stable measure of work."""
    me = os.getpid()
    # build pid -> ppid and pid -> cpu maps in one /proc scan
    ppid: dict[int, int] = {}
    cpu: dict[int, float] = {}
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        try:
            with open(f"/proc/{ent}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # fields after comm: state(0) ppid(1) ... utime(11) stime(12)
            ppid[int(ent)] = int(parts[1])
            cpu[int(ent)] = (int(parts[11]) + int(parts[12])) / _TICK
        except (OSError, IndexError, ValueError):
            continue
    total = 0.0
    for pid in cpu:
        p = pid
        for _ in range(50):
            if p == me:
                total += cpu[pid]
                break
            p = ppid.get(p, 0)
            if p <= 1:
                break
    return total


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_passes = int(os.environ.get("QTIME_PASSES", "2"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("gdar-qtime", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    warm = sf_dir.rstrip("/").rsplit("sf", 1)[0] + "sf0.01"
    for name in names:
        try:
            qs[name](spark, warm).count()
        except Exception as e:
            print(f"warmup {name} failed: {e!r}", flush=True)
    best: dict[str, float] = {}
    best_cpu: dict[str, float] = {}
    for p in range(1, n_passes + 1):
        registry.reset_caches()
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        for name in names:
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            c0 = _proc_tree_cpu()
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            dc = _proc_tree_cpu() - c0
            best[name] = min(best.get(name, 1e18), dt)
            best_cpu[name] = min(best_cpu.get(name, 1e18), dc)
            print(f"[pass {p}] {name}: {dt:.2f}s wall, {dc:.2f}s cpu ({n} rows)", flush=True)
    print("MIN: " + " ".join(f"{k}={v:.2f}" for k, v in best.items()), flush=True)
    print("MINCPU: " + " ".join(f"{k}={v:.2f}" for k, v in best_cpu.items()), flush=True)


if __name__ == "__main__":
    main()
