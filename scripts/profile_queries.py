#!/usr/bin/env python
"""Per-query job/stage/task profiling harness (optimization round 10).

For each named registry query: run it to the noop sink REPS times and
report wall seconds (min), plus the number of Spark jobs, stages and
tasks the run scheduled — read from the AppStatusStore, so the counts
are exact and host-speed-independent. Structural regressions/wins
(extra actions, extra exchanges) show up here even when wall-clock is
noisy.

Usage: python scripts/profile_queries.py [sf_dir] name1,name2,... [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parking_bigdata_spark import queries as Q  # noqa: E402
from parking_bigdata_spark.session import get_spark  # noqa: E402


def _counts(spark):
    sc = spark.sparkContext
    dag = sc._jsc.sc().dagScheduler()
    return int(dag.nextJobId()), int(dag.nextStageId())


def _tasks(spark, s0: int, s1: int) -> int:
    tracker = spark.sparkContext.statusTracker()
    ntasks = 0
    for sid in range(s0, s1):
        info = tracker.getStageInfo(sid)
        if info is not None:
            ntasks += info.numTasks
    return ntasks


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("profile")
    reg = Q.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    print(f"{'query':42} {'best_s':>7} {'jobs':>5} {'stages':>7} "
          f"{'tasks':>6}")
    for name in names:
        fn = reg[name]
        best = None
        jobs = stages = tasks = 0
        for r in range(reps):
            spark.catalog.clearCache()
            j0, s0 = _counts(spark)
            t = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t
            j1, s1 = _counts(spark)
            if best is None or wall < best:
                best = wall
            jobs, stages, tasks = j1 - j0, s1 - s0, _tasks(spark, s0, s1)
        print(f"{name:42} {best:7.3f} {jobs:5d} {stages:7d} {tasks:6d}",
              flush=True)


if __name__ == "__main__":
    main()
