"""Profile job/stage counts and warm wall time per bench query.

Usage: python tools/profile_jobs.py [query ...]   (default: bench set)

For each query: one warm-up build+count at the target SF, then a timed
run inside a job group; prints jobs, stages, tasks, and seconds. The
per-job scheduling latency on this box is ~50-150 ms, so a warm sub-3 s
query with 15+ jobs is FIXED-OVERHEAD bound (actions/persists/broadcast
builds), not data bound — the lever is fewer actions, which at cluster
scale is also fewer full scheduling round-trips.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from tensei_agent_spark.cache import release_all
from tensei_agent_spark.queries import REGISTRY
from tensei_agent_spark.session import DEFAULT_SF_DIR, get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("tensei-agent-spark-profile")
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext
    names = sys.argv[1:] or [n for n, q in REGISTRY.items() if q.bench]
    print(f"{'query':35s} {'sec':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for name in names:
        REGISTRY[name].build(spark, sf_dir).count()  # warm
        release_all()
        spark.catalog.clearCache()
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        REGISTRY[name].build(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        tracker = sc.statusTracker()
        jobs = tracker.getJobIdsForGroup(name)
        stages = 0
        tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            stages += len(ji.stageIds)
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    tasks += si.numTasks
        sc.setJobGroup("", "")
        print(f"{name:35s} {dt:7.2f} {len(jobs):5d} {stages:7d} {tasks:6d}",
              flush=True)
        release_all()
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
