#!/usr/bin/env python
"""r17 optimization-round profiling harness.

For each named catalog query: N warm runs (count-forced, same action
as bench.py), recording wall time, number of Spark jobs, and total
task count per run; optionally dumps .explain('formatted') to
plans/r18/<name>_<tag>.txt.

Usage:
  python tools_profile_queries.py [--runs N] [--tag before] \
      [--explain] [--sf DIR] name1 name2 ...
  (no names = the 25 slowest from bench_out.json medians)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tag", default=None)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from machine_downtime_monitor_on_aws_spark.plans import catalog
    from machine_downtime_monitor_on_aws_spark.session import get_spark, unpersist_all_rdds
    from machine_downtime_monitor_on_aws_spark.tables import load_tables

    spark = get_spark("profile_r18")
    sc = spark.sparkContext
    for df in load_tables(spark, args.sf).values():
        df.count()

    qs = catalog.queries()
    names = args.names
    if not names:
        b = json.load(open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json")))
        med = b["query_medians"]
        names = [k for k, _ in sorted(med.items(), key=lambda kv: -kv[1])[:25]]

    results = {}
    for name in names:
        fn = qs[name]
        # warmup run (untimed)
        fn(spark, args.sf).count()
        spark.catalog.clearCache()
        unpersist_all_rdds(spark)
        obs, jobs_per_run, tasks_per_run = [], [], []
        for i in range(args.runs):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.count()
            obs.append(time.perf_counter() - t0)
            st = sc.statusTracker()
            jids = st.getJobIdsForGroup(group)
            jobs_per_run.append(len(jids))
            ntasks = 0
            for j in jids:
                ji = st.getJobInfo(j)
                if ji:
                    for s in ji.stageIds:
                        si = st.getStageInfo(s)
                        if si:
                            ntasks += si.numTasks
            tasks_per_run.append(ntasks)
            sc.setJobGroup("", "")
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)
        if args.explain:
            os.makedirs("plans/r18", exist_ok=True)
            df = fn(spark, args.sf)
            with open(f"plans/r18/{name}_{args.tag or 'before'}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)
        s = sorted(obs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        results[name] = {
            "median": round(med, 3),
            "best": round(min(obs), 3),
            "samples": [round(o, 3) for o in obs],
            "jobs": jobs_per_run[-1],
            "tasks": tasks_per_run[-1],
        }
        print(f"{name}: med {med:.3f}s best {min(obs):.3f}s jobs {jobs_per_run[-1]} tasks {tasks_per_run[-1]}", file=sys.stderr)

    out = args.out or "/tmp/profile_r18.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
