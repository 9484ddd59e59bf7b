#!/usr/bin/env python
"""r18 construction-time sweep.

For every catalog query (or the names given), measures the DataFrame
CONSTRUCTION time (the ``fn(spark, sf_dir)`` call: py4j expression
building + Catalyst analysis + any eager store/build work) separately
from the EXECUTION time (the same ``.count()`` action bench.py
times). One warmup pass runs everything first so build-if-absent
stores are warm and the JVM is hot; the reported numbers are medians
over --runs measured passes.

Usage:
  python tools_construction_sweep.py [--runs N] [--sf DIR] [--out F] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from machine_downtime_monitor_on_aws_spark.plans import catalog
    from machine_downtime_monitor_on_aws_spark.session import (
        get_spark,
        unpersist_all_rdds,
    )
    from machine_downtime_monitor_on_aws_spark.tables import load_tables

    spark = get_spark("construction_sweep_r18")
    sc = spark.sparkContext
    for df in load_tables(spark, args.sf).values():
        df.count()

    qs = catalog.queries()
    names = args.names or sorted(qs)

    # warmup: build stores, JIT, fill FS caches
    for name in names:
        sc.setJobDescription(f"warmup {name}")
        qs[name](spark, args.sf).count()
        spark.catalog.clearCache()
        unpersist_all_rdds(spark)

    results = {}
    for name in names:
        fn = qs[name]
        cons, execs = [], []
        for _ in range(args.runs):
            sc.setJobDescription(f"construct {name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            sc.setJobDescription(f"execute {name}")
            df.count()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)
        results[name] = {
            "construct_sec": round(statistics.median(cons), 4),
            "exec_sec": round(statistics.median(execs), 4),
            "construct_runs": [round(x, 4) for x in cons],
            "exec_runs": [round(x, 4) for x in execs],
        }
        print(
            f"{name}: construct {results[name]['construct_sec']}s "
            f"exec {results[name]['exec_sec']}s",
            flush=True,
        )

    tot_c = sum(r["construct_sec"] for r in results.values())
    tot_e = sum(r["exec_sec"] for r in results.values())
    out = {
        "sf": args.sf,
        "runs": args.runs,
        "total_construct_sec": round(tot_c, 3),
        "total_exec_sec": round(tot_e, 3),
        "queries": results,
    }
    print(
        json.dumps(
            {"total_construct_sec": out["total_construct_sec"],
             "total_exec_sec": out["total_exec_sec"]}
        )
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
