#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a full materialization (count of a
write-free action) after a shared-session warmup; value = total
wall-clock over the headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # reference-parity dataflows
    "rle_event_runs",
    "status_downtime_totals",
    "downtime_bi_dataset",
    "minute_status_rollup",
    "minute_chart_grid",
    "latest_status_per_user",
    "rollover_production_totals",
    "session_stats",
    # relational shapes
    "q1_pricing_summary",
    "q3_unshipped_orders",
    "q5_region_revenue",
    "order_priority_counts",
    "price_percentiles_by_flag",
    "purchase_moving_sum",
    "asof_last_purchase_before_error",
    "error_context_counts",
    # training-data surface
    "dedup_exact_docs",
    "doc_token_stats",
    "doc_quality_scores",
    "lang_id_predictions",
    "minhash_lsh_buckets",
    "neardup_candidate_pairs",
    "knn_bruteforce_top5",
    "lsh_neardup_embeddings",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from machine_downtime_monitor_on_aws_spark.plans import catalog
    from machine_downtime_monitor_on_aws_spark.session import get_spark

    spark = get_spark("bench")

    # warmup: touch each table once so JVM/codegen startup isn't billed
    # to the first query
    from machine_downtime_monitor_on_aws_spark.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    qs = catalog.queries()
    timings: dict[str, float] = {}
    total = 0.0
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def time_query(name: str, n_runs: int) -> float:
        fn = qs[name]
        best = float("inf")
        n = 0
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
            # drop per-query persisted relations (LSH buckets) so
            # cached state never bleeds into the next measurement
            spark.catalog.clearCache()
        print(f"# {name}: {n} rows in {best:.2f}s (best of {n_runs})", file=sys.stderr)
        return best

    for name in HEADLINE:
        best = time_query(name, runs)
        timings[name] = round(best, 3)
        total += best

    # every non-headline catalog query once: regressions outside the
    # headline set stay visible round-over-round (r1 item #10)
    for name in sorted(set(qs) - set(HEADLINE)):
        timings[name] = round(time_query(name, 1), 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    full = {
        "metric": "headline_queries_total_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "total_all_queries": round(sum(timings.values()), 3),
        "n_queries": len(timings),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Full record (all catalog queries) -> file: round-over-round
    # comparisons read this. The PRINTED line is capped: the driver
    # records only the last ~2 KB of stdout, and r2's 2.6 KB
    # all-queries line lost its head to the window -> parsed: null.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json")
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1)
    line = json.dumps(full, separators=(",", ":"))
    if len(line) > 1900:
        compact = dict(full)
        compact["queries"] = {k: timings[k] for k in HEADLINE if k in timings}
        compact["queries_file"] = "bench_out.json"
        line = json.dumps(compact, separators=(",", ":"))
    sys.stderr.flush()
    print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
