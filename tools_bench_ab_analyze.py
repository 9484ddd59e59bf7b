#!/usr/bin/env python
"""Summarize paired bench runs: per-query medians across trees,
per-tree totals, and cross-tree ratios on the common query set.

Usage: python tools_bench_ab_analyze.py out.json label1=fileA,fileB label2=...
Each file is a bench_out.json. Per query, the value compared is the
median of the per-run MEDIANS (robust to one-sided blips; bench.py
already medians within a run)."""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    out_path = sys.argv[1]
    trees: dict[str, list[dict]] = {}
    for spec in sys.argv[2:]:
        label, files = spec.split("=", 1)
        trees[label] = [json.load(open(f)) for f in files.split(",")]

    merged: dict[str, dict] = {}
    for label, runs in trees.items():
        meds: dict[str, list[float]] = {}
        for r in runs:
            for q, v in r["query_medians"].items():
                meds.setdefault(q, []).append(v)
        merged[label] = {
            "per_query": {q: round(statistics.median(v), 3) for q, v in meds.items()},
            "headline_totals": [r["value"] for r in runs],
            "median_totals": [r["headline_median_total"] for r in runs],
            "all_totals": [r["total_all_queries"] for r in runs],
            "loadavg": [[r["loadavg_start"], r["loadavg_end"]] for r in runs],
        }

    labels = list(merged)
    common = set.intersection(*[set(merged[l]["per_query"]) for l in labels])
    ratios = {}
    base = labels[0]
    for other in labels[1:]:
        rs = []
        per = {}
        for q in sorted(common):
            a = merged[base]["per_query"][q]
            b = merged[other]["per_query"][q]
            if a > 0 and b > 0:
                per[q] = round(a / b, 3)  # >1 = other faster than base
                rs.append(a / b)
        gm = 1.0
        for r in rs:
            gm *= r
        gm = gm ** (1.0 / len(rs)) if rs else float("nan")
        ratios[f"{base}_over_{other}"] = {
            "geomean_speedup": round(gm, 4),
            "sum_base": round(sum(merged[base]["per_query"][q] for q in common), 2),
            "sum_other": round(sum(merged[other]["per_query"][q] for q in common), 2),
            "per_query": per,
        }
    result = {"trees": merged, "ratios": ratios, "n_common": len(common)}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    for k, v in ratios.items():
        print(k, "geomean", v["geomean_speedup"], "sums", v["sum_base"], "->", v["sum_other"])


if __name__ == "__main__":
    main()
