#!/usr/bin/env python
"""One-shot incremental-vs-full CC crossover measurement (r13 verdict
"What's wrong" #1).

BENCH_r11..r13 stably recorded ``labels_incremental_sec`` ~3x
``labels_full_cc_sec`` - which reads as a regression without context.
The cause is bench-scale, not asymptotics: the sf0.1 pair graph is
~256 edges, so full CC takes connected_components' driver union-find
shortcut (microseconds of compute, one collect), while
update_components pays a fixed ~1s of Spark job overhead (two label
joins + the contracted-delta CC + the relabel union) no matter how
small the delta is. The asymptotic claim - full CC is
O(history edges) per batch, update_components is
O(delta + touched components) - only becomes VISIBLE once the
history crosses connected_components' driver_threshold (200k edges)
and the full rerun has to pay distributed min-label propagation over
the whole accumulated pair graph.

No materializable sf replication gets the synthetic corpus there
(sf1.0 is ~2.6k pairs), so this script measures the crossover
directly on synthetic pair graphs: history sizes spanning the
driver threshold, a fixed 2k-edge delta batch, both paths timed
best-of-2 from localCheckpointed inputs (labels precomputed and
untimed for the incremental path - they are the maintained state the
operator exists to reuse). Graphs are deterministic multiplicative-
hash random graphs: chainier than real near-dup clusters (which are
near-cliques of diameter ~2), i.e. HARDER on the distributed rounds
both paths share, so the measured flip is conservative.

Writes BENCH_CC_CROSSOVER.json and prints one JSON line. SCALE.md
cites the result next to the crossover decomposition.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HIST_EDGES = [2_000, 50_000, 200_000, 800_000, 3_200_000]
DELTA_EDGES = 2_000
BEST_OF = 2


def _edges(spark, n_edges: int, n_nodes: int, salt: int, id_base: int = 0):
    """Deterministic pseudo-random edge list (doc_a, doc_b):
    xxhash64-derived endpoints (a multiplicative-congruential
    generator degenerates into a permutation graph - one giant cycle,
    unbounded diameter; a hashed Erdos-Renyi-style multigraph has the
    O(log n) diameter real pair graphs stay under). Self-loops
    dropped."""
    from pyspark.sql import functions as F

    def node(seed: int):
        h = F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt))
        return F.pmod(h, F.lit(n_nodes)) + id_base

    return (
        spark.range(n_edges)
        .select(node(1).alias("doc_a"), node(2).alias("doc_b"))
        .filter(F.col("doc_a") != F.col("doc_b"))
    )


def measure(spark) -> list[dict]:
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        connected_components,
        update_components,
    )
    from machine_downtime_monitor_on_aws_spark.session import (
        unpersist_all_rdds,
    )

    out = []
    for hist_n in HIST_EDGES:
        n_nodes = hist_n // 2
        hist = _edges(spark, hist_n, n_nodes, salt=1).localCheckpoint(
            eager=True
        )
        # the maintained state the incremental path reuses - untimed,
        # it amortizes over every future batch
        labels = connected_components(hist).localCheckpoint(eager=True)
        # delta: half the batch touches existing nodes, half brings
        # new ids (id_base above the historical space)
        delta = (
            _edges(spark, DELTA_EDGES // 2, n_nodes, salt=99)
            .unionByName(
                _edges(
                    spark,
                    DELTA_EDGES // 2,
                    DELTA_EDGES,
                    salt=7,
                    id_base=n_nodes + 1,
                )
            )
            .localCheckpoint(eager=True)
        )
        full_sec = inc_sec = float("inf")
        for _ in range(BEST_OF):
            t0 = time.perf_counter()
            connected_components(hist.unionByName(delta)).count()
            full_sec = min(full_sec, time.perf_counter() - t0)
            t0 = time.perf_counter()
            update_components(labels, delta).count()
            inc_sec = min(inc_sec, time.perf_counter() - t0)
        out.append(
            {
                "hist_edges": hist_n,
                "delta_edges": DELTA_EDGES,
                "full_cc_sec": round(full_sec, 3),
                "incremental_sec": round(inc_sec, 3),
                "incremental_wins": inc_sec < full_sec,
            }
        )
        print(f"# {out[-1]}", file=sys.stderr)
        unpersist_all_rdds(spark)
    return out


def main() -> None:
    from machine_downtime_monitor_on_aws_spark.session import get_spark

    loadavg = [round(v, 2) for v in os.getloadavg()]
    spark = get_spark("bench-cc-crossover")
    rows = measure(spark)
    rec = {
        "metric": "cc_crossover",
        "driver_threshold_edges": 200_000,
        "rows": rows,
        "loadavg_start": loadavg,
        "unit": "sec",
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_CC_CROSSOVER.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
