"""Interval / range joins via bucketing.

A naive ``a.ts BETWEEN b.ts - w AND b.ts + w`` theta-join becomes a
nested-loop (per key) in Spark - quadratic on hot keys. The standard
scale formulation: quantize both sides to buckets of the window
width, explode the probe side to its adjacent buckets, equi-join on
(key, bucket), then re-apply the exact range predicate. Each row
meets only ~3 buckets of candidates, the join is a plain shuffled
equi-join, and AQE handles bucket skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_window(
    probe: DataFrame,
    build: DataFrame,
    key_cols: list[str],
    probe_ts: str,
    build_ts: str,
    window_seconds: int,
) -> DataFrame:
    """All (probe, build) pairs with |build.ts - probe.ts| <= window,
    equal keys. Returns probe columns + build's ts as ``matched_ts``.
    """
    w = window_seconds
    # floor, NOT a long cast: division-then-cast truncates toward
    # zero, which disagrees with the build side's floor for negative
    # (pre-1970) epochs and silently drops boundary pairs (pinned by
    # tests/test_property.py::test_range_join_matches_model)
    pb = F.floor(F.col(probe_ts).cast("long") / w).cast("long")
    p = probe.withColumn("__epoch", F.col(probe_ts).cast("long")).withColumn(
        "__bucket",
        F.explode(F.array(pb - 1, pb, pb + 1)),
    )
    payload = [c for c in build.columns if c not in key_cols and c != build_ts]
    b = build.select(
        *key_cols,
        *payload,
        F.col(build_ts).cast("long").alias("__b_epoch"),
        F.floor(F.col(build_ts).cast("long") / w).cast("long").alias("__bucket"),
    )
    joined = p.join(b, [*key_cols, "__bucket"]).filter(
        F.abs(F.col("__b_epoch") - F.col("__epoch")) <= w
    )
    return joined.drop("__bucket").withColumnRenamed("__b_epoch", "matched_epoch").drop(
        "__epoch"
    )
