"""Skew-mitigation utilities for hot-key aggregations and joins.

At 100 TB a handful of machines (or boilerplate-duplicate documents)
can carry orders of magnitude more rows than the median key. Two
standard mitigations, composable with everything else here:

- **Salted two-stage aggregation**: groupBy((key, salt)) partial agg
  -> groupBy(key) final agg. Works for any algebraic aggregate
  (sum/count/min/max); the hot key's rows spread over N salt
  partitions in stage one.
- **AQE skew-join** is preferred for joins
  (``spark.sql.adaptive.skewJoin.enabled`` is on in session.py);
  ``replicated_broadcast_join`` below is the manual fallback when the
  small side is broadcastable anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name -> (input column, fn) with fn in
    {sum, count, min, max}. Salt is derived from a stable hash of the
    full row spread (monotonically_increasing_id is partition-local
    and cheap); stage 1 runs the partial per (key, salt), stage 2
    combines per key: sum->sum, count->sum, min->min, max->max.
    """
    combine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partial = {"sum": F.sum, "count": lambda c: F.count(c), "min": F.min, "max": F.max}
    for _, (col, fn) in aggs.items():
        if fn not in combine:
            raise ValueError(f"unsupported agg {fn!r} (need algebraic fn)")

    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % num_salts).cast("int")
    )
    stage1 = salted.groupBy(*key_cols, "__salt").agg(
        *[
            partial[fn](F.col(col)).alias(f"__p_{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    return stage1.groupBy(*key_cols).agg(
        *[
            combine[fn](F.col(f"__p_{name}")).alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )


def top_hot_keys(
    df: DataFrame, key_cols: Sequence[str], threshold_ratio: float = 0.01
) -> DataFrame:
    """Diagnostic: keys holding more than ``threshold_ratio`` of all
    rows - feed this into salting decisions or AQE tuning."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= F.lit(int(total * threshold_ratio)))
        .orderBy(F.col("n_rows").desc())
    )


def replicated_broadcast_join(
    big: DataFrame, small: DataFrame, on: Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Hot-key-proof join: broadcast the small side so no shuffle of
    the big side happens at all (skew becomes irrelevant). The guard
    is the caller's: the small side must fit the broadcast budget."""
    return big.join(F.broadcast(small), on, how)
