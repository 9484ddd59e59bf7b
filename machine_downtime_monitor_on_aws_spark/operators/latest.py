"""Latest-value-per-key (arg-max) and change detection.

Re-expresses the reference's UI-reference maintenance
(``source/lambda/filter-kinesis-stream/index.ts:146-191``): per batch,
messages are sorted by event timestamp (index.ts:166, comparator
:347-351) and the last status per machine is kept; a mutation is
emitted only when the status actually changed or the machine is new
(index.ts:177-186).

Spark-first: ``max_by(status, (ts, tie))`` is order-insensitive, so
no sort is needed at all - a single hash aggregation with map-side
partials. Change-only emission is a join against the prior snapshot
(batch) or ``outputMode("update")`` (streaming, see
streaming/change_feed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """One row per key: each value col at the maximal (ts, order) row,
    plus the timestamp itself.

    ``order_col`` breaks timestamp ties deterministically (the
    reference's stable sort keeps arrival order; index.ts:347-351).
    """
    tie = F.col(order_col) if order_col else F.lit(0)
    ord_key = F.struct(F.col(ts_col), tie)
    aggs = [F.max_by(F.col(v), ord_key).alias(v) for v in value_cols]
    aggs.append(F.max(F.col(ts_col)).alias(ts_col))
    return df.groupBy(*[F.col(k) for k in key_cols]).agg(*aggs)


def changed_rows(
    current: DataFrame,
    prior: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Rows of ``current`` whose value differs from ``prior`` (or are
    new) - the change feed (index.ts:177-186).

    Left join on key; keep where the key has no prior row or the
    value null-safely differs. The presence marker (not the prior
    VALUE's nullness) is what distinguishes a new key: a prior row
    whose stored value is legitimately NULL must not re-emit an
    unchanged NULL every batch, and a transition TO NULL must emit
    (a plain ``!=`` is NULL in both cases). The reference's status
    domain never holds NULL, so this only matters for generic
    KeyedParquetStore payloads. ``prior`` (a latest-snapshot) is
    small relative to the stream - broadcast when it fits; at scale
    both sides are snapshots keyed the same way so the join
    co-partitions.
    """
    p = prior.select(
        *[F.col(k) for k in key_cols],
        F.col(value_col).alias("__prior_value"),
        F.lit(True).alias("__prior_present"),
    )
    return (
        current.join(p, key_cols, "left")
        .filter(
            F.col("__prior_present").isNull()
            | ~F.col(value_col).eqNullSafe(F.col("__prior_value"))
        )
        .drop("__prior_value", "__prior_present")
    )


def with_status_age(
    latest: DataFrame, now_epoch_col, ts_col: str = "status_epoch"
) -> DataFrame:
    """W5 ('DOWN for 24 minutes', MachineStatusCard.tsx:104-118):
    seconds since the last status change. ``now_epoch_col`` is a
    Column (pass ``F.unix_timestamp(F.current_timestamp())`` live, or
    a literal in tests for determinism)."""
    return latest.withColumn(
        "status_age_seconds", now_epoch_col - F.col(ts_col)
    )
