"""1-minute interval rollup of a status / production-count stream.

Re-expresses the reference's detail-chart resolver
(``source/lambda/data-sources/machine-detail.ts:17-59``): it
pre-generates a minute grid over [start, end), assigns readings to
chunks with a merge-join pointer walk, and aggregates per chunk:

- STATUS: the latest status in the minute wins UNLESS any DOWN
  occurred in the minute -> DOWN; empty minute -> UNKNOWN
  (machine-detail.ts:31-45; golden semantics verified by
  machine-detail.spec.ts:271-276).
- PRODUCTION_COUNT: last value in the minute; empty minute -> NULL
  (machine-detail.ts:50-59; reference renders '' for empty).

Spark-first: no merge-join walk - a tumbling ``window(ts, '1 minute')``
groupBy (map-side partial agg, one shuffle on (id, minute)), then a
right join against a generated ``sequence()`` minute grid to
materialize empty chunks. The grid is tiny (minutes x machines) and
broadcastable; at 100 TB the heavy side never re-shuffles for the
grid join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import STATUS_DOWN, STATUS_UNKNOWN


def minute_status_rollup(
    df: DataFrame,
    id_col: str = "id",
    ts_col: str = "ts",
    status_col: str = "status",
    order_col: str | None = None,
) -> DataFrame:
    """Per (id, minute): DOWN-dominant latest status.

    ``max_by(status, ts)`` alone is WRONG (SURVEY.md SS7d): one DOWN
    reading must poison the whole minute even if a later reading in
    the same minute is UP. ``order_col`` breaks ties for readings with
    identical timestamps (the reference's stable sort keeps input
    order; pass a sequence column for determinism).
    """
    minute = F.date_trunc("minute", F.col(ts_col)).alias("minute_start")
    tie = F.col(order_col) if order_col else F.lit(0)
    latest = F.max_by(F.col(status_col), F.struct(F.col(ts_col), tie))
    any_down = F.max(F.when(F.col(status_col) == STATUS_DOWN, 1).otherwise(0))
    return (
        df.groupBy(F.col(id_col).alias("id"), minute)
        .agg(
            F.when(any_down == 1, F.lit(STATUS_DOWN))
            .otherwise(latest)
            .alias("status")
        )
    )


def minute_last_value_rollup(
    df: DataFrame,
    id_col: str = "id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Per (id, minute): last production-count value
    (machine-detail.ts:50-59)."""
    minute = F.date_trunc("minute", F.col(ts_col)).alias("minute_start")
    tie = F.col(order_col) if order_col else F.lit(0)
    return df.groupBy(F.col(id_col).alias("id"), minute).agg(
        F.max_by(F.col(value_col), F.struct(F.col(ts_col), tie)).alias("value")
    )


def minute_grid(
    spark_df_ids: DataFrame,
    start,
    end,
    id_col: str = "id",
) -> DataFrame:
    """Cross of distinct ids x fully-elapsed minute starts from start.

    Mirrors machine-detail.ts:17-25: grid from start.startOf('minute'),
    stepping 1 minute, with loop guard ``chunkEnd <= endTimestamp`` —
    minute m is emitted only once fully elapsed (m + 60s <= end), so an
    unaligned end drops the trailing in-progress minute. ``start``/``end``
    are timestamp literals/py datetimes.
    """
    ids = spark_df_ids.select(F.col(id_col).alias("id")).distinct()
    grid = ids.select(
        "id",
        F.explode(
            F.sequence(
                F.date_trunc("minute", F.lit(start).cast("timestamp")),
                F.date_trunc("minute", F.lit(end).cast("timestamp")),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("minute_start"),
    )
    # sequence() is end-inclusive; the reference keeps minute m only
    # while its chunkEnd (m+1min) <= end (machine-detail.ts:22)
    return grid.filter(
        F.col("minute_start") + F.expr("INTERVAL 1 MINUTE")
        <= F.lit(end).cast("timestamp")
    )


def minute_chart(
    status_df: DataFrame,
    counts_df: DataFrame | None,
    start,
    end,
    id_col: str = "id",
    ts_col: str = "ts",
    status_col: str = "status",
    value_col: str = "value",
    order_col: str | None = None,
) -> DataFrame:
    """Full detail-chart query: grid right-join + per-minute aggs.

    Returns one row per (id, fully-elapsed minute from start): status
    (UNKNOWN-filled) and last production count (NULL-filled). The
    1-hour-lookback -> exactly-60-rows invariant
    (machine-detail.spec.ts:201) holds by construction — and holds
    for UNALIGNED 1-hour windows too, since the trailing in-progress
    minute is excluded (machine-detail.ts:22 loop guard).
    """
    in_range = (F.col(ts_col) >= F.lit(start).cast("timestamp")) & (
        F.col(ts_col) < F.lit(end).cast("timestamp")
    )
    status_df = status_df.filter(in_range)
    rolled = minute_status_rollup(status_df, id_col, ts_col, status_col, order_col)
    grid = minute_grid(status_df, start, end, id_col)
    out = (
        grid.join(rolled, ["id", "minute_start"], "left")
        .withColumn("status", F.coalesce(F.col("status"), F.lit(STATUS_UNKNOWN)))
    )
    if counts_df is not None:
        counts = minute_last_value_rollup(
            counts_df.filter(in_range), id_col, ts_col, value_col, order_col
        ).withColumnRenamed("value", "production_count")
        out = out.join(counts, ["id", "minute_start"], "left")
    return out
