"""Gap-based sessionization (extension beyond the reference surface).

The reference has tumbling 1-minute windows only (SURVEY.md SS2.9 "No
sliding or session windows"). A training-data / clickstream pipeline
needs gap sessions; the standard Spark-first construction is: lag(ts)
per key -> new-session flag when gap > threshold -> running sum of
flags = session id. One shuffle on the key, two window passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``session_id`` (0-based per key) by the gap rule."""
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col)).over(w).cast("long")
    new_session = F.when(gap > F.lit(gap_seconds), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("session_id", F.sum(new_session).over(running))


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per session: start/end epoch, duration, event count."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, order_cols)
    return s.groupBy(*[F.col(k) for k in key_cols], F.col("session_id")).agg(
        F.min(F.col(ts_col).cast("long")).alias("session_start_epoch"),
        F.max(F.col(ts_col).cast("long")).alias("session_end_epoch"),
        (
            F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long"))
        ).alias("session_duration_seconds"),
        F.count(F.lit(1)).alias("n_events"),
    )
