"""Counter-rollover-aware production totals (stateful scan as windows).

Re-expresses the reference's client-side total-production computation
(``source/web-ui/src/views/machines/MachineDetail.tsx:99-119``): scan
the per-minute count sequence keeping a running max; every time the
counter *decreases* (a reset/rollover), add the running max to the
total and restart; finally add the last running max.

Equivalent closed form used here (pure window functions, no UDAF):
split the sequence into *reset sessions* (a new session starts
whenever count < previous count); the total is the sum over sessions
of each session's max. This is order-insensitive within the window
frame and runs as two per-key window passes + one aggregation - all
partitioned by key, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_reset_sessions(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    count_col: str,
) -> DataFrame:
    """Add ``reset_session``: 0-based counter session index per key."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    prev = F.lag(F.col(count_col)).over(w)
    is_reset = F.when(
        prev.isNotNull() & (F.col(count_col) < prev), 1
    ).otherwise(0)
    running = Window.partitionBy(*key_cols).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("reset_session", F.sum(is_reset).over(running))


def rollover_total(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    count_col: str,
) -> DataFrame:
    """Per key: rollover-aware total production.

    MachineDetail.tsx:104-118 with counts 10,11,12,1,1,2,3,4,5 ->
    sessions {10,11,12} and {1,1,2,3,4,5} -> total 12 + 5 = 17.
    Null counts (empty minutes) are skipped, matching the client's
    ``!isNaN`` guard (MachineDetail.tsx:102-103).
    """
    nn = df.filter(F.col(count_col).isNotNull())
    sessions = with_reset_sessions(nn, key_cols, order_cols, count_col)
    per_session = sessions.groupBy(
        *[F.col(k) for k in key_cols], F.col("reset_session")
    ).agg(F.max(F.col(count_col)).alias("session_max"))
    return per_session.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.sum("session_max").alias("total_production")
    )
