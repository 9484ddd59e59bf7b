"""Run-length encoding of a value stream + run durations.

Re-expresses the reference's Athena downtime SQL
(``source/lambda/solution-helper/create-quicksight.ts:12-49``), which
uses a *global* ``ROW_NUMBER() OVER (ORDER BY id, tag, timestamp)``
and two self-joins (``r2.row_num = r1.row_num - 1`` /
``j2.row_num = j1.row_num + 1``) to find change points and run
durations.

A global row_number forces every row through a single partition - a
non-starter at 100 TB. Because the reference's self-joins guard on
``same id AND same tag`` (create-quicksight.ts:26-27,40-41), the
computation is semantically per-(id, tag): we use ``lag``/``lead``
windows partitioned by the key columns, which shuffle once by key and
parallelize across all executors. Semantics preserved exactly:

- a row is a change point iff its value differs from the previous row
  of the same key, or it has no predecessor
  (create-quicksight.ts:31-35);
- run duration = next change-point timestamp - this one
  (create-quicksight.ts:42-44); the final (open-ended) run per key is
  dropped, matching the reference's WHERE that requires a successor
  (create-quicksight.ts:45-48).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_points(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Keep only rows where ``value_col`` differs from the previous row
    within each key group (plus each key's first row).

    ``order_cols`` must make the per-key ordering total (pass a
    tie-breaker column such as a row id) or run boundaries are
    nondeterministic.
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    prev = F.lag(F.col(value_col)).over(w)
    return (
        df.withColumn("__prev", prev)
        .filter(F.col("__prev").isNull() | (F.col(value_col) != F.col("__prev")))
        .drop("__prev")
    )


def run_durations(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    ts_col: str,
    keep_open_runs: bool = False,
) -> DataFrame:
    """RLE-compress ``df`` and compute per-run durations in seconds.

    Returns the change-point rows with ``duration_seconds`` (bigint).
    ``keep_open_runs=False`` reproduces the reference's behavior of
    dropping each key's last run (no successor to diff against);
    ``True`` keeps it with NULL duration - strictly more information,
    useful for live dashboards where the current run is still open.
    """
    cps = change_points(df, key_cols, order_cols, value_col)
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    next_ts = F.lead(F.col(ts_col)).over(w)
    out = cps.withColumn(
        "duration_seconds",
        (next_ts.cast("long") - F.col(ts_col).cast("long")),
    )
    if not keep_open_runs:
        out = out.filter(F.col("duration_seconds").isNotNull())
    return out


def state_durations(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    ts_col: str,
) -> DataFrame:
    """Reference-shaped duration rows: seconds/minutes/hours.

    Mirrors the Athena projection ``duration, duration/60.0,
    duration/3600.0`` typed DECIMAL (create-quicksight.ts:42-44,
    125-127). Minutes/hours are exact decimals so results hash-match
    any engine.
    """
    runs = run_durations(df, key_cols, order_cols, value_col, ts_col)
    dur = F.col("duration_seconds").cast("decimal(18,6)")
    return runs.withColumn(
        "duration_minutes", (dur / F.lit(60)).cast("decimal(18,6)")
    ).withColumn("duration_hours", (dur / F.lit(3600)).cast("decimal(18,6)"))
