"""Top-K per group (extension; reference has no LIMIT/top-k,
SURVEY.md SS2.6).

Window row_number + filter: one shuffle on the group key; with AQE
the per-partition sort is bounded. For global top-k prefer
``orderBy(...).limit(k)`` which Spark executes as a distributed
TakeOrdered (per-partition heap, no full sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
