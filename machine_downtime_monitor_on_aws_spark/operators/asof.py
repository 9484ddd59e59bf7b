"""As-of (most-recent-preceding) joins.

Spark has no native as-of join (the guide's SS'Common OLAP patterns'
names the standard emulations). Two formulations here:

- ``asof_union``: union the two sides tagged, one window pass per key
  with ``last(..., ignorenulls)`` over the preceding frame. One
  shuffle on the key, no per-group pandas - the 100 TB path when both
  sides share the key space.
- ``pd.merge_asof`` via ``applyInPandas`` would be the fallback for
  tolerance/nearest semantics; not needed for the backward case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    strict: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right-side ``value_cols``
    with right.ts < left.ts (strict) or <= (non-strict), per key.

    Implementation: tag and union both sides, sort within key by
    (ts, side) via a single window, carry right values forward with
    ignore-nulls ``last`` over the preceding frame, then keep left
    rows. The side tag orders right rows *before* left rows at equal
    timestamps for the non-strict case and after for strict - giving
    exact <= / < semantics without a range join.
    """
    lt = left.withColumn("__side", F.lit(1))
    rt_cols = key_cols + [ts_col] + value_cols
    drop_tiebreak = False
    if tiebreak_col and tiebreak_col not in rt_cols:
        rt_cols.append(tiebreak_col)
    if tiebreak_col and tiebreak_col not in left.columns:
        # the union below projects to the LEFT schema, so a
        # right-only tiebreak column must exist there too (NULL for
        # left rows - they never contribute values, so their order
        # among themselves is irrelevant); drop it from the output
        lt = lt.withColumn(
            tiebreak_col,
            F.lit(None).cast(right.schema[tiebreak_col].dataType),
        )
        drop_tiebreak = True
    # strict (<): equal-ts right rows sort AFTER left -> excluded from
    # the preceding frame; non-strict (<=): before -> included
    rt = right.select(*rt_cols).withColumn("__side", F.lit(2 if strict else 0))
    # align schemas: left keeps its columns, right rows have nulls there
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    marked = []
    for v in value_cols:
        rv = f"__r_{v}"
        rt = rt.withColumn(rv, F.col(v))
        lt = lt.withColumn(rv, F.lit(None).cast(right.schema[v].dataType))
        marked.append(rv)
    lt = lt.withColumn("__is_left", F.lit(True))
    rt = rt.withColumn("__is_left", F.lit(False))
    unioned = lt.unionByName(rt.select(*lt.columns))
    order = [F.col(ts_col), F.col("__side")]
    if tiebreak_col:
        # deterministic pick among equal-(ts, side) right rows
        order.append(F.col(tiebreak_col))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = unioned
    for v, rv in zip(value_cols, marked):
        out = out.withColumn(f"asof_{v}", F.last(F.col(rv), ignorenulls=True).over(w))
    dropped = ["__side", "__is_left", *marked]
    if drop_tiebreak:
        dropped.append(tiebreak_col)
    return out.filter(F.col("__is_left")).drop(*dropped)
