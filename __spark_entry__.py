"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in machine_downtime_monitor_on_aws_spark/plans/
(catalog registry); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from machine_downtime_monitor_on_aws_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's BI
    downtime dataset (classify -> RLE -> DOWN-run totals),
    re-expressed as per-key lag/lead windows (SURVEY.md SS3.3)."""
    from machine_downtime_monitor_on_aws_spark.plans.domain import (
        status_downtime_totals,
    )

    return status_downtime_totals(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md SS2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted for non-SQL-expressible
    ops -> rows-only check)."""
    return catalog.oracle_sql()
