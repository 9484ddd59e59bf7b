"""Registry mapping query names -> (Spark builder, DuckDB oracle SQL).

The driver contract (__spark_entry__.py) runs each Spark query and its
oracle side-by-side and hash-compares values, so builders here must:

- alias every computed column identically to the oracle SQL;
- produce engine-stable values (decimals / bigints / identical IEEE
  double expressions), never order-dependent float accumulations;
- pin the session to UTC (timestamps in parquet are naive-UTC and
  DuckDB reads them TZ-naive).

Resource contract: a few builders (minhash_estimate_qa) take lazy
localCheckpoint barriers so one hash pipeline feeds several legs;
the pinned RDD ids ride the returned frame as
``_spark_graft_ckpt_ids``. Long-lived callers should free them after
consuming the frame - ``streaming.store.release_checkpoint(df)``
(deterministic, per-frame) or ``session.unpersist_all_rdds(spark)``
(the sweep bench.py runs between measurements). Short-lived sessions
can ignore this; the blocks die with the context.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
