"""SparkSession construction tuned for both local testing and scale.

The defaults below are chosen for the 100 TB design point and scaled
down by env vars for local runs:

- AQE on (runtime coalescing, skew-join splitting) so plans self-tune
  when stats are off at scale.
- ``spark.sql.shuffle.partitions`` defaults to the local core count;
  on a real cluster this is overridden (2-3x total cores).
- Session timezone pinned to UTC so event-time semantics are stable
  and oracle (DuckDB, TZ-naive) comparisons are exact.
- Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "machine_downtime_monitor_on_aws_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 12g, not "as much as the box has": an oversized heap lets
        # garbage (broadcasts, codegen classes) pile up until one
        # multi-second full GC; periodic GC keeps the context cleaner
        # draining those eagerly. Observed: 30-90s stalls at 48g.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # LIMIT-probe actions (connected_components' one-action
        # strategy switch) scan all partitions in ONE parallel round
        # instead of the default 1 -> 4x -> 16x sequential scale-up,
        # which serializes the final stage of an otherwise-parallel
        # job. Cheap insurance for every .limit(n).collect() probe.
        .config("spark.sql.limit.initialNumPartitions", cpus)
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Spark's RocksDB-backed state store provider (bundled rocksdbjni, no
# extra install). The default HDFSBackedStateStoreProvider keeps every
# streaming key's state on the executor HEAP - at 100x key cardinality
# (per-machine latest-status, per-source watermark aggs over a full
# fleet) that is an executor OOM. RocksDB spills state to local disk
# with an in-heap cache, the standard at-scale choice; the reference
# gets the same effect from DynamoDB's TTL-bounded storage
# (appsync-api-construct.ts:54). Applied per-query (a runtime SQL conf
# read at stream start), so batch-only sessions pay nothing.
ROCKSDB_STATE_STORE = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession) -> SparkSession:
    """Route all subsequently-started streaming queries' state to
    RocksDB (changelog checkpointing on, so commits upload deltas,
    not full snapshots)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_STORE)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
    return spark


def unpersist_all_rdds(spark: SparkSession, blocking: bool = False) -> int:
    """Release every persisted RDD (localCheckpoint barriers included,
    which ``spark.catalog.clearCache()`` does NOT cover). Uses the
    public JavaSparkContext.getPersistentRDDs() java.util.Map - not
    the scala-Map iterator the r4 advice flagged as version-brittle.
    Returns the number of RDDs unpersisted. Bench/test hygiene."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    # py4j exposes java.util.Map with the Python dict protocol
    for rdd in list(jmap.values()):
        rdd.unpersist(blocking)
        n += 1
    return n


def persistent_rdd_ids(spark: SparkSession) -> list[int]:
    """Ids of currently-persisted RDDs (leak assertions in tests)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return sorted(int(k) for k in jmap.keys())


def pin_utc(spark: SparkSession) -> SparkSession:
    """Pin the session TZ to UTC (runtime-settable).

    Every catalog query calls this so results are reproducible even
    when the caller's session was built with a different TZ.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
