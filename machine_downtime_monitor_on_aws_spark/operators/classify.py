"""Message classification + status mapping (J1/P3/P4/P5).

The reference looks each message's machine up in an in-memory config
hashmap (``machine-data-parser.ts:70-82``): a message is a STATUS
message iff its tag equals the machine's configured status tag, a
PRODUCTION_COUNT message iff it equals the production-count tag;
unconfigured machines classify nothing. Status values map through
comma-separated up/down/idle lists, matched as trimmed strings
(:86-97); an unmapped status value leaves the status NULL and the row
is dropped from the reportable set (``index.ts:70-76``). Reportable =
production-count OR mapped-status (``index.ts:61,76``).

Spark-first: the config map is a small DataFrame on the broadcast
side of a stream-static LEFT join - the hashmap lookup *is* a
broadcast hash join. Value lists become array columns once at
config-build time, membership is ``array_contains`` - no per-row
splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import (
    MSG_TYPE_PRODUCTION_COUNT,
    MSG_TYPE_STATUS,
    STATUS_DOWN,
    STATUS_IDLE,
    STATUS_UP,
    MachineConfig,
)

CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("machine_id", T.StringType(), False),
        T.StructField("status_tag", T.StringType(), True),
        T.StructField("production_count_tag", T.StringType(), True),
        T.StructField("up_values", T.ArrayType(T.StringType()), True),
        T.StructField("down_values", T.ArrayType(T.StringType()), True),
        T.StructField("idle_values", T.ArrayType(T.StringType()), True),
    ]
)


def machine_config_df(spark: SparkSession, configs: list[MachineConfig]) -> DataFrame:
    """Materialize configs as the broadcast-side lookup table."""
    rows = [
        (
            c.id,
            c.status_tag,
            c.production_count_tag,
            c.up_values,
            c.down_values,
            c.idle_values,
        )
        for c in configs
    ]
    return spark.createDataFrame(rows, CONFIG_SCHEMA)


def machine_config_from_ids(
    ids: DataFrame,
    id_col: str = "machine_id",
    status_tag: str | None = None,
    production_count_tag: str | None = None,
    up_values: tuple[str, ...] = (),
    down_values: tuple[str, ...] = (),
    idle_values: tuple[str, ...] = (),
) -> DataFrame:
    """Distributed config synthesis: one config row per id in ``ids``
    with shared (literal) settings - for config universes keyed by the
    machine-id set itself. No driver collect: the id set stays a
    DataFrame however many machines exist (r1 "What's wrong" #5
    flagged the collect-based synthesis in the catalog)."""

    def arr(vals: tuple[str, ...]):
        if not vals:
            return F.lit(None).cast("array<string>")
        return F.array(*[F.lit(v.strip()) for v in vals])

    return ids.select(
        F.col(id_col).cast("string").alias("machine_id"),
        F.lit(status_tag).cast("string").alias("status_tag"),
        F.lit(production_count_tag).cast("string").alias("production_count_tag"),
        arr(up_values).alias("up_values"),
        arr(down_values).alias("down_values"),
        arr(idle_values).alias("idle_values"),
    )


def classify_messages(messages: DataFrame, config: DataFrame) -> DataFrame:
    """LEFT-join config and add ``is_status_msg`` / ``is_production_msg``
    / ``status`` / ``msg_type`` columns.

    ``config`` is broadcast (tiny dimension): the stream side never
    shuffles - same physical shape as the reference's per-message
    hashmap probe, but vectorized.
    """
    joined = messages.join(F.broadcast(config), on="machine_id", how="left")
    value = F.trim(F.col("value"))
    is_status = F.col("status_tag").isNotNull() & (F.col("tag") == F.col("status_tag"))
    is_prod = F.col("production_count_tag").isNotNull() & (
        F.col("tag") == F.col("production_count_tag")
    )
    status = (
        F.when(F.array_contains(F.coalesce(F.col("up_values"), F.array()), value), STATUS_UP)
        .when(F.array_contains(F.coalesce(F.col("down_values"), F.array()), value), STATUS_DOWN)
        .when(F.array_contains(F.coalesce(F.col("idle_values"), F.array()), value), STATUS_IDLE)
    )
    return (
        joined.withColumn("is_status_msg", is_status)
        .withColumn("is_production_msg", is_prod)
        .withColumn("status", F.when(is_status, status))
        .withColumn(
            "msg_type",
            F.when(is_prod, MSG_TYPE_PRODUCTION_COUNT).when(
                is_status, MSG_TYPE_STATUS
            ),
        )
        .drop(
            "status_tag",
            "production_count_tag",
            "up_values",
            "down_values",
            "idle_values",
        )
    )


def reportable_messages(classified: DataFrame) -> DataFrame:
    """P5: production-count msgs, plus status msgs whose value mapped
    (index.ts:61-76)."""
    return classified.filter(
        F.col("is_production_msg")
        | (F.col("is_status_msg") & F.col("status").isNotNull())
    )


def to_real_time_rows(reportable: DataFrame, retention_hours: int = 24) -> DataFrame:
    """Shape reportable messages as real-time-store rows
    (``index.ts:76-84``): composite key ``{TYPE}_{machineId}``, event
    epoch, TTL expiration, stringified value (status enum for STATUS
    rows, raw value for PRODUCTION_COUNT rows)."""
    return reportable.select(
        F.concat_ws("_", F.col("msg_type"), F.col("machine_id")).alias("id"),
        F.col("machine_id"),
        F.col("msg_type"),
        F.col("event_epoch").alias("message_timestamp"),
        (F.col("event_epoch") + F.lit(retention_hours * 3600)).alias("ttl_expiration_ts"),
        F.when(F.col("msg_type") == MSG_TYPE_STATUS, F.col("status"))
        .otherwise(F.col("value"))
        .alias("value"),
    )


def new_machines(messages: DataFrame, known: DataFrame) -> DataFrame:
    """J2/A2: distinct machine ids never seen before (left-anti join
    against the known set; ``index.ts:53-56,154-163``)."""
    return (
        messages.select("machine_id")
        .distinct()
        .join(known.select("machine_id").distinct(), "machine_id", "left_anti")
    )
