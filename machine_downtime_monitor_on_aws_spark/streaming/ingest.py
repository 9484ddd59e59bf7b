"""Structured-Streaming ingest pipeline (SURVEY.md SS3.1).

The reference's hot path: Kinesis -> filter Lambda -> parse/classify
-> DynamoDB real-time table + AppSync change feed + Firehose raw
archive. Re-expressed as ONE streaming DataFrame with a
``foreachBatch`` fan-out:

    readStream (file/kafka/kinesis source of envelope records)
      -> decode + format-probe + explode      (operators/normalize)
      -> broadcast config join + classify      (operators/classify)
      -> foreachBatch:
           (a) reportable rows -> day-partitioned real-time store (S8)
           (b) latest-status delta vs snapshot -> change feed (S11/T3)
           (c) raw envelopes -> archive (S12)

Checkpointing replaces Lambda container reuse (T2); per-record error
isolation (T10) is the rejects split; config hot-reload (T6) is a
callable provider re-read each micro-batch - the Spark-idiomatic
equivalent of the reference's CONFIG_UPDATED_AT env-var bump
(update-filter-function/index.ts:11-84).

In local tests the source is a file stream of JSON-lines envelope
records; on a cluster the same pipeline binds to a Kafka/Kinesis
source - only `read_envelope_stream` changes.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import IngestConfig
from ..operators.classify import (
    classify_messages,
    machine_config_df,
    reportable_messages,
    to_real_time_rows,
)
from ..operators.latest import changed_rows, latest_by_key
from ..operators.normalize import normalize_stream, parse_envelopes
from ..sources.lake import with_day_partitions

ENVELOPE_SCHEMA = "record_id STRING, partition_key STRING, arrival_ts DOUBLE, data STRING"


def read_envelope_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-based envelope source (tests / replay). T1 micro-batching:
    maxFilesPerTrigger bounds batch size like the reference's
    batchSize=100 event source mapping."""
    return (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


@dataclass
class IngestSinks:
    """Where the fan-out lands (local-dir realization; swap paths for
    object-store URIs on a cluster)."""

    realtime_path: str
    archive_path: str | None = None
    snapshot_path: str | None = None  # latest-status store
    rejects_path: str | None = None  # quarantine (strictly better than
    # the reference, which only logs rejects - index.ts:86-90)
    change_feed: list = field(default_factory=list)  # collected deltas (test sink;
    # deltas are one row per changed machine, driver-safe by construction)


def run_ingest_stream(
    spark: SparkSession,
    source: DataFrame,
    config_provider: Callable[[], IngestConfig],
    sinks: IngestSinks,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Wire the full SS3.1 pipeline and start it.

    ``config_provider`` is called at every micro-batch (T6 hot
    reload): message formats parameterize the parse *plan*, machine
    configs land in a broadcast join - both rebuilt per batch, which
    is exactly the reference's reload-on-config-change without the
    env-var plumbing.
    """

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        cfg = config_provider().validate()

        # (c) raw archive first - archives even rejected records (S12:
        # Firehose taps the stream before the filter Lambda)
        if sinks.archive_path:
            batch_df.write.mode("append").json(sinks.archive_path)

        if sinks.rejects_path:
            from ..operators.normalize import split_rejects

            _, rejected = split_rejects(parse_envelopes(batch_df, list(cfg.formats)))
            rejected.drop("messages").write.mode("append").json(sinks.rejects_path)

        messages = normalize_stream(batch_df, list(cfg.formats), keep_cols=["record_id"])
        classified = classify_messages(
            messages, machine_config_df(batch_df.sparkSession, list(cfg.machines))
        )
        reportable = reportable_messages(classified)

        # (a) real-time store: day-partitioned append (S8/S9), TTL column
        rows = to_real_time_rows(reportable, cfg.retention_hours)
        with_day_partitions(
            rows.withColumn("event_ts", F.timestamp_seconds(F.col("message_timestamp"))),
            "event_ts",
        ).write.mode("append").partitionBy("year", "month", "day").parquet(
            sinks.realtime_path
        )

        # (b) latest-status + change-only emission (A1/T3): compare to
        # the prior snapshot, emit deltas, persist the new snapshot
        status_msgs = reportable.filter(F.col("msg_type") == "STATUS")
        latest = latest_by_key(
            status_msgs, ["machine_id"], "event_epoch", ["status"]
        ).select("machine_id", "status", F.col("event_epoch").alias("status_epoch"))
        if sinks.snapshot_path:
            sess = batch_df.sparkSession
            if os.path.isdir(sinks.snapshot_path) and any(
                f.endswith(".parquet")
                for _, _, fs in os.walk(sinks.snapshot_path)
                for f in fs
            ):
                prior = sess.read.parquet(sinks.snapshot_path)
                deltas = changed_rows(latest, prior, ["machine_id"], "status")
                merged = (
                    prior.join(latest.select("machine_id"), "machine_id", "left_anti")
                    .unionByName(latest)
                )
            else:
                deltas = latest
                merged = latest
            delta_rows = [r.asDict() for r in deltas.collect()]
            sinks.change_feed.extend(
                sorted(delta_rows, key=lambda r: r["machine_id"])
            )
            tmp = sinks.snapshot_path.rstrip("/") + "__next"
            merged.write.mode("overwrite").parquet(tmp)
            import shutil

            if os.path.isdir(sinks.snapshot_path):
                shutil.rmtree(sinks.snapshot_path)
            shutil.move(tmp, sinks.snapshot_path)

    return (
        source.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_latest_status(
    spark: SparkSession, source_messages: DataFrame, queryName: str = "latest_status"
) -> StreamingQuery:
    """T2/T3 as a *pure* streaming aggregation: update-mode
    ``max_by(status, ts)`` per machine. Spark's state store holds one
    row per machine; update-mode output IS the change feed (a row is
    emitted only when its aggregate changes). This is the
    order-insensitive upgrade over the reference's per-batch sort
    (T5): late rows can never regress the status."""
    agg = source_messages.groupBy("machine_id").agg(
        F.max_by("status", F.col("event_epoch")).alias("status"),
        F.max("event_epoch").alias("status_epoch"),
    )
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
