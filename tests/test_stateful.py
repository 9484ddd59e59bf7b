"""applyInPandasWithState change feed + skew utilities."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.skew import (
    salted_agg,
    top_hot_keys,
)
from machine_downtime_monitor_on_aws_spark.streaming.stateful import (
    change_feed_stateful,
)


def _write(src_dir, name, rows):
    with open(os.path.join(src_dir, name), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))


def _run(spark, src_dir, ckpt):
    """Drain all available input through the stateful operator; the
    checkpointed state store carries machine state across calls
    (memory sink can't recover from checkpoints - use foreachBatch)."""
    collected: list = []
    stream = (
        spark.readStream.schema(
            "machine_id string, status string, event_epoch long, __seq long"
        ).json(src_dir)
    )
    q = (
        change_feed_stateful(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _eid: collected.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return collected


def test_stateful_change_feed(spark, tmp_path):
    """Exact reference semantics (index.ts:177-186): emit on change or
    new machine only; event-time regression can't overwrite newer
    state; state survives across micro-batch triggers via the
    checkpointed state store."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _write(src, "b1.jsonl", [
        {"machine_id": "m1", "status": "UP", "event_epoch": 100, "__seq": 1},
        {"machine_id": "m1", "status": "DOWN", "event_epoch": 90, "__seq": 2},  # older, loses
        {"machine_id": "m2", "status": "IDLE", "event_epoch": 10, "__seq": 3},
    ])
    out = {r.machine_id: r for r in _run(spark, src, ckpt)}
    assert out["m1"].status == "UP" and out["m1"].status_epoch == 100
    assert out["m2"].status == "IDLE"
    assert all(r.changed_at_epoch > 0 for r in out.values())

    # batch 2: same status for m1 (no emission), late regression for
    # m2 (ignored), real change for m2 at a newer epoch (emitted)
    _write(src, "b2.jsonl", [
        {"machine_id": "m1", "status": "UP", "event_epoch": 200, "__seq": 4},
        {"machine_id": "m2", "status": "DOWN", "event_epoch": 5, "__seq": 5},
    ])
    rows2 = _run(spark, src, ckpt)
    assert rows2 == []  # m1 unchanged, m2 regression dropped

    _write(src, "b3.jsonl", [
        {"machine_id": "m2", "status": "DOWN", "event_epoch": 50, "__seq": 6},
    ])
    rows3 = _run(spark, src, ckpt)
    assert len(rows3) == 1 and rows3[0].status == "DOWN" and rows3[0].status_epoch == 50


def test_salted_agg_matches_plain(spark):
    """Salted two-stage agg == plain agg for algebraic functions."""
    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    plain = {
        (r.k,): (r.total, r.n, r.lo, r.hi)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.count("v").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }
    salted = {
        (r.k,): (r.total, r.n, r.lo, r.hi)
        for r in salted_agg(
            df,
            ["k"],
            {
                "total": ("v", "sum"),
                "n": ("v", "count"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
            },
            num_salts=8,
        ).collect()
    }
    assert plain == salted


def test_top_hot_keys(spark):
    df = spark.createDataFrame(
        [("hot",)] * 90 + [("cold",)] * 10, "k string"
    )
    hot = top_hot_keys(df, ["k"], threshold_ratio=0.5).collect()
    assert [r.k for r in hot] == ["hot"]
