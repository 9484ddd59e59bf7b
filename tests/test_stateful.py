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


def test_stateful_on_rocksdb_state_store(spark, tmp_path):
    """r4 verdict #2: the default HDFSBackedStateStoreProvider keeps
    all streaming state on the executor heap - an OOM at 100x key
    cardinality. Run the custom stateful operator AND the
    watermark-dedup agg on the RocksDB provider (state spills to
    local disk, heap holds only a cache) with a key cardinality large
    enough to be a real signal, and assert (a) exact results, (b) the
    checkpoint actually contains RocksDB artifacts (changelog/zip
    uploads, not the HDFS provider's .delta files)."""
    import glob
    import json as _json

    from pyspark.sql import functions as F

    from machine_downtime_monitor_on_aws_spark.session import (
        use_rocksdb_state_store,
    )
    from machine_downtime_monitor_on_aws_spark.streaming.ingest import (
        dedup_within_watermark,
    )

    n_keys = 5000
    use_rocksdb_state_store(spark)
    try:
        # --- change_feed_stateful at 5k machines over two triggers ---
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(src)
        _write(src, "b1.jsonl", [
            {"machine_id": f"m{i}", "status": "UP", "event_epoch": 100, "__seq": i}
            for i in range(n_keys)
        ])
        out1 = _run(spark, src, ckpt)
        assert len(out1) == n_keys  # every machine is new -> emitted

        # second trigger: half flip to DOWN (emit), half unchanged
        # (suppressed) - proves per-key state survived in RocksDB
        _write(src, "b2.jsonl", [
            {"machine_id": f"m{i}", "status": "DOWN" if i % 2 == 0 else "UP",
             "event_epoch": 200, "__seq": n_keys + i}
            for i in range(n_keys)
        ])
        out2 = _run(spark, src, ckpt)
        assert len(out2) == n_keys // 2
        assert all(r.status == "DOWN" for r in out2)

        state_files = glob.glob(os.path.join(ckpt, "state", "**", "*"), recursive=True)
        assert any(f.endswith((".changelog", ".zip")) for f in state_files), state_files
        assert not any(f.endswith(".delta") for f in state_files)

        # --- watermark dedup agg at 5k record ids + redeliveries ---
        src2 = str(tmp_path / "redeliv")
        os.makedirs(src2)
        rows = []
        for i in range(n_keys):
            rows.append({"record_id": f"r{i}", "ts": "2021-03-05 18:00:00"})
            if i % 3 == 0:
                rows.append({"record_id": f"r{i}", "ts": "2021-03-05 18:00:01"})
        with open(os.path.join(src2, "a.jsonl"), "w") as f:
            f.write("\n".join(_json.dumps(r) for r in rows))
        stream = (
            spark.readStream.schema("record_id string, ts string")
            .json(src2)
            .withColumn("ts", F.to_timestamp("ts"))
        )
        ckpt2 = str(tmp_path / "ckpt2")
        q = (
            dedup_within_watermark(stream, ["record_id"], "ts")
            .writeStream.format("memory")
            .queryName("rocksdb_dedup_test")
            .option("checkpointLocation", ckpt2)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        n = spark.sql(
            "SELECT count(DISTINCT record_id) AS n, count(*) AS total "
            "FROM rocksdb_dedup_test"
        ).collect()[0]
        assert n.n == n_keys and n.total == n_keys  # exactly-once per id
        state_files2 = glob.glob(os.path.join(ckpt2, "state", "**", "*"), recursive=True)
        assert any(f.endswith((".changelog", ".zip")) for f in state_files2)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )
