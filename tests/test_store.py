"""KeyedParquetStore: partition-pruned upsert semantics and the
O(batch)-not-O(snapshot) merge property (r1 verdict item #4).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.streaming.store import KeyedParquetStore


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "machine_id string, status string, status_epoch long"
    )


def test_upsert_merge_and_deltas(spark, tmp_path):
    store = KeyedParquetStore(str(tmp_path / "st"), "machine_id", num_buckets=8)

    d1 = store.upsert(
        _df(spark, [("m1", "UP", 10), ("m2", "DOWN", 10)]), compare_col="status"
    )
    assert {(r.machine_id, r.status) for r in d1.collect()} == {
        ("m1", "UP"),
        ("m2", "DOWN"),
    }

    # m1 changes, m2 unchanged (newer epoch), m3 new
    d2 = store.upsert(
        _df(spark, [("m1", "DOWN", 20), ("m2", "DOWN", 20), ("m3", "UP", 20)]),
        compare_col="status",
    )
    assert {(r.machine_id, r.status) for r in d2.collect()} == {
        ("m1", "DOWN"),
        ("m3", "UP"),
    }

    snap = {r.machine_id: (r.status, r.status_epoch) for r in store.read(spark).collect()}
    assert snap == {"m1": ("DOWN", 20), "m2": ("DOWN", 20), "m3": ("UP", 20)}


def test_upsert_touches_only_affected_buckets(spark, tmp_path):
    """The scale property: upserting one key must not read or rewrite
    buckets it doesn't hash into. Proven at the filesystem level -
    untouched bucket partitions keep their exact files (names, sizes,
    mtimes)."""
    path = str(tmp_path / "st")
    store = KeyedParquetStore(path, "machine_id", num_buckets=16)
    seed = _df(spark, [(f"m{i}", "UP", 1) for i in range(200)])
    store.upsert(seed, compare_col="status")

    def bucket_files():
        out = {}
        for d in os.listdir(path):
            if not d.startswith("__kb="):
                continue
            full = os.path.join(path, d)
            out[d] = {
                (f, os.path.getmtime(os.path.join(full, f)), os.path.getsize(os.path.join(full, f)))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
        return out

    before = bucket_files()
    assert len(before) > 4  # keys spread over several buckets

    store.upsert(_df(spark, [("m7", "DOWN", 2)]), compare_col="status")
    after = bucket_files()

    target = store._bucket()
    [kb] = [
        r[0]
        for r in spark.createDataFrame([("m7",)], "machine_id string")
        .select(target)
        .collect()
    ]
    touched = f"__kb={kb}"
    changed = {d for d in before if before[d] != after.get(d)}
    assert changed == {touched}, f"buckets rewritten: {changed}, expected only {touched}"
    # and the merge preserved the touched bucket's other keys
    snap = {r.machine_id: r.status for r in store.read(spark).collect()}
    assert snap["m7"] == "DOWN" and len(snap) == 200


def test_upsert_without_compare_col_returns_all(spark, tmp_path):
    store = KeyedParquetStore(str(tmp_path / "st"), "machine_id", num_buckets=4)
    store.upsert(_df(spark, [("a", "UP", 1)]))
    d = store.upsert(_df(spark, [("a", "UP", 2)]))
    assert [r.machine_id for r in d.collect()] == ["a"]
    assert store.read(spark).collect()[0].status_epoch == 2


def test_keyed_store_first_seen_wins(spark, tmp_path):
    """keep_existing=True: a key already in the store keeps its
    stored row (content-addressed semantics), deltas are exactly the
    new keys, and replaying the same batch is a no-op."""
    import pytest

    from machine_downtime_monitor_on_aws_spark.streaming.store import (
        KeyedParquetStore,
        release_checkpoint,
    )

    store = KeyedParquetStore(str(tmp_path / "cas"), "k", 8)
    b1 = spark.createDataFrame([("a", 1), ("b", 1)], "k string, ref int")
    d1 = store.upsert(b1, keep_existing=True)
    assert {(r.k, r.ref) for r in d1.collect()} == {("a", 1), ("b", 1)}
    release_checkpoint(d1)

    # second batch: 'a' re-arrives with a DIFFERENT ref (first seen
    # wins - stored row keeps ref 1), 'c' is genuinely new
    b2 = spark.createDataFrame([("a", 2), ("c", 2)], "k string, ref int")
    d2 = store.upsert(b2, keep_existing=True)
    assert {(r.k, r.ref) for r in d2.collect()} == {("c", 2)}
    release_checkpoint(d2)
    assert {(r.k, r.ref) for r in store.read(spark).collect()} == {
        ("a", 1), ("b", 1), ("c", 2),
    }

    # replaying a fully-landed batch produces zero deltas
    d3 = store.upsert(b2, keep_existing=True)
    assert d3.count() == 0
    release_checkpoint(d3)

    with pytest.raises(ValueError, match="mutually exclusive"):
        store.plan_upsert(b2, compare_col="ref", keep_existing=True)


def test_tracked_checkpoint_merges_nested_ids(spark):
    """r17 ADVICE #3: checkpointing a frame that itself carries
    tracked ids must ride them outward - release of the OUTER frame
    frees every pinned RDD in the chain (and double-release stays a
    no-op)."""
    from machine_downtime_monitor_on_aws_spark.streaming.store import (
        _tracked_local_checkpoint,
        release_checkpoint,
    )

    inner = _tracked_local_checkpoint(
        spark.createDataFrame([(1, "a")], "k int, v string")
    )
    assert len(inner._spark_graft_ckpt_ids) == 1
    outer = _tracked_local_checkpoint(inner)
    assert set(outer._spark_graft_ckpt_ids) >= set(inner._spark_graft_ckpt_ids)
    assert len(outer._spark_graft_ckpt_ids) == 2
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in outer._spark_graft_ckpt_ids:
        assert jmap.get(rid) is not None
    release_checkpoint(outer)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in outer._spark_graft_ckpt_ids:
        assert jmap.get(rid) is None
    # releasing the inner again is a safe no-op
    release_checkpoint(inner)


def test_is_checkpoint_scan_detects_barrier_frames(spark):
    from machine_downtime_monitor_on_aws_spark.streaming.store import (
        _is_checkpoint_scan,
        _tracked_local_checkpoint,
        release_checkpoint,
    )

    # a createDataFrame frame is itself a bare RDD scan (no upstream
    # pipeline a barrier would protect) - True is correct for it too
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    assert _is_checkpoint_scan(df) is True
    ck = _tracked_local_checkpoint(df)
    assert _is_checkpoint_scan(ck) is True
    # a transform on top is no longer a bare checkpoint scan
    assert _is_checkpoint_scan(ck.select("k")) is False
    # a storage-backed relation is not an RDD scan
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ck.write.mode("overwrite").parquet(f"{d}/p")
        assert _is_checkpoint_scan(spark.read.parquet(f"{d}/p")) is False
    release_checkpoint(ck)
