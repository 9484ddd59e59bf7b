"""Takedown / right-to-be-forgotten purge surfaces (r7 verdict
What's-wrong #1): purge_from_ivf_corpus, purge_from_minhash_index,
KeyedParquetStore.delete_keys, and the streaming dedup loop's
takedown drain.

The physical claims under test are the ones the docstrings make:
untouched partitions stay byte-for-byte identical, partitions the
purge EMPTIES are actually removed (the dynamic-overwrite step-3
trap), re-runs are no-ops, and a crash between the rewrite and the
emptied-partition removal heals on re-run.
"""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

_DIM = 8
_N_CENTROIDS = 4


def _vec(i: int) -> list[float]:
    # cluster structure: vectors near one of 4 well-separated axes
    base = [0.0] * _DIM
    base[i % _N_CENTROIDS] = 10.0
    base[(i % _N_CENTROIDS) + 4] = float(i % 7) / 7.0 + 0.1
    return base


def _emb(spark, n: int, start: int = 0):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(start, start + n)],
        "vec_id long, vec array<double>",
    )


def _file_digests(root: str) -> dict[str, str]:
    """relative path -> md5 for every data file under root (crc
    sidecars and _SUCCESS markers excluded - they are bookkeeping)."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith(".") or f.startswith("_"):
                continue
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(fh.read()).hexdigest()
    return out


def test_ivf_purge_counts_and_byte_identical_untouched(spark, tmp_path):
    """Purging a handful of ids removes exactly those corpus rows,
    returns the hit count, leaves every UNTOUCHED list partition's
    files byte-for-byte identical, and a re-run is a 0-hit no-op
    that rewrites nothing at all."""
    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        build_ivf_index,
        purge_from_ivf_corpus,
        search_ivf_index,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(_emb(spark, 40), path, _N_CENTROIDS, _DIM)
    corpus_dir = os.path.join(path, "corpus")
    before = _file_digests(corpus_dir)
    victims = [5, 17]  # both in list_id=1 (i % 4 == 1)
    victim_lists = {
        r.list_id
        for r in spark.read.parquet(corpus_dir)
        .filter(F.col("vec_id").isin(victims))
        .select("list_id")
        .collect()
    }
    ids = spark.createDataFrame([(v,) for v in victims], "vec_id long")

    n = purge_from_ivf_corpus(spark, path, ids)
    assert n == len(victims)
    remaining = spark.read.parquet(corpus_dir)
    assert remaining.filter(F.col("vec_id").isin(victims)).count() == 0
    assert remaining.count() == 40 - len(victims)

    after = _file_digests(corpus_dir)
    untouched_before = {
        p: d
        for p, d in before.items()
        if not any(f"list_id={l}" in p for l in victim_lists)
    }
    untouched_after = {p: after[p] for p in untouched_before}
    assert untouched_before == untouched_after and untouched_before

    # searches never return purged ids
    q = spark.createDataFrame([(1000, _vec(5))], "qid long, qvec array<double>")
    hits = search_ivf_index(spark, path, q, k=5, n_probes=2, dim=_DIM)
    assert victims[0] not in {r.neighbor_id for r in hits.collect()}

    # idempotent re-run: 0 hits, zero file churn
    snap = _file_digests(corpus_dir)
    assert purge_from_ivf_corpus(spark, path, ids) == 0
    assert _file_digests(corpus_dir) == snap


def test_ivf_purge_removes_emptied_partition(spark, tmp_path):
    """Purging EVERY row of a list must remove the partition
    directory (dynamic overwrite alone would leave its old files
    serving the purged rows - the step-3 trap)."""
    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        build_ivf_index,
        purge_from_ivf_corpus,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(_emb(spark, 24), path, _N_CENTROIDS, _DIM)
    corpus_dir = os.path.join(path, "corpus")
    target_list = 2
    members = [
        r.vec_id
        for r in spark.read.parquet(corpus_dir)
        .filter(F.col("list_id") == target_list)
        .select("vec_id")
        .collect()
    ]
    assert members
    ids = spark.createDataFrame([(v,) for v in members], "vec_id long")
    n = purge_from_ivf_corpus(spark, path, ids)
    assert n == len(members)
    assert not os.path.exists(os.path.join(corpus_dir, f"list_id={target_list}"))
    left = spark.read.parquet(corpus_dir)
    assert left.filter(F.col("list_id") == target_list).count() == 0
    assert left.count() == 24 - len(members)


def test_ivf_purge_crash_between_rewrite_and_cleanup_heals(
    spark, tmp_path, monkeypatch
):
    """Crash window: the rewrite (step 2) committed but the emptied-
    partition removal (step 3) never ran. The purged rows are then
    still VISIBLE (the emptied partition kept its old files), and the
    documented contract is that re-running the purge re-detects and
    completes the removal."""
    from machine_downtime_monitor_on_aws_spark import fsio
    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        build_ivf_index,
        purge_from_ivf_corpus,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(_emb(spark, 24), path, _N_CENTROIDS, _DIM)
    corpus_dir = os.path.join(path, "corpus")
    target_list = 3
    members = [
        r.vec_id
        for r in spark.read.parquet(corpus_dir)
        .filter(F.col("list_id") == target_list)
        .select("vec_id")
        .collect()
    ]
    ids = spark.createDataFrame([(v,) for v in members], "vec_id long")

    real_delete = fsio.delete

    def crash_delete(s, p, recursive=True):
        if f"list_id={target_list}" in p:
            raise RuntimeError("simulated crash before cleanup")
        return real_delete(s, p, recursive)

    monkeypatch.setattr(fsio, "delete", crash_delete)
    with pytest.raises(RuntimeError, match="simulated crash"):
        purge_from_ivf_corpus(spark, path, ids)
    monkeypatch.setattr(fsio, "delete", real_delete)

    # the half-finished state: old files still serve the purged rows
    assert os.path.exists(os.path.join(corpus_dir, f"list_id={target_list}"))
    assert (
        spark.read.parquet(corpus_dir)
        .filter(F.col("vec_id").isin(members))
        .count()
        == len(members)
    )

    # re-run heals: re-detects the same hits and completes step 3
    n = purge_from_ivf_corpus(spark, path, ids)
    assert n == len(members)
    assert not os.path.exists(os.path.join(corpus_dir, f"list_id={target_list}"))
    assert (
        spark.read.parquet(corpus_dir).filter(F.col("vec_id").isin(members)).count()
        == 0
    )


def test_ivfpq_and_epoch_layout_purge(spark, tmp_path):
    """The same purge serves the IVF-PQ codes layout and the
    epoch-partitioned layout: the (__epoch, list_id) predicate must
    only target hit partitions, and other epochs' copies of a list
    stay byte-identical."""
    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        append_to_ivf_index,
        build_ivf_index,
        build_ivfpq_index,
        purge_from_ivf_corpus,
    )

    # --- IVF-PQ codes layout ---
    pq_path = str(tmp_path / "ivfpq")
    books = [_vec(i) for i in range(4)]
    build_ivfpq_index(
        _emb(spark, 24), pq_path, _N_CENTROIDS, _DIM, 2, books, residual=True
    )
    ids = spark.createDataFrame([(7,), (11,)], "vec_id long")
    assert purge_from_ivf_corpus(spark, pq_path, ids) == 2
    pq_corpus = spark.read.parquet(f"{pq_path}/corpus")
    assert pq_corpus.filter(F.col("vec_id").isin([7, 11])).count() == 0
    assert pq_corpus.count() == 22

    # --- epoch-partitioned raw layout ---
    ep_path = str(tmp_path / "ivf_ep")
    build_ivf_index(
        _emb(spark, 16), ep_path, _N_CENTROIDS, _DIM, epoch_partitioned=True
    )
    append_to_ivf_index(_emb(spark, 8, start=100), ep_path, _DIM, epoch="e1")
    corpus_dir = os.path.join(ep_path, "corpus")
    before = _file_digests(corpus_dir)
    # victim 101 lives in epoch e1 / list 1; epoch 'base' copies of
    # list 1 must stay byte-identical
    ids = spark.createDataFrame([(101,)], "vec_id long")
    assert purge_from_ivf_corpus(spark, ep_path, ids) == 1
    after = _file_digests(corpus_dir)
    base_before = {p: d for p, d in before.items() if "__epoch=base" in p}
    assert {p: after[p] for p in base_before} == base_before and base_before
    left = spark.read.parquet(corpus_dir)
    assert left.filter(F.col("vec_id") == 101).count() == 0
    assert left.count() == 16 + 8 - 1


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, body string")


def test_minhash_purge_counts_idempotence_and_layout(spark):
    """Purging docs from the band index removes every band row of
    exactly those docs, preserves the stamped params and bucketed
    layout (probes keep working, and keep finding the survivors),
    and a re-run returns 0 without rewriting."""
    from machine_downtime_monitor_on_aws_spark.operators.dedup import (
        incremental_candidate_pairs,
        minhash_band_arrays,
        minhash_index_stats,
        purge_from_minhash_index,
        read_minhash_index_params,
        write_minhash_index,
    )

    table = "mh_purge_test"
    docs = _corpus(
        spark,
        [(i, f"historical document {i} with common tail words") for i in range(20)]
        + [(50, "a duplicated body shared across history"),
           (51, "a duplicated body shared across history")],
    )
    try:
        ba = minhash_band_arrays(docs, "doc_id", "body", parallelism=4)
        write_minhash_index(
            ba, table, num_buckets=8, num_perms=8, num_bands=4, shingle_n=5
        )
        params_before = read_minhash_index_params(spark, table)
        stats_before = minhash_index_stats(spark, table)

        ids = spark.createDataFrame([(50,), (999,)], "doc_id long")
        n = purge_from_minhash_index(spark, table, ids)
        assert n == 1  # 999 was never indexed
        tbl = spark.table(table)
        assert tbl.filter(F.col("doc_id") == 50).count() == 0
        assert tbl.select("doc_id").distinct().count() == 21

        # params stamp + bucket layout survive the rewrite
        assert read_minhash_index_params(spark, table) == params_before
        stats_after = minhash_index_stats(spark, table)
        assert stats_after["num_buckets"] == stats_before["num_buckets"]

        # a probe that duplicates the purged body pairs ONLY with the
        # surviving twin - the purged doc is unfindable
        probe = _corpus(spark, [(200, "a duplicated body shared across history")])
        got = sorted(
            tuple(r)
            for r in incremental_candidate_pairs(
                spark,
                minhash_band_arrays(probe, "doc_id", "body", parallelism=4),
                table,
                4,
            ).collect()
        )
        assert got == [(51, 200)]

        # idempotent: zero hits, no rewrite
        assert purge_from_minhash_index(spark, table, ids) == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_keyed_store_delete_keys(spark, tmp_path):
    """delete_keys removes exactly the requested keys, leaves
    untouched bucket files byte-identical, removes buckets it
    empties, and re-runs as a 0-hit no-op."""
    from machine_downtime_monitor_on_aws_spark.streaming.store import (
        KeyedParquetStore,
    )

    path = str(tmp_path / "store")
    store = KeyedParquetStore(path, "doc_id", num_buckets=4)
    rows = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "doc_id long, component long"
    )
    store.upsert(rows)
    before = _file_digests(path)

    # empty one bucket entirely: delete every key hashing into it
    # (bucket membership materialized BEFORE the delete - the frame's
    # file listing is stale afterwards by design)
    by_bucket: dict[int, list[int]] = {}
    for r in (
        spark.read.parquet(path)
        .withColumn(
            "__b",
            F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(4)).cast("int"),
        )
        .collect()
    ):
        by_bucket.setdefault(r["__b"], []).append(r["doc_id"])
    target = min(by_bucket, key=lambda b: (len(by_bucket[b]), b))
    victims = by_bucket[target]
    extra_bucket = next(b for b in sorted(by_bucket) if b != target)
    extra = by_bucket[extra_bucket][0]
    keys = spark.createDataFrame([(v,) for v in [*victims, extra]], "doc_id long")

    n = store.delete_keys(keys)
    assert n == len(victims) + 1
    assert not os.path.exists(os.path.join(path, f"__kb={target}"))
    left = store.read(spark)
    assert left.count() == 20 - n
    assert left.filter(F.col("doc_id").isin([*victims, extra])).count() == 0
    # buckets holding neither victim nor extra: byte-identical
    untouched = {
        p: d
        for p, d in before.items()
        if f"__kb={target}" not in p and f"__kb={extra_bucket}" not in p
    }
    after = _file_digests(path)
    assert {p: after[p] for p in untouched} == untouched and untouched
    assert store.delete_keys(keys) == 0


def test_keyed_store_delete_keys_crash_before_cleanup_heals(
    spark, tmp_path, monkeypatch
):
    """Crash window for KeyedParquetStore.delete_keys: the dynamic
    overwrite committed but the explicit emptied-bucket removal never
    ran (an all-rows-deleted bucket is absent from the overwrite's
    output, so its old files keep serving). The deleted keys are then
    still visible; re-running the SAME delete re-detects them,
    rewrites, and completes the bucket removal."""
    from machine_downtime_monitor_on_aws_spark import fsio
    from machine_downtime_monitor_on_aws_spark.streaming.store import (
        KeyedParquetStore,
    )

    path = str(tmp_path / "store")
    store = KeyedParquetStore(path, "doc_id", num_buckets=4)
    rows = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "doc_id long, component long"
    )
    store.upsert(rows)

    by_bucket: dict[int, list[int]] = {}
    for r in (
        spark.read.parquet(path)
        .withColumn(
            "__b",
            F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(4)).cast("int"),
        )
        .collect()
    ):
        by_bucket.setdefault(r["__b"], []).append(r["doc_id"])
    target = min(by_bucket, key=lambda b: (len(by_bucket[b]), b))
    victims = by_bucket[target]
    keys = spark.createDataFrame([(v,) for v in victims], "doc_id long")

    real_delete = fsio.delete

    def crashing_delete(s, p, recursive=True):
        if f"__kb={target}" in p:
            raise RuntimeError("simulated crash before bucket cleanup")
        return real_delete(s, p, recursive)

    monkeypatch.setattr(fsio, "delete", crashing_delete)
    with pytest.raises(RuntimeError, match="simulated crash"):
        store.delete_keys(keys)
    monkeypatch.setattr(fsio, "delete", real_delete)

    # known partial state: the emptied bucket kept its old files and
    # the deleted keys are still visible
    assert os.path.exists(os.path.join(path, f"__kb={target}"))
    assert store.read(spark).filter(
        F.col("doc_id").isin(victims)
    ).count() == len(victims)

    # re-run heals: re-detects the same rows, removes the bucket
    assert store.delete_keys(keys) == len(victims)
    assert not os.path.exists(os.path.join(path, f"__kb={target}"))
    left = store.read(spark)
    assert left.count() == 20 - len(victims)
    assert left.filter(F.col("doc_id").isin(victims)).count() == 0
    assert store.delete_keys(keys) == 0


def test_streaming_dedup_takedown_drain(spark, tmp_path):
    """End-to-end loop wiring: requests dropped under pending/ are
    drained after the next committed epoch - the purged doc leaves
    the index AND the labels store, pending/ rotates to done-{epoch},
    and later probes cannot pair against the purged doc."""
    from machine_downtime_monitor_on_aws_spark.streaming.dedup import (
        run_incremental_dedup_stream,
    )
    from machine_downtime_monitor_on_aws_spark.streaming.store import (
        KeyedParquetStore,
    )

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    pairs_path = str(tmp_path / "pairs")
    labels_path = str(tmp_path / "labels")
    takedown = str(tmp_path / "takedown")
    os.makedirs(src)
    table = "sdedup_takedown_test"

    def stream():
        return spark.readStream.schema("doc_id long, text string").json(src)

    def run():
        q = run_incremental_dedup_stream(
            stream(),
            table,
            pairs_path,
            ckpt,
            num_buckets=8,
            parallelism=4,
            labels_store_path=labels_path,
            takedown_requests_path=takedown,
        )
        q.awaitTermination(120)

    try:
        with open(os.path.join(src, "b1.jsonl"), "w") as f:
            f.write("\n".join(json.dumps(r) for r in [
                {"doc_id": 1, "text": "a duplicated body shared within the batch"},
                {"doc_id": 2, "text": "a duplicated body shared within the batch"},
                {"doc_id": 3, "text": "something entirely different and unique"},
            ]))
        run()
        assert spark.table(table).select("doc_id").distinct().count() == 3
        lstore = KeyedParquetStore(labels_path, "doc_id", 64)
        assert {r.doc_id for r in lstore.read(spark).collect()} == {1, 2}

        # takedown request for doc 1, drained by the next epoch
        spark.createDataFrame([(1,)], "doc_id long").write.mode(
            "overwrite"
        ).parquet(os.path.join(takedown, "pending"))
        with open(os.path.join(src, "b2.jsonl"), "w") as f:
            f.write(json.dumps(
                {"doc_id": 10, "text": "fresh unrelated content in batch two"}
            ))
        run()

        assert spark.table(table).filter(F.col("doc_id") == 1).count() == 0
        assert {r.doc_id for r in lstore.read(spark).collect()} == {2}
        assert not os.path.exists(os.path.join(takedown, "pending"))
        dones = [d for d in os.listdir(takedown) if d.startswith("done-")]
        assert len(dones) == 1

        # a later probe epoch can no longer pair against the purged doc
        with open(os.path.join(src, "b3.jsonl"), "w") as f:
            f.write(json.dumps(
                {"doc_id": 20, "text": "a duplicated body shared within the batch"}
            ))
        run()
        pairs = {
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(pairs_path).collect()
        }
        assert (1, 20) not in pairs and (2, 20) in pairs
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_takedown_scrubs_pairs_chunks_and_boot_drains(spark, tmp_path):
    """r8 advice (medium): the drain must also scrub sinks that NAME
    purged docs - pair rows in the epoch-partitioned feed and chunk
    store/feed rows whose canonical ref is a purged doc - and a
    pending batch must drain at stream START even when no new data
    ever arrives (r8 advice: the crashed-drain / availableNow gap)."""
    import os

    from machine_downtime_monitor_on_aws_spark.streaming.dedup import (
        run_incremental_dedup_stream,
    )
    from machine_downtime_monitor_on_aws_spark.streaming.store import (
        KeyedParquetStore,
    )

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    pairs_path = str(tmp_path / "pairs")
    chunk_store = str(tmp_path / "chunks")
    chunk_feed = str(tmp_path / "chunk_feed")
    takedown = str(tmp_path / "takedown")
    os.makedirs(src)
    table = "sdedup_scrub_test"

    def stream():
        return spark.readStream.schema("doc_id long, text string").json(src)

    def run():
        q = run_incremental_dedup_stream(
            stream(), table, pairs_path, ckpt,
            num_buckets=8, parallelism=4,
            chunk_store_path=chunk_store, chunk_feed_path=chunk_feed,
            takedown_requests_path=takedown,
        )
        q.awaitTermination(120)

    try:
        import json as _json

        body = "a duplicated body shared within the batch " * 3
        with open(os.path.join(src, "b1.jsonl"), "w") as f:
            f.write("\n".join(_json.dumps(r) for r in [
                {"doc_id": 1, "text": body},
                {"doc_id": 2, "text": body},
                {"doc_id": 3, "text": "something entirely different and unique"},
            ]))
        run()
        feed = spark.read.parquet(pairs_path)
        assert {(r.doc_a, r.doc_b) for r in feed.collect()} == {(1, 2)}
        cstore = KeyedParquetStore(chunk_store, "chunk_md5", 64)
        refs1 = {r.ref_doc_id for r in cstore.read(spark).collect()}
        assert 1 in refs1  # doc 1 is the first-seen ref for its chunks

        # drop a takedown for doc 1 and RESTART WITH NO NEW DATA:
        # the boot drain must handle everything
        spark.createDataFrame([(1,)], "doc_id long").write.mode(
            "overwrite"
        ).parquet(os.path.join(takedown, "pending"))
        run()

        assert not os.path.exists(os.path.join(takedown, "pending"))
        assert spark.table(table).filter(F.col("doc_id") == 1).count() == 0
        # pairs feed no longer names doc 1; the emptied epoch
        # partition is gone entirely (dir removed, not zero rows)
        import glob as _glob

        assert _glob.glob(f"{pairs_path}/__epoch_id=*") == []
        # chunk store rows whose canonical ref was doc 1 are gone;
        # doc 3's chunks (refs untouched) survive
        refs2 = {r.ref_doc_id for r in cstore.read(spark).collect()}
        assert 1 not in refs2 and 3 in refs2
        # chunk feed scrubbed the purged refs too
        feed_refs = {
            r.ref_doc_id for r in spark.read.parquet(chunk_feed).collect()
        }
        assert 1 not in feed_refs and 3 in feed_refs

        # re-encounter of the shared content re-adds it under a
        # surviving ref (first-seen-wins makes the re-add natural)
        with open(os.path.join(src, "b2.jsonl"), "w") as f:
            f.write(_json.dumps({"doc_id": 10, "text": body}))
        run()
        refs3 = {r.ref_doc_id for r in cstore.read(spark).collect()}
        assert 10 in refs3 and 1 not in refs3
        pairs = {
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(pairs_path).collect()
        }
        assert pairs == {(2, 10)}  # doc 1 never pairs again
        # idempotence: an empty re-drain finds nothing and changes
        # nothing (drain with same ids again)
        spark.createDataFrame([(1,)], "doc_id long").write.mode(
            "overwrite"
        ).parquet(os.path.join(takedown, "pending"))
        run()
        assert {
            (r.doc_a, r.doc_b)
            for r in spark.read.parquet(pairs_path).collect()
        } == {(2, 10)}
        dones = [d for d in os.listdir(takedown) if d.startswith("done-")]
        assert len(dones) == 2  # two drains, distinct done names
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
