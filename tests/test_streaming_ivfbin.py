"""streaming/ann.run_incremental_ivfbin_stream - the binary tier's
ingest loop. Laws pinned: the streamed index serves IDENTICAL
results to a one-shot build over everything ingested (same frozen
centroids + thresholds), epochs append exactly-once (a crash-window
replay rewrites the same partitions), malformed vectors quarantine
instead of wedging the loop, restarts with no data are no-ops, and
the epoch/flat layout guards fail loudly in both directions."""

from __future__ import annotations

import json
import os
import random

import pytest

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.ivf import (
    append_to_ivfbin_index,
    build_ivfbin_index,
    read_ivf_index_params,
    search_ivfbin_index_rerank,
)
from machine_downtime_monitor_on_aws_spark.operators.signq import (
    signq_fit_thresholds,
)
from machine_downtime_monitor_on_aws_spark.streaming.ann import (
    run_incremental_ivfbin_stream,
)

_DIM, _NC = 4, 4


def _cluster_vec(rng, c, spread=0.05):
    base = [0.0] * _DIM
    base[c] = 1.0
    return [x + rng.uniform(-spread, spread) for x in base]


def test_streaming_ivfbin_loop(spark, tmp_path):
    rng = random.Random(41)
    src = str(tmp_path / "vecs")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "ivfbin_stream")
    os.makedirs(src)

    # frozen offline model (the production bootstrap path) - passing
    # it to BOTH the stream and the one-shot twin makes the equality
    # law exact rather than first-batch-dependent
    cents_rows = [(c, [1.0 if j == c else 0.0 for j in range(_DIM)])
                  for c in range(_NC)]
    cents = spark.createDataFrame(cents_rows, "cid long, cv array<double>")
    thr = [0.0] * _DIM

    def write_epoch(name, rows):
        with open(os.path.join(src, name), "w") as f:
            f.write("\n".join(
                json.dumps({"vec_id": i, "vec": v}) for i, v in rows))

    def run():
        q = run_incremental_ivfbin_stream(
            spark.readStream.schema(
                "vec_id long, vec array<double>"
            ).json(src),
            idx, ckpt, _NC, _DIM,
            bootstrap_centroids=cents, bootstrap_thresholds=thr,
        )
        assert q.awaitTermination(120)

    e1 = [(c * 100 + i, _cluster_vec(rng, c))
          for c in range(_NC) for i in range(8)]
    write_epoch("b1.jsonl", e1)
    run()
    stamped = read_ivf_index_params(spark, idx)
    assert stamped["layout"] == "ivfbin"
    assert stamped["epoch_layout"] is True
    corpus = spark.read.parquet(f"{idx}/corpus")
    assert corpus.count() == 32 and "__epoch" in corpus.columns

    # epoch 2 appends; a malformed vector quarantines instead of
    # wedging the loop (wrong dim would otherwise raise pre-marker
    # inside signq_encode and replay forever)
    e2 = [(1000 + i, _cluster_vec(rng, i % _NC)) for i in range(16)]
    write_epoch("b2.jsonl", e2 + [(9999, [1.0, 2.0])])  # wrong dim
    run()
    corpus = spark.read.parquet(f"{idx}/corpus")
    assert corpus.count() == 48
    assert corpus.select("vec_id").distinct().count() == 48
    rejects = spark.read.json(f"{ckpt}/ivfbin_rejects")
    assert [r["vec_id"] for r in rejects.collect()] == [9999]

    # crash-window replay: re-append epoch 2 under the SAME epoch
    # value - the dynamic overwrite rewrites identical partitions
    token = open(os.path.join(ckpt, "spark_graft_sink_token")).read().strip()
    b2 = spark.createDataFrame(e2, "vec_id long, vec array<double>")
    append_to_ivfbin_index(b2, idx, _DIM, epoch=f"{token}-1")
    assert spark.read.parquet(f"{idx}/corpus").count() == 48

    # no-new-data restart: no-op
    run()
    assert spark.read.parquet(f"{idx}/corpus").count() == 48

    # THE law: the streamed index serves row-for-row what a one-shot
    # build over everything ingested serves (same frozen model)
    all_rows = e1 + e2
    full = spark.createDataFrame(all_rows, "vec_id long, vec array<double>")
    oneshot = str(tmp_path / "ivfbin_oneshot")
    build_ivfbin_index(full, oneshot, _NC, _DIM, thr, centroids=cents)
    q = spark.createDataFrame(
        [(7000, _cluster_vec(rng, 1)), (7001, _cluster_vec(rng, 3))],
        "qid long, qvec array<double>",
    )
    a = sorted(map(tuple, search_ivfbin_index_rerank(
        spark, idx, q, 5, 20, 2, _DIM, full).collect()))
    b = sorted(map(tuple, search_ivfbin_index_rerank(
        spark, oneshot, q, 5, 20, 2, _DIM, full).collect()))
    assert a == b and a


def test_ivfbin_epoch_layout_guards(spark, tmp_path):
    rows = [(i, [float(i % 4), 1.0, 0.0, 0.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    thr = signq_fit_thresholds(df, _DIM)
    flat = str(tmp_path / "flat")
    build_ivfbin_index(df, flat, 4, _DIM, thr)
    assert read_ivf_index_params(spark, flat)["epoch_layout"] is False
    with pytest.raises(ValueError, match="flat corpus layout"):
        append_to_ivfbin_index(df, flat, _DIM, epoch="tok-1")
    epochy = str(tmp_path / "epochy")
    build_ivfbin_index(df, epochy, 4, _DIM, thr, epoch_partitioned=True)
    with pytest.raises(ValueError, match="epoch-partitioned"):
        append_to_ivfbin_index(df, epochy, _DIM)
    # the epoch path stays digest-verified and O(batch): an epoch
    # append lands and searches fine
    more = spark.createDataFrame(
        [(100 + i, [float(i % 4), 0.5, 0.0, 0.0]) for i in range(8)],
        "vec_id long, vec array<double>",
    )
    append_to_ivfbin_index(more, epochy, _DIM, epoch="tok-1")
    corpus = spark.read.parquet(f"{epochy}/corpus")
    assert corpus.count() == 28
    got = search_ivfbin_index_rerank(
        spark,
        epochy,
        spark.createDataFrame(
            [(500, [1.0, 0.5, 0.0, 0.0])], "qid long, qvec array<double>"
        ),
        3,
        10,
        2,
        _DIM,
        df.unionByName(more),
    )
    assert got.count() == 3


def test_ivfbin_compaction(spark, tmp_path):
    """compact_ivfbin_index folds every epoch back into __epoch=base
    as a pure layout rewrite: counts and rows identical, search
    results identical, the params stamp (thresholds digest included)
    untouched, and epoch appends keep working afterwards. A flat
    index refuses."""
    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        compact_ivfbin_index,
    )

    rows = [(i, [float(i % 4), 1.0, 0.5, 0.0]) for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    thr = signq_fit_thresholds(df, _DIM)
    idx = str(tmp_path / "epochy")
    build_ivfbin_index(df, idx, 4, _DIM, thr, epoch_partitioned=True)
    for ep in range(3):
        more = spark.createDataFrame(
            [(100 + ep * 10 + i, [float(i % 4), 0.5, float(ep), 0.0])
             for i in range(6)],
            "vec_id long, vec array<double>",
        )
        append_to_ivfbin_index(more, idx, _DIM, epoch=f"tok-{ep}")
    all_vecs = spark.createDataFrame(
        rows + [(100 + ep * 10 + i, [float(i % 4), 0.5, float(ep), 0.0])
                for ep in range(3) for i in range(6)],
        "vec_id long, vec array<double>",
    )
    q = spark.createDataFrame(
        [(900, [1.0, 0.5, 0.5, 0.0])], "qid long, qvec array<double>"
    )
    before_rows = sorted(
        map(tuple, spark.read.parquet(f"{idx}/corpus")
            .select("vec_id", "signq_code", "list_id").collect())
    )
    before = sorted(map(tuple, search_ivfbin_index_rerank(
        spark, idx, q, 5, 15, 2, _DIM, all_vecs).collect()))
    epochs_before = set(
        r["__epoch"]
        for r in spark.read.parquet(f"{idx}/corpus").select("__epoch")
        .distinct().collect()
    )
    assert len(epochs_before) == 4  # base + 3 appends

    compact_ivfbin_index(spark, idx)

    corpus = spark.read.parquet(f"{idx}/corpus")
    assert set(r["__epoch"] for r in
               corpus.select("__epoch").distinct().collect()) == {"base"}
    after_rows = sorted(
        map(tuple, corpus.select("vec_id", "signq_code", "list_id").collect())
    )
    assert after_rows == before_rows
    after = sorted(map(tuple, search_ivfbin_index_rerank(
        spark, idx, q, 5, 15, 2, _DIM, all_vecs).collect()))
    assert after == before and after
    assert read_ivf_index_params(spark, idx)["epoch_layout"] is True

    # appends keep working post-compaction
    append_to_ivfbin_index(
        spark.createDataFrame(
            [(500, [0.0, 1.0, 0.0, 0.0])], "vec_id long, vec array<double>"
        ),
        idx, _DIM, epoch="tok-9",
    )
    assert spark.read.parquet(f"{idx}/corpus").count() == 43

    # flat layout refuses
    flat = str(tmp_path / "flat")
    build_ivfbin_index(df, flat, 4, _DIM, thr)
    with pytest.raises(ValueError, match="flat corpus layout"):
        compact_ivfbin_index(spark, flat)


def test_ivfbin_guard_cache_and_invalidation(spark, tmp_path):
    """r17 verdict #4: the interrupted-compaction guard probes the
    directory ONCE per (session, path) - a clean verdict is cached -
    and every in-process mutator (compaction, rebuild) invalidates
    it, so an interrupted compaction is still refused loudly."""
    from machine_downtime_monitor_on_aws_spark import fsio
    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        _guard_ivfbin_corpus,
        _invalidate_ivfbin_guard,
        build_ivfbin_index,
    )

    rows = [(i, [float(i % 4), 1.0, 0.0, 0.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    thr = signq_fit_thresholds(df, _DIM)
    idx = str(tmp_path / "guarded")
    build_ivfbin_index(df, idx, 4, _DIM, thr, epoch_partitioned=True)

    _guard_ivfbin_corpus(spark, idx)  # clean: caches the verdict
    # cached: no re-probe (injected corruption unseen until an
    # in-process mutator invalidates - same TOCTOU window the
    # per-call probes had between check and read)
    fsio.mkdirs(spark, f"{idx}/corpus__old")
    _guard_ivfbin_corpus(spark, idx)

    # any in-process mutator drops the cached verdict -> loud refusal
    _invalidate_ivfbin_guard(idx)
    with pytest.raises(RuntimeError, match="compaction swap"):
        _guard_ivfbin_corpus(spark, idx)
    fsio.delete(spark, f"{idx}/corpus__old")

    # compact_ivfbin_index invalidates before touching anything: the
    # guard right after a (successful) compaction re-probes clean
    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        compact_ivfbin_index,
    )

    _guard_ivfbin_corpus(spark, idx)
    compact_ivfbin_index(spark, idx)
    fsio.mkdirs(spark, f"{idx}/corpus__compacting")
    with pytest.raises(RuntimeError, match="interrupted before its swap"):
        _guard_ivfbin_corpus(spark, idx)
    fsio.delete(spark, f"{idx}/corpus__compacting")
    _guard_ivfbin_corpus(spark, idx)
