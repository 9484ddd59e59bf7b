"""streaming/sketches.py - the shared epoch-delta protocol applied
to the remaining sketch family. One law per merge algebra, each
pinned against the corresponding one-shot batch operator: CMS fold
== cms_build (additive), Bloom fold == bloom_build (OR-lattice), KMV
store estimate == kmv_distinct_estimate bit-identically (k-min
lattice). Plus the shared discipline: no-new-data restarts are
no-ops and params drift fails loudly on both the write and read
sides."""

from __future__ import annotations

import json
import os
import random

import pytest

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.sampling import (
    kmv_distinct_estimate,
)
from machine_downtime_monitor_on_aws_spark.operators.sketch import (
    bloom_build,
    cms_build,
)
from machine_downtime_monitor_on_aws_spark.streaming.sketches import (
    bloom_from_store,
    cms_from_store,
    kmv_from_store,
    run_bloom_stream,
    run_cms_stream,
    run_kmv_stream,
)

_D, _W = 3, 64  # CMS grid
_BITS, _HASHES = 256, 4  # bloom
_K = 16  # kmv


def _toks(rng, n=120):
    """A skewed token stream: zipf-ish repeats so CMS cells actually
    collide and KMV sees duplicates across epochs."""
    vocab = [f"tok{j}" for j in range(40)]
    return [(i, vocab[min(int(rng.expovariate(0.12)), 39)]) for i in range(n)]


def _stream_epochs(spark, tmp_path, rows, run_fn, n_epochs=3):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    per = len(rows) // n_epochs
    for ep in range(n_epochs):
        with open(os.path.join(src, f"b{ep}.jsonl"), "w") as f:
            f.write(
                "\n".join(
                    json.dumps({"row_id": i, "tok": t})
                    for i, t in rows[ep * per : (ep + 1) * per]
                )
            )
        q = run_fn(
            spark.readStream.schema("row_id long, tok string").json(src)
        )
        assert q.awaitTermination(120)
    return src


def test_cms_fold_equals_one_shot(spark, tmp_path):
    rng = random.Random(31)
    rows = _toks(rng)
    feed = str(tmp_path / "cms_feed")
    ckpt = str(tmp_path / "ckpt")
    src = _stream_epochs(
        spark,
        tmp_path,
        rows,
        lambda s: run_cms_stream(s, feed, ckpt, "tok", _D, _W),
    )
    full = spark.createDataFrame(rows, "row_id long, tok string")
    want = sorted(map(tuple, cms_build(full, "tok", _D, _W).collect()))
    got = sorted(map(tuple, cms_from_store(spark, feed, _D, _W).collect()))
    assert got == want and got

    # restart with no new data: marker + checkpoint make it a no-op
    q = run_cms_stream(
        spark.readStream.schema("row_id long, tok string").json(src),
        feed,
        ckpt,
        "tok",
        _D,
        _W,
    )
    assert q.awaitTermination(120)
    again = sorted(map(tuple, cms_from_store(spark, feed, _D, _W).collect()))
    assert again == want

    # params drift fails loudly, writer and reader alike
    with pytest.raises(ValueError, match="params"):
        cms_from_store(spark, feed, _D, _W * 2)
    with pytest.raises(ValueError, match="params"):
        run_cms_stream(
            spark.readStream.schema("row_id long, tok string").json(src),
            feed,
            str(tmp_path / "ckpt2"),
            "tok",
            _D + 1,
            _W,
        )


def test_bloom_fold_equals_one_shot(spark, tmp_path):
    rng = random.Random(32)
    rows = _toks(rng)
    feed = str(tmp_path / "bloom_feed")
    ckpt = str(tmp_path / "ckpt")
    _stream_epochs(
        spark,
        tmp_path,
        rows,
        lambda s: run_bloom_stream(s, feed, ckpt, "tok", _BITS, _HASHES),
    )
    full = spark.createDataFrame(rows, "row_id long, tok string")
    want = sorted(
        r["bit"] for r in bloom_build(full, "tok", _BITS, _HASHES).collect()
    )
    got = sorted(
        r["bit"]
        for r in bloom_from_store(spark, feed, _BITS, _HASHES).collect()
    )
    assert got == want and got

    # the OR-lattice second line of defense: folding the feed UNION
    # itself (a simulated double delivery) changes nothing
    from machine_downtime_monitor_on_aws_spark.streaming.sketches import (
        BLOOM_DELTA_SCHEMA,
    )

    feed_df = spark.read.schema(BLOOM_DELTA_SCHEMA).parquet(feed)
    doubled = sorted(
        r["bit"]
        for r in feed_df.unionByName(feed_df)
        .select("bit")
        .distinct()
        .collect()
    )
    assert doubled == want


def test_kmv_store_estimate_bit_identical(spark, tmp_path):
    rng = random.Random(33)
    rows = _toks(rng, n=150)
    feed = str(tmp_path / "kmv_feed")
    ckpt = str(tmp_path / "ckpt")
    _stream_epochs(
        spark,
        tmp_path,
        rows,
        lambda s: run_kmv_stream(s, feed, ckpt, "tok", _K),
    )
    full = spark.createDataFrame(rows, "row_id long, tok string")
    want = kmv_distinct_estimate(full, "tok", _K).collect()[0]
    got = kmv_from_store(spark, feed, _K).collect()[0]
    assert got["kmv_estimate"] == want["kmv_estimate"]  # bit-identical
    assert got["n_in_sketch"] == min(_K, want["n_hashed"])
    # per-epoch deltas are bounded at k rows
    from machine_downtime_monitor_on_aws_spark.streaming.sketches import (
        KMV_DELTA_SCHEMA,
    )

    per_epoch = (
        spark.read.schema(KMV_DELTA_SCHEMA)
        .parquet(feed)
        .groupBy("__epoch_id")
        .count()
        .collect()
    )
    assert per_epoch and all(r["count"] <= _K for r in per_epoch)


def test_kmv_below_k_degrades_to_exact_count(spark, tmp_path):
    rows = [(i, f"only{i % 5}") for i in range(20)]  # 5 distinct < k
    feed = str(tmp_path / "kmv_feed")
    ckpt = str(tmp_path / "ckpt")
    _stream_epochs(
        spark,
        tmp_path,
        rows,
        lambda s: run_kmv_stream(s, feed, ckpt, "tok", _K),
        n_epochs=2,
    )
    got = kmv_from_store(spark, feed, _K).collect()[0]
    assert got["n_in_sketch"] == 5
    assert got["kmv_estimate"] == 5.0
    with pytest.raises(ValueError, match="k must be"):
        run_kmv_stream(None, feed, ckpt, "tok", 1)


def test_kmv_merge_theorem_randomized(spark):
    """kmin_k(A ∪ B) == kmin_k(kmin_k(A) ∪ kmin_k(B)) on the actual
    hash fractions - the law the per-epoch k-row delta cap rests on,
    checked against a pure-Python re-derivation."""
    import hashlib

    rng = random.Random(34)
    vals = [f"v{rng.randrange(200)}" for _ in range(300)]

    def frac(v):
        return int(hashlib.md5(f"kmv:{v}".encode()).hexdigest()[:13], 16)

    whole = sorted({frac(v) for v in vals})[:_K]
    a = sorted({frac(v) for v in vals[:150]})[:_K]
    b = sorted({frac(v) for v in vals[150:]})[:_K]
    merged = sorted(set(a) | set(b))[:_K]
    assert merged == whole
