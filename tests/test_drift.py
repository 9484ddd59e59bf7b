"""operators/drift.py - embedding-population drift monitor, plus its
streaming-ANN-loop integration (the retrain signal the skew gate
cannot see)."""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.drift import (
    embedding_drift_stats,
    embedding_population_stats,
    population_drifted,
    read_population_stats,
    write_population_stats,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, vec array<double>")


def _model_stats(vecs: list[list[float]]):
    dims = len(vecs[0])
    out = {}
    for d in range(dims):
        xs = [v[d] for v in vecs]
        out[d] = (
            len(xs),
            sum(int(math.floor(x * 1e9 + 0.5)) for x in xs),
            sum(int(math.floor(x * x * 1e9 + 0.5)) for x in xs),
        )
    return out


def test_population_stats_match_model(spark):
    import random

    rng = random.Random(5)
    vecs = [[rng.uniform(-2, 2) for _ in range(3)] for _ in range(50)]
    df = _vecs(spark, [(i, v) for i, v in enumerate(vecs)])
    got = {
        r.dim: (r.n, r.sum_q, r.sumsq_q)
        for r in embedding_population_stats(df, "vec", 3).collect()
    }
    assert got == _model_stats(vecs)


def test_population_stats_reject_malformed(spark):
    bad_width = _vecs(spark, [(1, [0.1, 0.2]), (2, [0.1, 0.2, 0.3])])
    with pytest.raises(ValueError, match="non-3-wide"):
        embedding_population_stats(bad_width, "vec", 3)
    with_null = _vecs(spark, [(1, [0.1, 0.2, 0.3]), (2, None)])
    with pytest.raises(ValueError, match="NULL"):
        embedding_population_stats(with_null, "vec", 3)


def test_drift_stats_and_gate(spark):
    import random

    rng = random.Random(11)
    ref_vecs = [[rng.gauss(0, 1) for _ in range(4)] for _ in range(200)]
    # shift dims 1 and 3 by +2 sigma; leave 0 and 2 alone
    new_vecs = [
        [v[0], v[1] + 2.0, v[2], v[3] + 2.0]
        for v in ([[rng.gauss(0, 1) for _ in range(4)] for _ in range(200)])
    ]
    ref = embedding_population_stats(
        _vecs(spark, [(i, v) for i, v in enumerate(ref_vecs)]), "vec", 4
    )
    new = embedding_population_stats(
        _vecs(spark, [(i, v) for i, v in enumerate(new_vecs)]), "vec", 4
    )
    rep = embedding_drift_stats(ref, new, smd_threshold=0.5)
    drifted = {r.dim: r.drifted for r in rep.collect()}
    assert drifted == {0: False, 1: True, 2: False, 3: True}
    assert population_drifted(rep, max_drifted_dims=0)
    assert population_drifted(rep, max_drifted_dims=1)
    assert not population_drifted(rep, max_drifted_dims=2)

    # identical populations never drift
    same = embedding_drift_stats(ref, ref, smd_threshold=0.5)
    assert not population_drifted(same, max_drifted_dims=0)
    assert same.filter(F.col("smd") != 0.0).count() == 0


def test_population_stats_store_roundtrip(spark, tmp_path):
    path = str(tmp_path / "popstats")
    df = _vecs(spark, [(1, [0.5, -0.5]), (2, [1.5, 2.5])])
    stats = embedding_population_stats(df, "vec", 2)
    assert write_population_stats(spark, stats, path)
    back = {
        r.dim: (r.n, r.sum_q, r.sumsq_q)
        for r in read_population_stats(spark, path).collect()
    }
    want = {
        r.dim: (r.n, r.sum_q, r.sumsq_q) for r in stats.collect()
    }
    assert back == want
    # committed predecessor: plain publish refuses, replace swaps
    df2 = _vecs(spark, [(9, [9.0, 9.0])])
    s2 = embedding_population_stats(df2, "vec", 2)
    assert not write_population_stats(spark, s2, path)
    assert write_population_stats(spark, s2, path, replace=True)
    assert {
        r.n for r in read_population_stats(spark, path).collect()
    } == {1}


def test_streaming_ann_drift_gate(spark, tmp_path):
    """End-to-end: the drift gate seeds its reference from the first
    population, stays quiet while the distribution holds, retrains on
    a genuine population shift even though the assignment histogram
    stays balanced (the skew gate is OFF here), and refreshes the
    reference to the full post-rebuild corpus."""
    import random

    from machine_downtime_monitor_on_aws_spark.streaming.ann import (
        run_incremental_ann_stream,
    )

    rng = random.Random(31)
    dim, n_cent = 4, 4
    src = str(tmp_path / "vecs")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "ivf_drift")
    os.makedirs(src)

    def cluster_vec(c, shift=0.0):
        base = [shift] * dim
        base[c] += 1.0
        return [x + rng.uniform(-0.05, 0.05) for x in base]

    def write_epoch(name, rows):
        with open(os.path.join(src, name), "w") as f:
            f.write(
                "\n".join(json.dumps({"vec_id": i, "vec": v}) for i, v in rows)
            )

    def run():
        q = run_incremental_ann_stream(
            spark.readStream.schema("vec_id long, vec array<double>").json(src),
            idx, ckpt, n_cent, dim,
            drift_smd_threshold=0.5, drift_max_dims=0,
        )
        q.awaitTermination(120)

    def centroids():
        return sorted(
            tuple(r.cv) for r in spark.read.parquet(f"{idx}/centroids").collect()
        )

    stats_path = idx + "__popstats"

    # epoch 1: bootstrap + reference seeding
    e1 = [(c * 100 + i, cluster_vec(c)) for c in range(n_cent) for i in range(10)]
    write_epoch("b1.jsonl", e1)
    run()
    assert os.path.exists(os.path.join(stats_path, "_STORE_OK"))
    ref0 = {r.dim: r.n for r in read_population_stats(spark, stats_path).collect()}
    assert ref0 == {d: 40 for d in range(dim)}
    c0 = centroids()

    # epoch 2: same distribution - no retrain, reference untouched
    e2 = [(1000 + i, cluster_vec(i % n_cent)) for i in range(20)]
    write_epoch("b2.jsonl", e2)
    run()
    assert centroids() == c0
    assert {
        r.dim: r.n for r in read_population_stats(spark, stats_path).collect()
    } == ref0

    # epoch 3: every dimension shifts +2 but assignments stay spread
    # across clusters (balanced histogram - the skew gate would never
    # fire). The drift gate retrains and the reference becomes the
    # full 100-vector corpus.
    e3 = [
        (2000 + i, cluster_vec(i % n_cent, shift=2.0)) for i in range(40)
    ]
    write_epoch("b3.jsonl", e3)
    run()
    assert centroids() != c0, "drift gate did not retrain"
    refreshed = {
        r.dim: r.n for r in read_population_stats(spark, stats_path).collect()
    }
    assert refreshed == {d: 100 for d in range(dim)}
    corpus = spark.read.parquet(f"{idx}/corpus")
    assert corpus.count() == 100
    assert corpus.select("vec_id").distinct().count() == 100

    # epoch 4: 12 more shifted rows. The gate compares the CUMULATIVE
    # served population (112 rows, barely moved from the 100-row
    # reference) - quiet. (The retired batch-vs-reference gate fired
    # here on every post-shift batch: the refreshed reference is the
    # MIXED corpus, which no pure-shifted batch matches - it
    # rebuilt O(corpus) per epoch, masked in the old test by
    # sampled_centroids happening to pick the same 4 smallest-hash
    # ids. The reference row-count assert below is the non-luck
    # evidence the gate stayed closed.)
    c1 = centroids()
    e4 = [(5000 + i, cluster_vec(i % n_cent, shift=2.0)) for i in range(12)]
    write_epoch("b4.jsonl", e4)
    run()
    assert centroids() == c1
    assert spark.read.parquet(f"{idx}/corpus").count() == 112
    assert {
        r.dim: r.n for r in read_population_stats(spark, stats_path).collect()
    } == {d: 100 for d in range(dim)}, "gate fired on an un-drifted cumulative"
    # the cumulative chain is live and holds exactly one snapshot
    snap_dir = idx + "__popstats_cur"
    snaps = [n for n in os.listdir(snap_dir) if n.startswith("__epoch=")]
    assert len(snaps) == 1
    cum = spark.read.schema(
        "dim int, n long, sum_q long, sumsq_q long"
    ).parquet(os.path.join(snap_dir, snaps[0]))
    assert {r.dim: r.n for r in cum.collect()} == {d: 112 for d in range(dim)}

    # epoch 5: a batch carrying a NULL vector and a mis-sized vector
    # alongside good rows. The batch drift operator fails fast on
    # malformed input, but the STREAM path pre-filters to the
    # well-formed subset (r14 ADVICE): the query must survive (a
    # raise here would kill it after the epoch marker committed,
    # violating the advisory-gate contract) and the gate must stay
    # quiet on the clean subset.
    import json as _json

    with open(os.path.join(src, "b5.jsonl"), "w") as f:
        f.write(
            "\n".join(
                [
                    _json.dumps({"vec_id": 6000, "vec": None}),
                    _json.dumps({"vec_id": 6001, "vec": [1.0, 2.0]}),
                ]
                + [
                    _json.dumps(
                        {"vec_id": 6100 + i,
                         "vec": cluster_vec(i % n_cent, shift=2.0)}
                    )
                    for i in range(8)
                ]
            )
        )
    run()
    assert centroids() == c1, "drift gate fired on a clean-subset batch"
    # the 8 clean rows landed; the 2 malformed ones went to quarantine
    assert spark.read.parquet(f"{idx}/corpus").count() == 120
    rej = spark.read.json(os.path.join(ckpt, "ann_rejects"))
    assert sorted(r.vec_id for r in rej.collect()) == [6000, 6001]

    # epoch 6: sustained shift finally tips the CUMULATIVE population
    # (270 rows, 210 of them shifted) past the threshold - one
    # rebuild, reference refreshes to the full 270-row corpus, the
    # chain resets
    e6 = [(7000 + i, cluster_vec(i % n_cent, shift=2.0)) for i in range(150)]
    write_epoch("b6.jsonl", e6)
    run()
    assert {
        r.dim: r.n for r in read_population_stats(spark, stats_path).collect()
    } == {d: 270 for d in range(dim)}, "cumulative drift did not retrain"
    parts = [
        n for n in os.listdir(f"{idx}/corpus") if n.startswith("__epoch=")
    ]
    assert parts == ["__epoch=base"], "rebuild did not compact epochs"
    assert not os.path.exists(snap_dir), "chain did not reset on retrain"

    # epoch 7: the retrained reference now covers the shifted mass -
    # more of the same settles (the whole point of the cumulative
    # gate)
    c2 = centroids()
    e7 = [(8000 + i, cluster_vec(i % n_cent, shift=2.0)) for i in range(12)]
    write_epoch("b7.jsonl", e7)
    run()
    assert centroids() == c2
    assert {
        r.dim: r.n for r in read_population_stats(spark, stats_path).collect()
    } == {d: 270 for d in range(dim)}
    assert spark.read.parquet(f"{idx}/corpus").count() == 282
