"""operators/perceptron.py - full-batch integer perceptron: Spark
training pinned bit-equal to a pure-Python replay, provable
convergence on a separable (disjoint-vocabulary) fixture, and the
bias-feature / empty-doc edge cases."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.perceptron import (
    hashed_token_features,
    perceptron_predict,
    perceptron_train,
)

DIM = 16


def _bucket(tok: str, dim: int, salt: str = "pcep") -> int:
    return int(hashlib.md5(f"{salt}:{tok}".encode()).hexdigest()[:6], 16) % dim


def _py_feats(rows, dim, bias):
    """{id: {bucket: x}} replaying hashed_token_features."""
    feats = {}
    for i, (text, _y) in enumerate(rows):
        b = {}
        for tok in text.split():
            k = _bucket(tok, dim)
            b[k] = b.get(k, 0) + 1
        if bias:
            b[dim] = 1
        feats[i] = b
    return feats


def _py_train(feats, labels, dim, n_iters):
    """Integer batch perceptron, the operator's exact arithmetic."""
    w = [0] * dim
    for _ in range(n_iters):
        grad = [0] * dim
        for i, y in labels.items():
            score = sum(x * w[b] for b, x in feats[i].items())
            if y * score <= 0:
                for b, x in feats[i].items():
                    grad[b] += y * x
        w = [a + g for a, g in zip(w, grad)]
    return w


def _dfs(spark, rows, bias):
    docs = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(rows)], "id long, text string, y int"
    )
    feats = hashed_token_features(docs, "id", "text", DIM, bias=bias)
    labels = docs.select("id", "y")
    return feats, labels


ROWS = [
    ("red red blue green", 1),
    ("red green red red", 1),
    ("dog cat dog", -1),
    ("cat cat bird dog dog", -1),
    ("red dog cat", -1),
    ("", -1),
    ("blue", 1),
]


@pytest.mark.parametrize("bias", [False, True])
def test_train_matches_python_model_bit_exact(spark, bias):
    feats, labels = _dfs(spark, ROWS, bias)
    dim = DIM + 1 if bias else DIM
    w = perceptron_train(feats, labels, dim, 3)
    pf = _py_feats(ROWS, DIM, bias)
    pl = {i: y for i, (_t, y) in enumerate(ROWS)}
    assert w == _py_train(pf, pl, dim, 3)
    assert all(isinstance(v, int) for v in w)

    got = {
        r.id: (r.score, r.margin, r.pred)
        for r in perceptron_predict(feats, labels, w).collect()
    }
    for i, y in pl.items():
        score = sum(x * w[b] for b, x in pf[i].items())
        assert got[i] == (score, y * score, score > 0), f"doc {i}"


def test_converges_on_disjoint_vocabulary(spark):
    """Positive and negative docs draw from disjoint vocabularies
    whose buckets don't collide at DIM=16, so w_1 = sum(y*x) already
    separates: every later margin is strictly positive and training
    is a fixed point from iteration 1."""
    rows = [
        ("alpha beta alpha", 1),
        ("beta beta gamma", 1),
        ("delta epsln", -1),
        ("epsln epsln delta delta", -1),
    ]
    pos = {_bucket(t, DIM) for t in ("alpha", "beta", "gamma")}
    neg = {_bucket(t, DIM) for t in ("delta", "epsln")}
    assert not (pos & neg), "fixture vocab collides; pick other tokens"

    feats, labels = _dfs(spark, rows, bias=False)
    w1 = perceptron_train(feats, labels, DIM, 1)
    mis = perceptron_predict(feats, labels, w1).filter(F.col("margin") <= 0)
    assert mis.count() == 0
    assert perceptron_train(feats, labels, DIM, 2) == w1  # fixed point


def test_bias_rows_and_empty_docs(spark):
    rows = [("a b", 1), ("", -1)]
    feats, labels = _dfs(spark, rows, bias=True)
    bias_rows = {
        (r.id, r.x) for r in feats.filter(F.col("bucket") == DIM).collect()
    }
    assert bias_rows == {(0, 1), (1, 1)}  # every doc, even the empty one
    # without bias the empty doc has no rows at all and scores 0 -> pred False
    nf, nl = _dfs(spark, rows, bias=False)
    assert nf.filter(F.col("id") == 1).count() == 0
    got = {r.id: (r.score, r.pred) for r in perceptron_predict(nf, nl, [1] * DIM).collect()}
    assert got[1] == (0, False)


def test_dim_validation(spark):
    docs = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="dim"):
        hashed_token_features(docs, "id", "text", 0)


def test_weight_store_roundtrip_and_guards(spark, tmp_path):
    """save_weights/load_weights: ints round-trip exactly through the
    single atomic JSON record; a tampered record and a missing store
    fail loudly; expect_digest pins the exact model."""
    from machine_downtime_monitor_on_aws_spark.operators.perceptron import (
        load_weights,
        save_weights,
        weights_digest,
    )

    path = str(tmp_path / "pcep")
    w = [0, -3, 7, 2**40]
    save_weights(spark, path, w, {"task": "t"})
    got, params = load_weights(spark, path)
    assert got == w and params["task"] == "t"
    assert params["weights_md5"] == weights_digest(w)
    # overwrite-safe: a re-save replaces the committed record
    save_weights(spark, path, [1, 2], {"task": "t2"})
    got2, _ = load_weights(spark, path)
    assert got2 == [1, 2]
    with pytest.raises(ValueError, match="pinned"):
        load_weights(spark, path, expect_digest=weights_digest(w))
    with pytest.raises(ValueError, match="no committed"):
        load_weights(spark, str(tmp_path / "absent"))
    # tamper: flip a weight without refreshing the digest
    import json
    import os

    rec = str(tmp_path / "pcep" / "params.json")
    crc = str(tmp_path / "pcep" / ".params.json.crc")
    if os.path.exists(crc):
        os.remove(crc)  # Hadoop checksum sidecar guards first otherwise
    p = json.load(open(rec))
    p["weights"][0] += 1
    json.dump(p, open(rec, "w"))
    with pytest.raises(ValueError, match="digest"):
        load_weights(spark, path)


def test_catalog_perceptron_serves_from_persisted_store(
    spark, tmp_path, monkeypatch
):
    """perceptron_lang_margins trains once per corpus and serves warm
    invocations from the persisted weight store - proven by poisoning
    the trainer after the first call - bit-identically."""
    import glob
    import tempfile

    from machine_downtime_monitor_on_aws_spark.plans import catalog

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    sf = "/root/testdata/sf0.001"
    fn = catalog.REGISTRY["perceptron_lang_margins"].fn
    rows1 = sorted(tuple(r) for r in fn(spark, sf).collect())
    stores = glob.glob(str(tmp_path / "spark_graft_pcep_*"))
    assert len(stores) == 1, stores
    import machine_downtime_monitor_on_aws_spark.operators.perceptron as pcep

    def _boom(*a, **k):
        raise AssertionError("warm path retrained instead of loading")

    monkeypatch.setattr(pcep, "perceptron_train", _boom)
    rows2 = sorted(tuple(r) for r in fn(spark, sf).collect())
    assert rows2 == rows1 and rows1
