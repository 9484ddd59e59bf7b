"""Deterministic training-order shuffle + sharding
(operators/shards.py): permutation/determinism properties, a
pure-Python model pin for the hash arithmetic, and the plan
contract - beside the oracle-paired catalog query
training_shard_manifest."""

from __future__ import annotations

import hashlib
import re

import pytest

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.shards import (
    assign_training_shards,
)


def _df(spark, n):
    return spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(n)], "seq_id long, source string"
    )


def _model_row(seq_id, n_shards):
    key = str(seq_id)
    h = hashlib.md5(f"shard:{key}".encode()).hexdigest()
    shard = int(h[:6], 16) % 10000 % n_shards
    order_key = hashlib.md5(f"order:{key}".encode()).hexdigest()
    return shard, order_key


def test_matches_python_model_and_is_a_permutation(spark):
    """Shard and order_key equal the Python md5 model; positions
    within each shard are exactly 1..n_s (a permutation, no gaps or
    dups) and follow the order_key sort."""
    n, n_shards = 64, 4
    rows = assign_training_shards(_df(spark, n), ["seq_id"], n_shards).collect()
    assert len(rows) == n
    by_shard: dict[int, list] = {}
    for r in rows:
        shard, ok = _model_row(r["seq_id"], n_shards)
        assert r["shard"] == shard
        assert r["order_key"] == ok
        by_shard.setdefault(r["shard"], []).append(r)
    assert sum(len(v) for v in by_shard.values()) == n
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r["position"])
        assert [m["position"] for m in members] == list(
            range(1, len(members) + 1)
        )
        keys = [m["order_key"] for m in members]
        assert keys == sorted(keys), f"shard {shard} not in order_key order"


def test_deterministic_across_runs_and_partitionings(spark):
    """Same (corpus, salt) -> identical manifest regardless of input
    partition layout - the reproducible-training contract."""
    a = assign_training_shards(_df(spark, 40), ["seq_id"], 8).collect()
    b = assign_training_shards(
        _df(spark, 40).repartition(7), ["seq_id"], 8
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salt_changes_reshuffle(spark):
    """A different order salt produces a different within-shard
    order (it is a different permutation), while shard membership -
    keyed by its own salt - is untouched."""
    d = _df(spark, 60)
    a = assign_training_shards(d, ["seq_id"], 4, salt_order="epoch0")
    b = assign_training_shards(d, ["seq_id"], 4, salt_order="epoch1")
    am = {r["seq_id"]: (r["shard"], r["position"]) for r in a.collect()}
    bm = {r["seq_id"]: (r["shard"], r["position"]) for r in b.collect()}
    assert all(am[i][0] == bm[i][0] for i in am)  # shards stable
    assert any(am[i][1] != bm[i][1] for i in am)  # order changed


def test_validation(spark):
    d = _df(spark, 4)
    with pytest.raises(ValueError, match="n_shards"):
        assign_training_shards(d, ["seq_id"], 0)
    with pytest.raises(ValueError, match="key_cols"):
        assign_training_shards(d, [], 4)


def test_manifest_plan_no_global_sort(spark):
    """The catalog query plans per-shard windows only: no
    SinglePartition anywhere (a global training order would funnel
    the manifest through one partition), shard/order_key stay scan
    expressions, and the window cut partitions on shard."""
    from conftest import SF_ORACLE
    from machine_downtime_monitor_on_aws_spark.plans import catalog
    from test_plans import explain

    plan = explain(
        catalog.REGISTRY["training_shard_manifest"].fn(spark, SF_ORACLE)
    )
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan
