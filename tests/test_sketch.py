"""operators/sketch.py: count-min sketch and Bloom filter, pinned
bit-for-bit against pure-Python models of the same md5 hash scheme
(the xxhash/minhash test discipline), plus the structural guarantees
that make each sketch safe to use: CMS never underestimates, blooms
never false-negative."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.sketch import (
    bloom_build,
    bloom_probe,
    cms_build,
    cms_estimate,
)

TOKENS = (
    "the quick brown fox jumps over the lazy dog the fox the dog "
    "stream value key stream stream value"
).split()


def _h24(salt: str, value: str) -> int:
    return int(hashlib.md5(f"{salt}:{value}".encode()).hexdigest()[:6], 16)


def _py_cms(values, depth, width):
    cells: dict[tuple[int, int], int] = {}
    for v in values:
        for r in range(depth):
            c = _h24(f"cms{r}", v) % width
            cells[(r, c)] = cells.get((r, c), 0) + 1
    return cells


def _py_cms_estimate(cells, value, depth, width):
    return min(
        cells.get((r, _h24(f"cms{r}", value) % width), 0) for r in range(depth)
    )


def test_cms_matches_python_model_and_never_underestimates(spark):
    depth, width = 4, 16  # tiny width to force collisions
    df = spark.createDataFrame([(t,) for t in TOKENS], "tok string")
    cells = cms_build(df, "tok", depth, width)
    got = {(r.r, r.c): r.ct for r in cells.collect()}
    assert got == _py_cms(TOKENS, depth, width)

    probes = df.distinct()
    est = {
        r.tok: r.cms_ct
        for r in cms_estimate(probes, "tok", cells, depth, width).collect()
    }
    exact: dict[str, int] = {}
    for t in TOKENS:
        exact[t] = exact.get(t, 0) + 1
    for tok, true_ct in exact.items():
        assert est[tok] >= true_ct  # the CMS one-sided error guarantee
        assert est[tok] == _py_cms_estimate(got, tok, depth, width)


def test_cms_exact_when_wide_enough(spark):
    # with no collisions (width >> distinct tokens) every estimate
    # collapses to the true count
    depth, width = 4, 1 << 16
    df = spark.createDataFrame([(t,) for t in TOKENS], "tok string")
    cells = cms_build(df, "tok", depth, width)
    est = {
        r.tok: r.cms_ct
        for r in cms_estimate(df.distinct(), "tok", cells, depth, width).collect()
    }
    for tok in set(TOKENS):
        assert est[tok] == TOKENS.count(tok)


def test_cms_absent_probe_estimates_small(spark):
    depth, width = 4, 1 << 16
    df = spark.createDataFrame([(t,) for t in TOKENS], "tok string")
    cells = cms_build(df, "tok", depth, width)
    probes = spark.createDataFrame([("zebra",), ("xylophone",)], "tok string")
    est = {
        r.tok: r.cms_ct
        for r in cms_estimate(probes, "tok", cells, depth, width).collect()
    }
    assert est == {"zebra": 0, "xylophone": 0}


def _py_bloom_bits(keys, n_bits, k):
    return {
        _h24(f"bloom{j}", str(key)) % n_bits for key in keys for j in range(k)
    }


def test_bloom_matches_python_model_no_false_negatives(spark):
    n_bits, k = 256, 3
    members = [str(i) for i in range(40)]
    df = spark.createDataFrame([(m,) for m in members], "key string")
    bits = bloom_build(df, "key", n_bits, k)
    got = {r.bit for r in bits.collect()}
    assert got == _py_bloom_bits(members, n_bits, k)

    probes = spark.createDataFrame(
        [(str(i),) for i in range(120)], "key string"
    )
    res = {
        r.key: r.bloom_member
        for r in bloom_probe(probes, "key", bits, n_bits, k).collect()
    }
    for m in members:
        assert res[m] is True  # never a false negative
    # python-model agreement on every probe, including false positives
    for key, member in res.items():
        expected = all(
            (_h24(f"bloom{j}", key) % n_bits) in got for j in range(k)
        )
        assert member == expected


def test_bloom_saturated_filter_passes_everything(spark):
    # the documented undersized-bloom failure mode: with n_bits tiny
    # every bit sets and every probe passes - degraded, never wrong
    n_bits, k = 8, 3
    df = spark.createDataFrame([(str(i),) for i in range(200)], "key string")
    bits = bloom_build(df, "key", n_bits, k)
    assert bits.count() == n_bits
    probes = spark.createDataFrame([("nope",), ("also-nope",)], "key string")
    res = bloom_probe(probes, "key", bits, n_bits, k).collect()
    assert all(r.bloom_member for r in res)


def test_sketch_param_validation(spark):
    import pytest

    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError):
        cms_build(df, "key", 0, 16)
    with pytest.raises(ValueError):
        cms_build(df, "key", 4, (1 << 24) + 1)
    with pytest.raises(ValueError):
        bloom_build(df, "key", 0, 3)
    with pytest.raises(ValueError):
        bloom_build(df, "key", 256, 17)
