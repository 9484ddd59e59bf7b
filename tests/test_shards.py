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
    assign_balanced_shards,
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
    """The manifest plans per-shard windows only: no SinglePartition
    anywhere (a global training order would funnel the manifest
    through one partition), shard/order_key stay scan expressions,
    and the window cut partitions on shard. (Pinned on the builder
    directly since the r17 swap retired the catalog row - the same
    shard/order_key functions stay driver-verified inside
    shard_manifest_stream_replay's oracle.)"""
    from conftest import SF_ORACLE
    from machine_downtime_monitor_on_aws_spark.plans import pipelineops
    from test_plans import explain

    plan = explain(pipelineops.training_shard_manifest(spark, SF_ORACLE))
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard" in plan


# --- length-balanced shards (assign_balanced_shards, r16) ---


def _wdf(spark, n, seed=7):
    """Skewed integer weights (token-count-like): a long tail of
    short sequences plus a head of near-budget ones."""
    import random

    rng = random.Random(seed)
    rows = [
        (i, rng.choice([8, 8, 8, 16, 16, 64, 256, 511, 512, 512]))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "seq_id long, n_tokens int")


def _balanced_model(rows, n_shards, salt_order="order"):
    """Independent Python re-derivation: rank within weight stratum
    by (md5 order_key, key), shard = (rank - 1) mod n_shards,
    position = per-shard rank by the same order."""
    by_w: dict[int, list] = {}
    for seq_id, w in rows:
        ok = hashlib.md5(f"{salt_order}:{seq_id}".encode()).hexdigest()
        by_w.setdefault(w, []).append((ok, str(seq_id), seq_id))
    shard_of, okey_of = {}, {}
    for w, members in by_w.items():
        members.sort()
        for r, (ok, _, seq_id) in enumerate(members, start=1):
            shard_of[seq_id] = (r - 1) % n_shards
            okey_of[seq_id] = ok
    pos_of = {}
    by_shard: dict[int, list] = {}
    for seq_id, shard in shard_of.items():
        by_shard.setdefault(shard, []).append((okey_of[seq_id], seq_id))
    for shard, members in by_shard.items():
        members.sort()
        for p, (_, seq_id) in enumerate(members, start=1):
            pos_of[seq_id] = p
    return shard_of, okey_of, pos_of


def test_balanced_matches_python_model(spark):
    """Shard, order_key and position all equal the single-window
    Python model - the distributed prefix-bucket rank is EXACTLY the
    stratum rank, not an approximation of it."""
    n, n_shards = 120, 4
    src = [(r["seq_id"], r["n_tokens"]) for r in _wdf(spark, n).collect()]
    shard_of, okey_of, pos_of = _balanced_model(src, n_shards)
    rows = assign_balanced_shards(
        _wdf(spark, n), ["seq_id"], "n_tokens", n_shards
    ).collect()
    assert len(rows) == n
    for r in rows:
        assert r["shard"] == shard_of[r["seq_id"]], r
        assert r["order_key"] == okey_of[r["seq_id"]]
        assert r["position"] == pos_of[r["seq_id"]]


def test_balanced_matches_duckdb_oracle_form(spark):
    """The operator equals its own balanced_shard_sql oracle twin run
    in DuckDB on the same rows - the form the r17 catalog row will
    hash against."""
    import duckdb

    from machine_downtime_monitor_on_aws_spark.operators.shards import (
        balanced_shard_sql,
        order_key_sql,
    )

    d = _wdf(spark, 90)
    got = sorted(
        (r["seq_id"], r["shard"], r["order_key"], r["position"])
        for r in assign_balanced_shards(
            d, ["seq_id"], "n_tokens", 8
        ).collect()
    )
    con = duckdb.connect()
    con.register("t", d.toPandas())
    shard = balanced_shard_sql("n_tokens", "seq_id", 8)
    ok = order_key_sql("seq_id")
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
WITH s AS (SELECT seq_id, {shard} AS shard, {ok} AS order_key FROM t)
SELECT seq_id, shard, order_key,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY order_key, seq_id) AS INT)
         AS position
FROM s"""
            ).fetchall(),
        )
    )
    assert got == want


def test_balanced_bucket_width_is_an_implementation_detail(spark):
    """bucket_hex changes only HOW the rank distributes, never the
    result: widths 1 and 3 produce identical manifests (the
    prefix-of-the-sort-key law)."""
    d = _wdf(spark, 80)
    a = assign_balanced_shards(d, ["seq_id"], "n_tokens", 4, bucket_hex=1)
    b = assign_balanced_shards(
        d.repartition(5), ["seq_id"], "n_tokens", 4, bucket_hex=3
    )
    assert sorted(map(tuple, a.collect())) == sorted(
        map(tuple, b.collect())
    )


def test_balanced_beats_hash_and_meets_the_constant_bound(spark):
    """The theorem the operator exists for: per-stratum shard counts
    differ by <= 1, so the max-min total-weight gap is bounded by
    sum(distinct weights) - a constant independent of corpus size -
    while hash assignment's gap on the same corpus grows with
    sqrt(N). Checked at two sizes: the balanced gap stays under the
    bound both times and under the hash gap at the larger size."""
    import collections

    bound = sum({8, 16, 64, 256, 511, 512})
    for n in (200, 2000):
        d = _wdf(spark, n)
        bal = assign_balanced_shards(d, ["seq_id"], "n_tokens", 4)
        loads = collections.Counter()
        strata = collections.Counter()
        for r in bal.collect():
            loads[r["shard"]] += r["n_tokens"]
            strata[(r["n_tokens"], r["shard"])] += 1
        for w in {8, 16, 64, 256, 511, 512}:
            counts = [strata[(w, s)] for s in range(4)]
            assert max(counts) - min(counts) <= 1, (w, counts)
        gap = max(loads.values()) - min(loads.values())
        assert gap <= bound, (n, gap, bound)
        if n == 2000:
            w_of = {x["seq_id"]: x["n_tokens"] for x in d.collect()}
            hloads = collections.Counter()
            for r in assign_training_shards(d, ["seq_id"], 4).collect():
                hloads[r["shard"]] += w_of[r["seq_id"]]
            hgap = max(hloads.values()) - min(hloads.values())
            assert gap < hgap, (gap, hgap)


def test_balanced_deterministic_across_partitionings(spark):
    d = _wdf(spark, 70)
    a = assign_balanced_shards(d, ["seq_id"], "n_tokens", 8).collect()
    b = assign_balanced_shards(
        d.repartition(11), ["seq_id"], "n_tokens", 8
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_balanced_validation_and_weight_guard(spark):
    d = _wdf(spark, 6)
    with pytest.raises(ValueError, match="n_shards"):
        assign_balanced_shards(d, ["seq_id"], "n_tokens", 0)
    with pytest.raises(ValueError, match="key_cols"):
        assign_balanced_shards(d, [], "n_tokens", 4)
    with pytest.raises(ValueError, match="bucket_hex"):
        assign_balanced_shards(d, ["seq_id"], "n_tokens", 4, bucket_hex=0)
    bad = spark.createDataFrame(
        [(1, 5), (2, -3)], "seq_id long, n_tokens int"
    )
    with pytest.raises(Exception, match="non-negative"):
        assign_balanced_shards(bad, ["seq_id"], "n_tokens", 4).collect()


def test_balanced_plan_no_global_sort(spark):
    """No SinglePartition: the stratum rank is the prefix-bucket
    two-level derivation (counts sliver + broadcast base offsets),
    never one big window; the offsets join is a BroadcastExchange."""
    import contextlib
    import io

    out = assign_balanced_shards(
        _wdf(spark, 50), ["seq_id"], "n_tokens", 4
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_balanced_manifest_matches_duckdb_oracle(spark):
    """balanced_shard_manifest (built r16, registers r17 - pinned on
    the builder until its catalog slot opens): the Spark result
    already hash-matches its written DuckDB oracle on the oracle
    corpus, and the plan keeps the no-SinglePartition line."""
    import contextlib
    import io

    import duckdb

    from conftest import SF_ORACLE
    from machine_downtime_monitor_on_aws_spark.plans.pipelineops import (
        _BSHARD_SQL,
        balanced_shard_manifest,
    )
    from machine_downtime_monitor_on_aws_spark.tables import table_path

    out = balanced_shard_manifest(spark, SF_ORACLE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan, plan
    assert "BroadcastExchange" in plan, plan

    got = sorted(map(tuple, out.collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{table_path(SF_ORACLE, 'documents')}')"
    )
    want = sorted(map(tuple, con.execute(_BSHARD_SQL).fetchall()))
    assert got == want and got
