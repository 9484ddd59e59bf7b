"""Scalar quantization (operators/sq.py) and the OPQ rotation family:
unit pins beside the sq_knn_top5 / pq_permuted_knn_top5 oracle-paired
catalog queries."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _df(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, vec array<double>",
    )


def test_sq_roundtrip_error_bounded_by_half_step(spark):
    """Every in-range component reconstructs within scale/2 (the
    uniform-quantizer guarantee the 8x compression trades on), and a
    constant dimension reconstructs exactly."""
    from machine_downtime_monitor_on_aws_spark.operators.sq import (
        sq_encode,
        sq_fit_stats,
        sq_recon,
    )

    rows = [
        [0.0, 5.0, -1.0, 7.0],
        [1.0, 5.0, 3.5, -2.0],
        [0.25, 5.0, 2.0, 4.0],
        [0.9, 5.0, -0.5, 0.0],
    ]
    dim = 4
    df = _df(spark, rows, dim)
    stats = sq_fit_stats(df, dim)
    assert stats[1] == (5.0, 5.0)
    out = (
        sq_encode(df, stats)
        .withColumn("recon", sq_recon(stats))
        .select("vec_id", "vec", "sq_code", "recon")
        .collect()
    )
    for r in out:
        for j in range(dim):
            mn, mx = stats[j]
            scale = (mx - mn) / 255.0
            assert 0 <= r.sq_code[j] <= 255
            if scale == 0.0:
                assert r.sq_code[j] == 0 and r.recon[j] == mn
            else:
                assert abs(r.recon[j] - r.vec[j]) <= scale / 2 + 1e-12


def test_sq_encode_clamps_out_of_range(spark):
    """Stats fitted on a subset still encode outliers: values outside
    [mn, mx] clamp to the 0/255 rails instead of wrapping - the
    contract that lets a frozen quantizer encode future batches."""
    from machine_downtime_monitor_on_aws_spark.operators.sq import sq_encode

    df = _df(spark, [[-10.0, 10.0]], 2)
    stats = [(0.0, 1.0), (0.0, 1.0)]
    [r] = sq_encode(df, stats).collect()
    assert list(r.sq_code) == [0, 255]


def test_sq_topk_matches_python_model(spark):
    """sq_topk's ranks equal a pure-Python quantize->decode->score
    model on a random-ish fixture (deterministic arithmetic end to
    end, same tie rule)."""
    from machine_downtime_monitor_on_aws_spark.operators.sq import (
        sq_fit_stats,
        sq_topk,
    )

    dim, n = 6, 40
    rows = [
        [((i * 37 + j * 11) % 97) / 9.7 - 5.0 for j in range(dim)]
        for i in range(n)
    ]
    df = _df(spark, rows, dim)
    stats = sq_fit_stats(df, dim)
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qv")
    )
    got = {
        (r.qid, r.rnk): (r.neighbor_id, r.approx_l2)
        for r in sq_topk(q, df, stats, 4).collect()
    }

    def recon(v):
        out = []
        for j, (mn, mx) in enumerate(stats):
            scale = (mx - mn) / 255.0
            if scale == 0.0:
                out.append(mn)
                continue
            c = int((v[j] - mn) / scale + 0.5)  # floor for positive
            c = min(255, max(0, c))
            out.append(mn + float(c) * scale)
        return out

    recons = [recon(v) for v in rows]
    for qid in range(3):
        scored = []
        for i in range(n):
            if i == qid:
                continue
            d = 0.0
            for j in range(dim):
                t = rows[qid][j] - recons[i][j]
                d += t * t
            scored.append((d, i))
        scored.sort()
        for rnk, (d, i) in enumerate(scored[:4], start=1):
            nid, al2 = got[(qid, rnk)]
            assert nid == i
            assert al2 == pytest.approx(d, abs=0.0, rel=1e-12)


import random


def _correlated_fixture(spark, seed=131, n=400):
    """Dominant direction spanning BOTH subspaces - per-subspace
    quantizers can't capture it without a transform."""
    import numpy as np

    rng = random.Random(seed)
    dim = 8
    direction = np.array([1.0, 0.5, -0.5, 1.0, -1.0, 0.5, 1.0, -0.5])
    direction /= np.linalg.norm(direction)
    rows = []
    for i in range(n):
        t = rng.gauss(0, 2.0)
        noise = np.array([rng.gauss(0, 0.15) for _ in range(dim)])
        rows.append((i, [float(x) for x in t * direction + noise]))
    return (
        spark.createDataFrame(rows, "vec_id long, vec array<double>"),
        dim,
    )


def _pq_total_err(df, dim, m, k, iters=4):
    from machine_downtime_monitor_on_aws_spark.functions.vectors import sq_l2
    from machine_downtime_monitor_on_aws_spark.operators.kmeans import (
        train_pq_codebooks,
    )
    from machine_downtime_monitor_on_aws_spark.operators.pq import (
        pq_encode_reconstruct,
    )

    books = train_pq_codebooks(df, dim, m, k, iters=iters)
    enc = pq_encode_reconstruct(df, books, dim, m)
    return (
        enc.select(F.sum(sq_l2(F.col("vec"), F.col("__recon"))).alias("e"))
        .collect()[0]
        .e
    )


def test_variance_permutation_balances_subspace_energy(spark):
    """On a corpus whose variance concentrates in the first dims,
    the snake deal spreads it: max per-subspace variance share drops
    and the PQ reconstruction error strictly improves at the same
    code budget (L2 is permutation-invariant, so errors compare
    directly)."""
    from machine_downtime_monitor_on_aws_spark.operators.opq import (
        dim_variance_stats,
        permute_vec,
        variance_balanced_permutation,
    )

    rng = random.Random(17)
    dim, m, k = 8, 4, 4
    rows = []
    for i in range(400):
        v = [rng.gauss(0, 3.0), rng.gauss(0, 2.5)] + [
            rng.gauss(0, 0.1) for _ in range(dim - 2)
        ]
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    variances = dim_variance_stats(df, dim)
    perm = variance_balanced_permutation(variances, m)
    assert sorted(perm) == list(range(dim))
    sub = dim // m

    def max_share(order):
        sums = [
            sum(variances[j] for j in order[s * sub : (s + 1) * sub])
            for s in range(m)
        ]
        return max(sums) / sum(sums)

    assert max_share(perm) < max_share(list(range(dim)))

    pdf = df.select("vec_id", permute_vec(perm).alias("vec"))
    assert _pq_total_err(pdf, dim, m, k) < _pq_total_err(df, dim, m, k)


def test_opq_rotation_orthonormal_and_deterministic(spark):
    """opq_train_rotation returns an orthonormal R, a non-increasing
    start->end objective, and is bit-reproducible under a different
    input partitioning (the quantized integer sums make the
    cross-covariance partition-independent)."""
    import numpy as np

    from machine_downtime_monitor_on_aws_spark.operators.opq import (
        opq_train_rotation,
    )

    df, dim = _correlated_fixture(spark)
    R, books, hist = opq_train_rotation(df, dim, m=2, k=8, iters=2)
    assert np.allclose(R @ R.T, np.eye(dim), atol=1e-10)
    assert len(hist) == 3
    assert hist[-1] <= hist[0]
    R2, books2, hist2 = opq_train_rotation(
        df.repartition(7), dim, m=2, k=8, iters=2
    )
    assert np.array_equal(R, R2)
    assert books == books2
    assert hist == hist2


def test_opq_rotation_beats_raw_and_permutation_error(spark):
    """The full OPQ claim on the cross-boundary-correlated fixture:
    the learned rotation's final quantization error undercuts BOTH
    the unrotated baseline and the variance-permutation (which can
    only reorder dims, not align the dominant direction into one
    subspace)."""
    from machine_downtime_monitor_on_aws_spark.operators.opq import (
        dim_variance_stats,
        opq_train_rotation,
        permute_vec,
        variance_balanced_permutation,
    )

    df, dim = _correlated_fixture(spark)
    m, k = 2, 8
    raw_err = _pq_total_err(df, dim, m, k)
    perm = variance_balanced_permutation(dim_variance_stats(df, dim), m)
    perm_err = _pq_total_err(
        df.select("vec_id", permute_vec(perm).alias("vec")), dim, m, k
    )
    _R, _books, hist = opq_train_rotation(df, dim, m, k, iters=3)
    assert hist[-1] < raw_err, (hist, raw_err)
    assert hist[-1] < perm_err, (hist, perm_err)


def test_sq_preserves_brute_force_ranks(spark):
    """8-bit uniform quantization is near-lossless for ranking: on
    the smoke corpus, SQ top-5 recalls >= 4 of the exact brute-force
    top-5 for every query (the quality evidence beside the
    oracle-exactness the catalog query carries)."""
    from machine_downtime_monitor_on_aws_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    bf = {
        (r.qid, r.neighbor_id)
        for r in catalog.REGISTRY["knn_bruteforce_top5"].fn(spark, sf).collect()
    }
    sq = {}
    for r in catalog.REGISTRY["sq_knn_top5"].fn(spark, sf).collect():
        sq.setdefault(r.qid, set()).add(r.neighbor_id)
    assert sq, "no SQ results"
    for qid, neigh in sq.items():
        hits = sum(1 for n in neigh if (qid, n) in bf)
        assert hits >= 4, (qid, hits)


def test_sq_rerank_recovers_exact_ranks(spark):
    """Two-stage SQ: with a 4x shortlist the exact re-rank returns
    exactly the brute-force top-k (ids AND exact distances), even
    when coarse 4-level quantization scrambles the compressed
    ordering - the recall-recovery contract of the rerank tier."""
    from machine_downtime_monitor_on_aws_spark.functions.vectors import sq_l2
    from machine_downtime_monitor_on_aws_spark.operators.sq import (
        sq_fit_stats,
        sq_topk_rerank,
    )

    dim, n, k = 6, 60, 3
    rows = [
        [((i * 29 + j * 13) % 89) / 8.9 - 5.0 for j in range(dim)]
        for i in range(n)
    ]
    df = _df(spark, rows, dim)
    stats = sq_fit_stats(df, dim)
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qv")
    )
    got = {
        (r.qid, r.rnk): (r.neighbor_id, r.sq_dist)
        for r in sq_topk_rerank(
            q, df, stats, k, shortlist=4 * k, levels=4
        ).collect()
    }
    for qid in range(3):
        scored = []
        for i in range(n):
            if i == qid:
                continue
            d = 0.0
            for j in range(dim):
                t = rows[qid][j] - rows[i][j]
                d += t * t
            scored.append((d, i))
        scored.sort()
        for rnk, (d, i) in enumerate(scored[:k], start=1):
            nid, dist = got[(qid, rnk)]
            assert nid == i, (qid, rnk, nid, i)
            assert dist == pytest.approx(d, rel=1e-12)


def test_lit_array_helpers_bit_identical_to_flit(spark):
    """r17: lit_double_array / lit_long_array build the literal as one
    JVM-parsed SQL string (py4j round-trip elimination); the embedded
    values must be BIT-identical to the F.lit path, including the
    nasty doubles (negative zero, subnormal, DBL_MAX, shortest-repr
    tails), and the fallbacks must engage for empty / non-finite."""
    import math
    import struct

    from pyspark.sql import functions as F

    from machine_downtime_monitor_on_aws_spark.functions.vectors import (
        lit_double_array,
        lit_long_array,
    )

    vals = [
        -0.0, 0.0, 1.0 / 3.0, 2.0**-1074, 1.7976931348623157e308,
        -1e-9, 0.1, 123456789.123456789, -2.2250738585072014e-308,
    ]
    row = (
        spark.range(1)
        .select(
            lit_double_array(vals).alias("a"),
            F.lit([float(x) for x in vals]).alias("b"),
            lit_long_array([1 << j for j in range(63)]).alias("c"),
            F.lit([1 << j for j in range(63)]).alias("d"),
        )
        .collect()[0]
    )
    assert [struct.pack("<d", x) for x in row.a] == [
        struct.pack("<d", x) for x in row.b
    ]
    assert row.c == row.d
    # fallbacks: empty and non-finite route through F.lit unchanged
    nf = [1.0, float("inf")]
    got = spark.range(1).select(lit_double_array(nf).alias("x")).collect()[0].x
    assert got[0] == 1.0 and math.isinf(got[1])


def test_lit_string_array_bit_identical_and_guarded(spark):
    """r17: lit_string_array's fast path must produce exactly the
    F.lit values for plain-ASCII vocab pieces, and must FALL BACK to
    F.lit for anything the SQL parser could reinterpret (quotes,
    backslashes, control chars, non-ASCII, empty list)."""
    from pyspark.sql import functions as F

    from machine_downtime_monitor_on_aws_spark.functions.vectors import (
        lit_string_array,
    )

    safe = ["a", "Zz9", "_he-llo.", "~!@#$%^&*()", "[x]", '"dq"', " sp ", ""]
    row = (
        spark.range(1)
        .select(
            lit_string_array(safe).alias("a"),
            F.lit(list(safe)).alias("b"),
        )
        .collect()[0]
    )
    assert list(row.a) == list(row.b) == safe
    # adversarial near-misses must round-trip through the F.lit
    # fallback unchanged (we cannot see which path ran, so assert the
    # CONTRACT: output equals input for every nasty string)
    for nasty in ["it's", "back\\slash", "new\nline", "tab\tx",
                  "unié", "中文", "emoji\U0001f600", "nul\x00"]:
        got = (
            spark.range(1)
            .select(lit_string_array([nasty, "ok"]).alias("a"))
            .collect()[0]
            .a
        )
        assert list(got) == [nasty, "ok"], repr(nasty)
