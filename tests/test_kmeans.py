"""operators/kmeans: distributed Lloyd's training (r6 verdict
next-round #1) - exactness vs a pure-Python model, and the recall
evidence that trained centroids/codebooks beat the first-K bootstrap
the ANN surfaces previously ran on."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.kmeans import (
    centroids_to_df,
    first_k_init,
    hash_sampled_init,
    kmeans_assign,
    kmeans_fit_centroids_df,
    lloyd_iterations,
    train_pq_codebooks,
)

_Q = 1e9


def _model_lloyd(rows, init, dim, iters):
    """Reference Lloyd's with the same quantized re-center contract."""
    cents = {k: list(v) for k, v in init.items()}
    for _ in range(iters):
        buckets: dict = {}
        for _i, v in rows:
            best = min(
                cents.items(),
                key=lambda kv: (
                    sum((a - b) * (a - b) for a, b in zip(v, kv[1])),
                    kv[0],
                ),
            )
            buckets.setdefault(best[0], []).append(v)
        new = {}
        for key, old in cents.items():
            vs = buckets.get(key)
            if not vs:
                new[key] = old
                continue
            new[key] = [
                float(sum(int(math.floor(v[p] * _Q + 0.5)) for v in vs))
                / _Q
                / float(len(vs))
                for p in range(dim)
            ]
        cents = new
    return cents


def test_lloyd_bit_exact_vs_python_model(spark):
    """Every iteration - argmin ties, quantized integer re-center,
    empty-cluster fallback - must be BIT-identical to the sequential
    model regardless of partitioning (the property that lets
    kmeans_assignments carry a hash-exact DuckDB oracle)."""
    rng = random.Random(7)
    dim, k, iters = 6, 3, 4
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(60)]
    df = spark.createDataFrame(
        rows, "vec_id long, vec array<double>"
    ).repartition(7)
    init = first_k_init(df, k)
    got = lloyd_iterations(df, init, dim, iters)
    want = _model_lloyd(rows, init, dim, iters)
    assert got == want


def test_lloyd_empty_cluster_keeps_previous_centroid(spark):
    """A seed far from all data loses every point on iteration 1 and
    must carry its centroid forward unchanged (both engines coalesce
    identically)."""
    rows = [(i, [float(i % 3), 0.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    far = [1e6, 1e6]
    init = {(0,): [0.0, 0.0], (1,): [2.0, 0.0], (2,): list(far)}
    out = lloyd_iterations(df, init, 2, 2)
    assert out[(2,)] == far


def _clustered_fixture(rng, n_clusters, dim, per_cluster, spread):
    """True cluster c centered on unit axis c; ids are arranged so the
    FIRST n_clusters ids all live in cluster 0 - the adversarial case
    for the first-K bootstrap."""
    centers = []
    for c in range(n_clusters):
        base = [0.0] * dim
        base[c % dim] = 1.0 if c < dim else -1.0
        centers.append(base)

    def jitter(c):
        return [x + rng.uniform(-spread, spread) for x in centers[c]]

    rows = [(i, jitter(0)) for i in range(n_clusters)]  # poison seeds
    nid = 100
    for c in range(n_clusters):
        for _ in range(per_cluster):
            rows.append((nid, jitter(c)))
            nid += 1
    return rows


def _brute_top5(rows, qids, metric="l2"):
    """Exact top-5 ground truth in the metric the index under test
    actually ranks by (IVF search ranks by cosine, ADC by squared
    L2 - recall against the WRONG metric has a ceiling < 1 no matter
    how good the index is)."""

    def d(qv, v):
        if metric == "l2":
            return sum((a - b) * (a - b) for a, b in zip(qv, v))
        num = sum(a * b for a, b in zip(qv, v))
        return -num / (
            math.sqrt(sum(a * a for a in qv)) * math.sqrt(sum(b * b for b in v))
        )

    truth = {}
    for qid in qids:
        qv = dict(rows)[qid]
        scored = sorted((d(qv, v), i) for i, v in rows if i != qid)
        truth[qid] = {i for _, i in scored[:5]}
    return truth


def _recall(found: dict, truth: dict) -> float:
    return sum(
        len(found.get(q, set()) & t) / len(t) for q, t in truth.items()
    ) / len(truth)


def test_trained_centroids_beat_first_k_ivf_recall(spark, tmp_path):
    """The r6 verdict's 'done' bar: IVF recall@5 with k-means-trained
    centroids strictly above the first-K baseline on a clustered
    fixture where the first K ids all fall in one region (so the
    bootstrap centroids collapse and probes miss whole clusters)."""
    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        build_ivf_index,
        search_ivf_index,
    )

    rng = random.Random(23)
    n_clusters, dim = 8, 8
    rows = _clustered_fixture(rng, n_clusters, dim, per_cluster=30, spread=0.08)
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    qids = [100 + 30 * c for c in range(n_clusters)]
    truth = _brute_top5(rows, qids, metric="cos")
    q = spark.createDataFrame(
        [(i, dict(rows)[i]) for i in qids], "qid long, qvec array<double>"
    )

    def run(path, centroids):
        build_ivf_index(df, path, n_clusters, dim, centroids=centroids)
        got = search_ivf_index(spark, path, q, 5, 2, dim)
        found: dict = {}
        for r in got.collect():
            found.setdefault(r.qid, set()).add(r.neighbor_id)
        return _recall(found, truth)

    baseline = run(str(tmp_path / "firstk"), None)  # first-K bootstrap
    trained = run(
        str(tmp_path / "trained"),
        kmeans_fit_centroids_df(df, n_clusters, dim, iters=5, init="hash"),
    )
    # collapsed bootstrap centroids leave whole clusters sharing a
    # probe list; trained centroids separate them (deterministic
    # fixture: measured 0.95 vs 1.0)
    assert trained > baseline, (trained, baseline)
    assert trained >= 0.99, trained


def test_trained_pq_codebooks_cut_quantization_error(spark):
    """Trained per-subspace codebooks must reconstruct the corpus with
    strictly less total squared error than the first-K raw-vector
    books every PQ surface previously defaulted to - quantization
    error is the monotone proxy for ADC rank fidelity."""
    from machine_downtime_monitor_on_aws_spark.operators.pq import (
        pq_encode_reconstruct,
    )

    rng = random.Random(41)
    dim, m, k = 8, 2, 8
    rows = _clustered_fixture(rng, 4, dim, per_cluster=40, spread=0.15)
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")

    def total_err(books):
        from machine_downtime_monitor_on_aws_spark.functions.vectors import sq_l2

        enc = pq_encode_reconstruct(df, books, dim, m)
        return enc.select(
            F.sum(sq_l2(F.col("vec"), F.col("__recon"))).alias("e")
        ).collect()[0].e

    first_k_books = [v for _, v in sorted(rows)[:k]]
    trained_books = train_pq_codebooks(df, dim, m, k, iters=4)
    assert total_err(trained_books) < total_err(first_k_books)


def test_residual_ivfpq_beats_raw_encoding_recall(spark, tmp_path):
    """r6 verdict next-round #2: at equal code budget, PQ-encoding
    residuals (v - coarse centroid, books trained on residuals) must
    recover more true neighbors than raw-vector encoding - residuals
    concentrate near the origin so the same K entries quantize them
    finer than corpus-spread raw vectors."""
    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        build_ivfpq_index,
        ivfpq_knn,
        search_ivfpq_index,
    )
    from machine_downtime_monitor_on_aws_spark.operators.kmeans import (
        kmeans_assign,
    )

    rng = random.Random(59)
    n_clusters, dim, m, k_book = 4, 8, 4, 16
    rows = _clustered_fixture(rng, n_clusters, dim, per_cluster=50, spread=0.2)
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    qids = [100 + 50 * c for c in range(n_clusters)]
    truth = _brute_top5(rows, qids)
    q = spark.createDataFrame(
        [(i, dict(rows)[i]) for i in qids], "qid long, qvec array<double>"
    )

    coarse = kmeans_fit_centroids_df(df, n_clusters, dim, iters=4, init="hash")
    assigned = kmeans_assign(
        df, coarse.select(F.col("cid").alias("cluster"), "cv"), dim
    )
    residual_frame = assigned.join(
        F.broadcast(coarse.select(F.col("cid").alias("cluster"), "cv")),
        "cluster",
    ).select(
        "vec_id", F.zip_with("vec", "cv", lambda x, y: x - y).alias("vec")
    )
    res_books = train_pq_codebooks(residual_frame, dim, m, k_book, iters=4)
    raw_books = train_pq_codebooks(df, dim, m, k_book, iters=4)

    def run(path, books, residual):
        build_ivfpq_index(
            df, path, n_clusters, dim, m, pq_centroids=books,
            centroids=coarse, residual=residual,
        )
        got = search_ivfpq_index(spark, path, q, 5, n_clusters, dim, m, books)
        found: dict = {}
        for r in got.collect():
            found.setdefault(r.qid, set()).add(r.neighbor_id)
        return _recall(found, truth)

    raw = run(str(tmp_path / "raw"), raw_books, residual=False)
    res = run(str(tmp_path / "res"), res_books, residual=True)
    assert res > raw, (res, raw)

    # the inline composition (the catalog query's shape) agrees with
    # the persisted residual index on the same inputs
    inline = ivfpq_knn(
        df,
        q.select(F.col("qid"), F.col("qvec").alias("qv")),
        coarse,
        res_books,
        dim,
        m,
        n_probes=n_clusters,
        k=5,
        residual=True,
    )
    persisted = search_ivfpq_index(
        spark, str(tmp_path / "res"), q, 5, n_clusters, dim, m, res_books
    )
    a = sorted((r.qid, r.neighbor_id, r.rnk) for r in inline.collect())
    b = sorted((r.qid, r.neighbor_id, r.rnk) for r in persisted.collect())
    assert a == b


def test_hash_init_requires_enough_rows(spark):
    df = spark.createDataFrame([(1, [0.0])], "vec_id long, vec array<double>")
    with pytest.raises(ValueError, match="need k"):
        hash_sampled_init(df, 5)


def test_grouped_training_equals_per_subspace_runs(spark):
    """train_pq_codebooks solves all M subspace problems as one
    grouped job per iteration; the result must equal running each
    subspace's k-means independently."""
    rng = random.Random(13)
    dim, m, k = 6, 3, 4
    sub = dim // m
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    books = train_pq_codebooks(df, dim, m, k, iters=3, init="first")

    seeds = sorted(rows)[:k]
    for j in range(m):
        sliced = [(i, v[j * sub : (j + 1) * sub]) for i, v in rows]
        sdf = spark.createDataFrame(sliced, "vec_id long, vec array<double>")
        init = {
            (label,): v[j * sub : (j + 1) * sub]
            for label, (_, v) in enumerate(seeds)
        }
        solo = lloyd_iterations(sdf, init, sub, 3)
        for label in range(k):
            assert books[label][j * sub : (j + 1) * sub] == solo[(label,)]


def test_ivfpq_append_and_rerank(spark, tmp_path):
    """Steady-state IVF-PQ lifecycle: append encodes a new batch in
    the index's STAMPED mode (residual, validated codebook) without
    touching the corpus; two-stage re-rank recovers the exact-metric
    neighbors the quantized shortlist blurred."""
    import pytest

    from machine_downtime_monitor_on_aws_spark.operators.ivf import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        search_ivfpq_index,
        search_ivfpq_index_rerank,
    )

    rng = random.Random(71)
    n_clusters, dim, m, k_book = 4, 8, 4, 16
    rows = _clustered_fixture(rng, n_clusters, dim, per_cluster=40, spread=0.15)
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    coarse = kmeans_fit_centroids_df(df, n_clusters, dim, iters=3, init="hash")
    books = train_pq_codebooks(df, dim, m, k_book, iters=3)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(
        df, path, n_clusters, dim, m, pq_centroids=books,
        centroids=coarse, residual=True,
    )

    # append a batch near cluster 2's center; a query there must now
    # surface the appended ids
    new_rows = [(5000 + i,
                 [x + rng.uniform(-0.01, 0.01) for x in dict(rows)[100 + 80]])
                for i in range(10)]
    append_to_ivfpq_index(
        spark.createDataFrame(new_rows, "vec_id long, vec array<double>"),
        path, dim, m, books,
    )
    q = spark.createDataFrame(
        [(9000, new_rows[0][1])], "qid long, qvec array<double>"
    )
    got = search_ivfpq_index(spark, path, q, 5, 2, dim, m, books)
    nbrs = {r.neighbor_id for r in got.collect()}
    assert nbrs & {i for i, _ in new_rows}, nbrs

    # drifted codebook or wrong m on append fails loudly
    bad = [list(b) for b in books]
    bad[0][0] += 1.0
    with pytest.raises(ValueError, match="codebook_md5"):
        append_to_ivfpq_index(
            spark.createDataFrame(new_rows, "vec_id long, vec array<double>"),
            path, dim, m, bad,
        )

    # re-rank: exact top-5 in cosine against the raw source must be
    # at least as accurate as the pure-ADC top-5
    all_rows = rows + new_rows
    src = spark.createDataFrame(all_rows, "vec_id long, vec array<double>")
    qids = [100 + 40 * c for c in range(n_clusters)]
    truth = _brute_top5(all_rows, qids, metric="cos")
    qdf = spark.createDataFrame(
        [(i, dict(all_rows)[i]) for i in qids], "qid long, qvec array<double>"
    )
    with pytest.raises(ValueError, match="shortlist"):
        search_ivfpq_index_rerank(
            spark, path, qdf, 5, 3, n_clusters, dim, m, books, src)

    def recall_of(df_result):
        found: dict = {}
        for r in df_result.collect():
            found.setdefault(r.qid, set()).add(r.neighbor_id)
        return _recall(found, truth)

    adc = recall_of(
        search_ivfpq_index(spark, path, qdf, 5, n_clusters, dim, m, books))
    rerank = recall_of(search_ivfpq_index_rerank(
        spark, path, qdf, 5, 25, n_clusters, dim, m, books, src))
    assert rerank >= adc, (rerank, adc)
    assert rerank >= 0.9, rerank


def test_kmeans_parallel_init_covers_clusters_deterministically(spark):
    """k-means|| init: d^2-weighted oversampling must seed every
    dense region even on the fixture where small ids AND the hash
    sample can collapse; the whole pipeline is deterministic
    (hash-derived coin flips, heaviest-candidate reduction) so two
    runs return bit-identical seeds."""
    from machine_downtime_monitor_on_aws_spark.operators.kmeans import (
        kmeans_parallel_init,
    )

    rng = random.Random(83)
    n_clusters, dim = 8, 8
    rows = _clustered_fixture(rng, n_clusters, dim, per_cluster=30, spread=0.08)
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")

    seeds = kmeans_parallel_init(df, n_clusters, dim)
    assert len(seeds) == n_clusters
    again = kmeans_parallel_init(df, n_clusters, dim)
    assert seeds == again

    # every true cluster center has a seed nearer to it than to any
    # other center (coverage: no region left unseeded)
    centers = []
    for c in range(n_clusters):
        base = [0.0] * dim
        base[c % dim] = 1.0 if c < dim else -1.0
        centers.append(base)

    def nearest_center(v):
        return min(
            range(n_clusters),
            key=lambda c: sum((a - b) * (a - b) for a, b in zip(v, centers[c])),
        )

    covered = {nearest_center(v) for v in seeds.values()}
    assert covered == set(range(n_clusters)), covered

    # and Lloyd from these seeds separates the fixture perfectly
    trained = lloyd_iterations(df, seeds, dim, 3)
    cdf = centroids_to_df(spark, trained, [])
    assigned = kmeans_assign(df, cdf, dim)
    clusters_per_region: dict = {}
    for r in assigned.collect():
        if r.vec_id < 100:
            continue
        region = (r.vec_id - 100) // 30
        clusters_per_region.setdefault(region, set()).add(r.cluster)
    assert all(len(s) == 1 for s in clusters_per_region.values())
    labels = {next(iter(s)) for s in clusters_per_region.values()}
    assert len(labels) == n_clusters  # one distinct centroid per region


def test_pca_fit_and_project(spark):
    """PCA over an anisotropic synthetic corpus: the top axis aligns
    with the dominant direction, fits are deterministic, and the
    Arrow projection path equals a local numpy matmul."""
    import numpy as np

    from machine_downtime_monitor_on_aws_spark.operators.pca import (
        pca_fit,
        project_embeddings,
    )

    rng = random.Random(113)
    dim, n = 6, 300
    rows = []
    for i in range(n):
        big = rng.gauss(0, 3.0)
        rest = [rng.gauss(0, 0.3) for _ in range(dim - 1)]
        rows.append((i, [big] + rest))
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")

    vals, comps = pca_fit(df, dim)
    assert list(vals) == sorted(vals, reverse=True)
    # dominant axis ~ e0
    assert abs(comps[0][0]) > 0.99, comps[0]
    vals2, comps2 = pca_fit(df, dim)
    assert np.array_equal(comps, comps2) and np.array_equal(vals, vals2)

    proj = project_embeddings(df, comps, n_components=2)
    got = {r.vec_id: np.array(r.proj) for r in proj.collect()}
    mat = np.asarray(comps)[:2].T
    for i, v in rows:
        want = np.array(v) @ mat
        assert np.allclose(got[i], want, atol=1e-12), i
    # variance concentrates on the first component
    p1 = np.array([got[i][0] for i, _ in rows])
    p2 = np.array([got[i][1] for i, _ in rows])
    assert p1.var() > 10 * p2.var()


def test_pca_rotation_cuts_pq_quantization_error(spark):
    """The OPQ premise, demonstrated end-to-end: on a corpus whose
    variance is correlated ACROSS subspace boundaries, rotating into
    the PCA basis before product quantization strictly reduces total
    reconstruction error at the same code budget (the rotation is
    orthogonal, so errors are directly comparable)."""
    import numpy as np

    from machine_downtime_monitor_on_aws_spark.functions.vectors import sq_l2
    from machine_downtime_monitor_on_aws_spark.operators.pca import (
        pca_fit,
        project_embeddings,
    )
    from machine_downtime_monitor_on_aws_spark.operators.pq import (
        pq_encode_reconstruct,
    )

    rng = random.Random(131)
    dim, m, k = 8, 2, 8
    # dominant direction spans BOTH subspaces equally - the worst case
    # for per-subspace quantization
    direction = np.array([1.0, 0.5, -0.5, 1.0, -1.0, 0.5, 1.0, -0.5])
    direction /= np.linalg.norm(direction)
    rows = []
    for i in range(400):
        t = rng.gauss(0, 2.0)
        noise = np.array([rng.gauss(0, 0.15) for _ in range(dim)])
        rows.append((i, [float(x) for x in t * direction + noise]))
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")

    def total_err(frame):
        books = train_pq_codebooks(frame, dim, m, k, iters=4)
        enc = pq_encode_reconstruct(frame, books, dim, m)
        return enc.select(
            F.sum(sq_l2(F.col("vec"), F.col("__recon"))).alias("e")
        ).collect()[0].e

    _, comps = pca_fit(df, dim)
    rotated = project_embeddings(df, comps, out_col="vec")
    raw_err = total_err(df)
    rot_err = total_err(rotated)
    assert rot_err < raw_err, (rot_err, raw_err)


def test_gram_upper_vectorized_pins_to_expression_path(spark):
    """The numpy partial-aggregation path is bit-identical to the
    pure-expression explode twin (same per-product IEEE quantize
    steps, associative int64 sums) - on an adversarial-precision
    fixture and under a different partitioning."""
    import random as _random

    from machine_downtime_monitor_on_aws_spark.operators.pca import gram_upper

    rng = _random.Random(59)
    dim, n = 5, 200
    rows = [
        (i, [rng.gauss(0, 10.0 ** (j - 2)) for j in range(dim)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")

    def canon(frame):
        return sorted(
            (r.dim_i, r.dim_j, repr(r.gram_sum), r.n_vectors)
            for r in frame.collect()
        )

    expr = canon(gram_upper(df, dim, vectorized=False))
    fast = canon(gram_upper(df, dim, vectorized=True))
    fast2 = canon(gram_upper(df.repartition(7), dim, vectorized=True))
    assert fast == expr
    assert fast2 == expr


def test_centroid_store_roundtrip_and_guards(spark, tmp_path):
    """save/load round-trips the model bit-exactly (incl. string
    group keys), the self-digest guards torn/tampered stores, and
    expect_digest pins the exact model."""
    import json
    import os

    import pytest as _pt

    from machine_downtime_monitor_on_aws_spark.operators.kmeans import (
        centroids_digest,
        load_centroids,
        save_centroids,
    )

    cents = {
        ("en", 0): [0.1, 0.2 + 1e-16],
        ("en", 1): [1.5, -2.25],
        ("de", 0): [3.0, 4.0],
    }
    path = str(tmp_path / "cents")
    save_centroids(spark, path, cents)
    loaded, params = load_centroids(spark, path)
    assert loaded == cents  # exact doubles, key types preserved
    assert params["n_centroids"] == 3 and params["dim"] == 2
    load_centroids(spark, path, expect_digest=centroids_digest(cents))
    with _pt.raises(ValueError, match="expected model"):
        load_centroids(spark, path, expect_digest="0" * 32)
    # tamper (drop the local-FS .crc so OUR digest check fires)
    pj = f"{path}/params.json"
    p = json.load(open(pj))
    p["centroids_md5"] = "0" * 32
    open(pj, "w").write(json.dumps(p, sort_keys=True))
    crc = f"{path}/.params.json.crc"
    if os.path.exists(crc):
        os.remove(crc)
    with _pt.raises(ValueError, match="digest"):
        load_centroids(spark, path)
    with _pt.raises(ValueError, match="no committed"):
        load_centroids(spark, str(tmp_path / "absent"))


def test_catalog_kmeans_serves_from_persisted_store(spark, tmp_path, monkeypatch):
    """kmeans_assignments and semdedup_survivors share ONE persisted
    centroid store: the first call trains + persists, subsequent
    calls (and the sibling query) load it - proven by poisoning the
    trainer after the first call - and reproduce bit-identically."""
    import glob
    import tempfile

    from machine_downtime_monitor_on_aws_spark.plans import catalog

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    sf = "/root/testdata/sf0.001"
    fn_km = catalog.REGISTRY["kmeans_assignments"].fn
    fn_sd = catalog.REGISTRY["semdedup_survivors"].fn
    rows1 = {r.vec_id: tuple(r) for r in fn_km(spark, sf).collect()}
    stores = glob.glob(str(tmp_path / "spark_graft_km_cents_*"))
    assert len(stores) == 1, stores
    import machine_downtime_monitor_on_aws_spark.operators.kmeans as km

    def _boom(*a, **k):
        raise AssertionError("warm path retrained instead of loading")

    monkeypatch.setattr(km, "lloyd_iterations", _boom)
    rows2 = {r.vec_id: tuple(r) for r in fn_km(spark, sf).collect()}
    assert rows2 == rows1 and rows1
    # the sibling query rides the SAME store (no second training)
    sd = fn_sd(spark, sf).collect()
    assert len(glob.glob(str(tmp_path / "spark_graft_km_cents_*"))) == 1
    assert sd
