"""Optimized product quantization: dimension permutation and learned
rotation ahead of PQ (Ge/He/Ke/Sun, CVPR 2013).

PQ's subspace quantizers are trained independently, so its distortion
is hostage to how variance (and correlation) spreads across the M
subspaces: if one subspace carries most of the energy, its K
centroids are spent where K*M would be needed, while flat subspaces
waste codes. OPQ fixes the space allocation by transforming vectors
BEFORE the split:

- the *permutation* variant (this module's oracle-checkable half)
  reorders dimensions so each subspace gets a balanced share of the
  per-dimension variance - the "natural order" baseline the OPQ paper
  evaluates against, implemented here as a deterministic
  snake/serpentine deal over the variance ranking. Everything is
  relational (quantized-exact variance -> rank -> arithmetic on the
  rank), so the catalog query ``pq_permuted_knn_top5`` hash-matches a
  DuckDB oracle end to end.
- the *rotation* variant (non-parametric OPQ) alternates PQ codebook
  training with a Procrustes solve for an orthonormal R minimizing
  ||X R - reconstruction||^2. The solve needs an SVD, so it is not
  oracle-expressible; it lives in :func:`opq_train_rotation` with
  determinism + distortion-improvement pins in tests, mirroring how
  k-means|| and PCA are evidenced.

Scale shape: variance stats and cross-covariance accumulation are
single aggregations whose partials combine map-side (dim resp.
dim*dim bounded rows reach the driver - the Gram/PCA machinery);
permutation/rotation application is per-row scan work (expression
resp. Arrow-batched matmul); nothing shuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_QUANT = 1_000_000_000.0


def dim_variance_stats(
    df: DataFrame, dim: int, vec_col: str = "vec"
) -> list[float]:
    """Per-dimension population variance over the corpus, via the
    quantized integer-sum scheme (floor(x*1e9+0.5) BIGINTs for both
    sum and sum-of-squares), so the result is bit-identical on any
    partitioning and re-derivable relationally: ONE aggregation job
    (posexplode to (dim, component) rows feeding a 3-expression
    grouped agg whose integer partials combine map-side - NOT 2*dim
    unrolled aggregate columns, which blew past the JIT-bytecode
    cliff and ran ~5x slower), dim summary rows collected."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("__j", "__x"))
        .groupBy("__j")
        .agg(
            F.sum(
                F.floor(F.col("__x") * F.lit(_QUANT) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("__s"),
            F.sum(
                F.floor(
                    F.col("__x") * F.col("__x") * F.lit(_QUANT) + F.lit(0.5)
                ).cast("long")
            ).alias("__q"),
            F.count(F.lit(1)).alias("__n"),
        )
        .collect()
    )
    if len(rows) != dim:
        raise ValueError(
            f"expected {dim} dimensions, found {len(rows)} - ragged vectors?"
        )
    out = [0.0] * dim
    for r in rows:
        n = float(r["__n"])
        mean = float(r["__s"]) / _QUANT / n
        msq = float(r["__q"]) / _QUANT / n
        out[r["__j"]] = msq - mean * mean
    return out


def variance_balanced_permutation(
    variances: list[float], m: int
) -> list[int]:
    """Deal dimensions to M subspaces so variance balances: rank dims
    by variance (desc, index-asc ties), then snake over the subspaces
    (round t visits them left-to-right when t is even, right-to-left
    when odd - each round hands every subspace exactly one dim, and
    the direction flip keeps the per-round rank sum even). Returns
    the dimension order ``perm`` such that permuted[i] = v[perm[i]]
    and contiguous blocks of dim/m entries form the subspaces."""
    dim = len(variances)
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    ranked = sorted(range(dim), key=lambda j: (-variances[j], j))
    keyed = []
    for r, j in enumerate(ranked):
        t, c = divmod(r, m)
        sub = c if t % 2 == 0 else m - 1 - c
        keyed.append((sub, t, j))
    return [j for _sub, _t, j in sorted(keyed)]


def permute_vec(perm: list[int], vec_col: str = "vec") -> Column:
    """Expression applying a dimension permutation:
    out[i] = vec[perm[i]] - per-row scan work, no shuffle."""
    return F.array(
        *[F.element_at(F.col(vec_col), int(j) + 1) for j in perm]
    )


def _cross_cov_and_error(
    df: DataFrame,
    rotation,
    codebooks: list[list[float]],
    dim: int,
    m: int,
    id_col: str,
    vec_col: str,
):
    """One distributed pass of the OPQ alternation's E-step: rotate,
    encode against the current codebooks, reconstruct, and accumulate
    BOTH the cross-covariance X^T Y (raw vectors x reconstructions -
    the Procrustes input) and the total quantization error. Every
    per-row product quantizes to a 1e-9 BIGINT before summing (the
    Gram/label_centroid_sums scheme), so the dim*dim + 1 summary the
    driver collects is bit-identical on any partitioning. The corpus
    never shuffles: partitions stream through an Arrow batch, each
    emitting its partial integer sums."""
    import numpy as np
    import pandas as pd

    sub = dim // m
    R = np.asarray(rotation, dtype=np.float64)
    book = np.asarray(codebooks, dtype=np.float64)  # (K, dim)

    def op(batches):
        csum = np.zeros((dim, dim), dtype=np.int64)
        errq = 0
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            for lo in range(0, len(X), 1024):
                xb = X[lo : lo + 1024]
                xr = xb @ R
                y = np.empty_like(xr)
                for j in range(m):
                    sl = slice(j * sub, (j + 1) * sub)
                    d = ((xr[:, None, sl] - book[None, :, sl]) ** 2).sum(
                        axis=2
                    )
                    codes = d.argmin(axis=1)  # first min = smallest code
                    y[:, sl] = book[codes, sl]
                prod = xb[:, :, None] * y[:, None, :]
                csum += (
                    np.floor(prod * _QUANT + 0.5).astype(np.int64).sum(axis=0)
                )
                errq += int(
                    np.floor(((xr - y) ** 2).sum(axis=1) * _QUANT + 0.5)
                    .astype(np.int64)
                    .sum()
                )
                n += len(xb)
        cells = [
            (int(i), int(j), int(csum[i, j]))
            for i in range(dim)
            for j in range(dim)
        ]
        cells.append((-1, 0, errq))
        cells.append((-1, 1, n))
        yield pd.DataFrame(cells, columns=["i", "j", "q"])

    rows = (
        df.select(id_col, vec_col)
        .mapInPandas(op, "i int, j int, q long")
        .groupBy("i", "j")
        .agg(F.sum("q").alias("q"))
        .collect()
    )
    C = np.zeros((dim, dim))
    err = 0.0
    for r in rows:
        if r.i == -1:
            if r.j == 0:
                err = r.q / _QUANT
        else:
            C[r.i, r.j] = r.q / _QUANT
    return C, err


def opq_train_rotation(
    df: DataFrame,
    dim: int,
    m: int,
    k: int,
    iters: int = 3,
    pq_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    init: str = "identity",
):
    """Non-parametric OPQ (Ge et al., CVPR 2013, Alg. 2): alternate
    (a) training PQ codebooks on the rotated corpus (the existing
    grouped-per-subspace distributed k-means, operators/kmeans.py)
    with (b) the orthogonal Procrustes update - SVD(X^T Y) = U S V^T,
    R <- U V^T - where X^T Y accumulates distributively with
    quantized-exact integer sums. ``init`` is "identity" or "pca"
    (rotate into the PCA basis first - often a better basin).
    Returns (R, codebooks, err_history): R is dim x dim orthonormal
    (rows: rotated = v @ R), codebooks are trained for the FINAL R
    and drop into every PQ surface over the rotated vectors,
    err_history[t] is the total squared quantization error at
    alternation t (len iters + 1: the final entry evaluates the
    returned pair). Deterministic end to end: quantized sums kill
    partition-order variance, k-means inits are hash-seeded, and
    argmin ties break to the smallest code.

    Scale shape per alternation: one Arrow-batched rotate feeding the
    codebook trainer (corpus explodes once per k-means iteration into
    subspace rows - the existing train_pq_codebooks plan), then one
    map-side-combining pass collecting dim*dim + 1 summary cells.
    The SVD is a dim x dim driver-side numpy call - bounded by
    construction, like pca_fit's eigh."""
    import numpy as np

    from .kmeans import train_pq_codebooks
    from .pca import pca_fit, project_embeddings

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if init == "pca":
        _, comps = pca_fit(df, dim, vec_col=vec_col)
        R = np.asarray(comps, dtype=np.float64).T.copy()
    elif init == "identity":
        R = np.eye(dim)
    else:
        raise ValueError(f"unknown init {init!r}")

    err_history: list[float] = []
    books: list[list[float]] = []
    for _t in range(iters + 1):
        rotated = project_embeddings(
            df, R.T, id_col=id_col, vec_col=vec_col, out_col=vec_col
        )
        books = train_pq_codebooks(
            rotated, dim, m, k, pq_iters, id_col=id_col, vec_col=vec_col
        )
        C, err = _cross_cov_and_error(
            df, R, books, dim, m, id_col, vec_col
        )
        err_history.append(err)
        if _t == iters:
            break
        U, _s, Vt = np.linalg.svd(C)
        R = U @ Vt
    return R, books, err_history
