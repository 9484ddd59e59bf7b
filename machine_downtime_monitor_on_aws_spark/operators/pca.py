"""Embedding second-moment statistics and PCA projection.

The precursor to whitening / OPQ-style rotations: accumulate the
Gram (uncentered second-moment) matrix distributively, eigendecompose
the tiny dim x dim result on the driver, and project the corpus
through the learned basis.

Scale shape: each vector explodes into its dim*(dim+1)/2 upper-
triangle products, but the pair aggregation PARTIALLY AGGREGATES
map-side - the exchange carries at most (cells x partitions) rows,
never (vectors x cells); products are quantized to 1e-9 and summed
as BIGINTs (the label_centroid_sums scheme), so the matrix is
bit-identical on any partitioning and the catalog's
``embedding_gram_upper`` carries a full hash-exact DuckDB oracle.
Eigendecomposition is numpy on a dim x dim matrix - driver-scale by
construction. Projection streams through an Arrow-batched
``mapInPandas`` matmul (the BLAS path - per-row expression folds
would fight the JIT at dim^2 work per row)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_QUANT = 1_000_000_000.0


def gram_upper(
    df: DataFrame, dim: int, vec_col: str = "vec", vectorized: bool = True
) -> DataFrame:
    """(dim_i, dim_j, gram_sum, n_vectors) for 0 <= i <= j < dim:
    quantized-exact sums of v[i]*v[j] over the corpus.

    Two bit-identical physical paths (pinned equal in tests), both
    ending in the same map-side-combining (dim_i, dim_j) aggregation:

    - ``vectorized=True`` (default): each partition computes its
      upper-triangle integer partials in ONE numpy pass (outer
      products -> floor-quantize -> int64 row-sum) and emits just
      dim*(dim+1)/2 summary rows - the exchange carries cells x
      partitions rows and no per-vector row ever materializes. This
      is the hot path: the expression twin pays an explode to
      2080 rows PER VECTOR at dim=64 before the partial agg absorbs
      them (~6x slower at the bench corpus).
    - ``vectorized=False``: pure-expression explode, zero Python -
      kept as the UDF-free reference the vectorized path is pinned
      against, and the shape the DuckDB oracle mirrors literally.

    Exactness is identical because both paths apply the same IEEE
    steps per product (v[i]*v[j], *1e9, +0.5, floor, int64) and
    int64 sums are associative. Headroom: |product|*1e9 at O(10)
    magnitudes leaves ~1e7 rows per cell per PARTITION before an
    int64 partial could overflow - repartition finer long before
    that."""
    if vectorized:
        import numpy as np
        import pandas as pd

        iu0, iu1 = np.triu_indices(dim)

        def op(batches):
            qsum = np.zeros(len(iu0), dtype=np.int64)
            n = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.array(list(pdf[vec_col]), dtype=np.float64)
                for lo in range(0, len(x), 1024):
                    xb = x[lo : lo + 1024]
                    prod = xb[:, :, None] * xb[:, None, :]
                    cells = prod[:, iu0, iu1]
                    qsum += (
                        np.floor(cells * _QUANT + 0.5)
                        .astype(np.int64)
                        .sum(axis=0)
                    )
                    n += len(xb)
            if n == 0:
                return
            yield pd.DataFrame(
                {
                    "dim_i": iu0.astype("int32"),
                    "dim_j": iu1.astype("int32"),
                    "__q": qsum,
                    "__n": np.int64(n),
                }
            )

        cells = df.select(vec_col).mapInPandas(
            op, "dim_i int, dim_j int, __q long, __n long"
        )
        return cells.groupBy("dim_i", "dim_j").agg(
            (F.sum("__q").cast("double") / F.lit(_QUANT)).alias("gram_sum"),
            F.sum("__n").alias("n_vectors"),
        )
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        F.element_at(F.col(vec_col), i + 1)
                        * F.element_at(F.col(vec_col), j + 1)
                    ).alias("p"),
                ),
            ),
        )
    )
    q = F.floor(F.col("__p.p") * F.lit(_QUANT) + F.lit(0.5)).cast("long")
    return (
        df.select(F.explode(pairs).alias("__p"))
        .select(
            F.col("__p.i").cast("int").alias("dim_i"),
            F.col("__p.j").cast("int").alias("dim_j"),
            q.alias("__q"),
        )
        .groupBy("dim_i", "dim_j")
        .agg(
            (F.sum("__q").cast("double") / F.lit(_QUANT)).alias("gram_sum"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


def pca_fit(df: DataFrame, dim: int, vec_col: str = "vec"):
    """Principal axes of the (uncentered) second-moment matrix:
    returns (eigenvalues desc, components) where ``components[k]``
    is the k-th principal axis (rows of the projection matrix).
    One distributed Gram aggregation (bounded collect of
    dim*(dim+1)/2 cells) + a driver-side numpy ``eigh``. Signs are
    fixed deterministically (largest-|coefficient| entry positive)
    so repeated fits are identical."""
    import numpy as np

    rows = gram_upper(df, dim, vec_col).collect()
    if not rows:
        raise ValueError("pca_fit: empty corpus")
    n = rows[0]["n_vectors"]
    g = np.zeros((dim, dim))
    for r in rows:
        v = r["gram_sum"] / float(n)
        g[r["dim_i"], r["dim_j"]] = v
        g[r["dim_j"], r["dim_i"]] = v
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    # deterministic sign: make each axis's largest-|coeff| entry
    # positive (eigh's sign is arbitrary)
    for k in range(dim):
        lead = np.argmax(np.abs(vecs[:, k]))
        if vecs[lead, k] < 0:
            vecs[:, k] = -vecs[:, k]
    return vals, vecs.T.copy()


def project_embeddings(
    df: DataFrame,
    components,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    out_col: str = "proj",
    n_components: int | None = None,
) -> DataFrame:
    """Project vectors onto ``components`` (rows = axes, e.g. from
    :func:`pca_fit`) - an Arrow-batched numpy matmul per partition,
    matrix shipped in the closure. Returns (id, out_col). Truncate
    with ``n_components`` for dimensionality reduction ahead of
    PQ/IVF (the standard recall-per-byte win)."""
    import numpy as np
    import pandas as pd

    mat = np.asarray(components, dtype=np.float64)
    if n_components is not None:
        mat = mat[:n_components]
    mt = mat.T.copy()

    def op(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            proj = x @ mt
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: list(proj)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        op, f"{id_col} long, {out_col} array<double>"
    )
