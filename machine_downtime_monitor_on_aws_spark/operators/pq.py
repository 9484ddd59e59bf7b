"""Product quantization (Jegou/Douze/Schmid, TPAMI 2011): the
compressed-ANN scale path next to IVF.

A D-dim float64 vector costs 8D bytes; PQ splits it into M subvectors
and stores only the id of each subvector's nearest codebook centroid
- M small ints (here one byte each at K<=256), a 64x compression at
D=64/M=8. Search scores queries against the RECONSTRUCTION
(blockwise centroid concatenation), which is exactly the asymmetric
distance computation (ADC): sqL2(q, recon) == sum over subspaces of
sqL2(q_sub, centroid[code]_sub).

At 100 TB the point is that the SCORED corpus representation shrinks
64x: the code table (and reconstructions derived from broadcast
codebooks) fit where raw vectors cannot, scans are cheaper by the
same factor, and PQ composes with IVF (store codes inside inverted
lists) for the standard IVF-ADC pipeline.

Everything here is deterministic expression work (no UDFs, no
iteration): codebooks are caller-provided vectors (the catalog query
uses the first-K scheme so its DuckDB oracle can re-derive them
relationally; production passes k-means codebooks), encoding is an
argmin over codebook literals per subspace, ties to the smallest
centroid id - bit-reproducible across engines, which is why
pq_knn_top5 carries a full hash-exact oracle rather than a rows-only
check."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import sq_l2
from .topk import top_k_per_group


def _literal_subcodebook(
    centroids: list[list[float]], j: int, sub: int
) -> Column:
    """Subspace j's codebook as a literal array<array<double>> -
    embedded in the plan, so encoding needs no join and the same
    values can be re-derived by the oracle from the table."""
    return F.array(
        *[
            F.array(*[F.lit(float(c[j * sub + i])) for i in range(sub)])
            for c in centroids
        ]
    )


def pq_encode_reconstruct(
    df: DataFrame,
    centroids: list[list[float]],
    dim: int,
    m: int,
    vec_col: str = "vec",
) -> DataFrame:
    """Add ``pq_code`` (array<int>, length m - the stored form) and
    ``__recon`` (the blockwise-centroid reconstruction ADC scores
    against). Per subspace: distances to K literal sub-centroids
    (O(K * dim/m) per row), argmin with first-match (= smallest
    centroid id) tie-break via array_position of the min."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if not centroids:
        raise ValueError("empty codebook")
    sub = dim // m
    codes = []
    recon_parts = []
    for j in range(m):
        v_sub = F.slice(F.col(vec_col), j * sub + 1, sub)
        book = _literal_subcodebook(centroids, j, sub)
        dists = F.transform(book, lambda cs: sq_l2(v_sub, cs))
        code_j = (F.array_position(dists, F.array_min(dists))).cast("int")
        codes.append(code_j - 1)  # 0-based stored code
        recon_parts.append(F.element_at(book, code_j))
    return df.withColumn("pq_code", F.array(*codes)).withColumn(
        "__recon", F.flatten(F.array(*recon_parts))
    )


def pq_topk(
    queries: DataFrame,
    encoded: DataFrame,
    k: int,
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k: score each query against the reconstructions
    (corpus scanned in place, tiny query set broadcast by the cross
    join - the brute-force shape over the 64x-smaller
    representation) and keep the k nearest by approximate L2."""
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    scored = (
        encoded.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("qid"))
        .withColumn("approx_l2", sq_l2(F.col("qv"), F.col("__recon")))
    )
    ranked = top_k_per_group(
        scored, ["qid"], [F.col("approx_l2").asc(), F.col(id_col).asc()], k
    )
    return ranked.select(
        "qid",
        F.col(id_col).alias("neighbor_id"),
        "approx_l2",
        F.col("rnk").cast("int").alias("rnk"),
    )
