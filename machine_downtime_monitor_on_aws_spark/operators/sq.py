"""Scalar (uniform per-dimension) quantization for embedding ANN.

The simplest compressed-vector representation: per dimension, learn
(min, max) over the corpus, then store each component as an 8-bit
level index - float64 -> 1 byte is an 8x scan-size cut (4x vs
float32) with NO codebook training, and the decode is a single
fused multiply-add per component (SIMD-trivial on any engine). SQ is
the standard cheap tier next to PQ (Jegou/Douze/Schmid, TPAMI 2011
discuss uniform quantizers as the baseline PQ improves on; FAISS
ships it as ScalarQuantizer): lower compression than PQ at equal
distortion, but zero training cost and exact per-dimension bounds,
which also makes it the usual format for the RERANK tier of a
two-stage pipeline (coarse PQ shortlist -> SQ or raw re-rank).

Scale shape: fitting is ONE hash-aggregate over the corpus whose
min/max partials combine map-side (2*dim doubles reach the driver);
encoding and asymmetric scoring are pure expression work over scan
partitions - no shuffle, no UDF, no join. Everything is
deterministic: min/max are exact selections from the stored doubles
and the (code, reconstruction) arithmetic is fixed-order IEEE, so
the catalog query ``sq_knn_top5`` carries a full hash-exact DuckDB
oracle that re-derives the quantizer from the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import lit_double_array, sq_l2
from .topk import top_k_per_group


def sq_fit_stats(
    df: DataFrame, dim: int, vec_col: str = "vec"
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) over the corpus: one aggregation job
    - posexplode to (dim, component) rows feeding a 2-expression
    grouped agg whose partials combine map-side (2*dim unrolled
    aggregate columns blow past the JIT-bytecode cliff and ran ~5x
    slower), dim summary rows collected. These are exact selections
    from the stored values (no rounding), so any engine recomputing
    them from the same table gets bit-identical quantizer
    parameters."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("__j", "__x"))
        .groupBy("__j")
        .agg(F.min("__x").alias("__mn"), F.max("__x").alias("__mx"))
        .collect()
    )
    if len(rows) != dim:
        raise ValueError(
            f"expected {dim} dimensions, found {len(rows)} - ragged vectors?"
        )
    out: list[tuple[float, float]] = [(0.0, 0.0)] * dim
    for r in rows:
        out[r["__j"]] = (float(r["__mn"]), float(r["__mx"]))
    return out


def _scales(
    stats: list[tuple[float, float]], levels: int
) -> list[float]:
    # (mx - mn) / (levels - 1) in one IEEE step each - the same
    # expression an oracle computes inline, so embedding the Python
    # result as a literal is bit-identical to recomputing it.
    return [(mx - mn) / float(levels - 1) for mn, mx in stats]


def sq_encode(
    df: DataFrame,
    stats: list[tuple[float, float]],
    vec_col: str = "vec",
    code_col: str = "sq_code",
    levels: int = 256,
) -> DataFrame:
    """Add ``code_col``: array<int> of per-dimension level indices in
    [0, levels-1]. code = clamp(floor((v - mn) / scale + 0.5)) with
    scale = (mx - mn)/(levels - 1); a constant dimension (mx == mn)
    encodes as 0. The expression is per-row scan work - codes are
    what a 100 TB corpus persists (1 byte/dim at levels<=256).

    Shape note: the quantizer params ride as two ARRAY literals
    consumed by zip_with lambdas (three expressions total), not
    per-dimension unrolled columns - at dim=64 the unrolled form
    spent >1 s per call just building ~600 expression nodes over
    py4j and bloated the plan toward the JIT-bytecode cliff; the
    arithmetic per element is IEEE-identical either way (and the
    oracle parity run pins it)."""
    mns = lit_double_array([mn for mn, _mx in stats])
    scales = lit_double_array(_scales(stats, levels))
    lvl = levels - 1
    shifted = F.zip_with(F.col(vec_col), mns, lambda x, m: x - m)
    codes = F.zip_with(
        shifted,
        scales,
        lambda d, s: F.when(s <= F.lit(0.0), F.lit(0)).otherwise(
            F.least(
                F.lit(lvl),
                F.greatest(
                    F.lit(0), F.floor(d / s + F.lit(0.5)).cast("int")
                ),
            )
        ),
    )
    return df.withColumn(code_col, codes)


def sq_recon(
    stats: list[tuple[float, float]],
    code_col: str = "sq_code",
    levels: int = 256,
) -> Column:
    """Decode expression: component j reconstructs as
    mn_j + code_j * scale_j - one multiply-add per dimension, the
    representation asymmetric-distance scoring compares raw queries
    against. Same zip_with-over-array-literal shape as sq_encode
    (same plan-size/py4j rationale), same IEEE step order as the
    unrolled form: (code * scale) then + mn."""
    mns = lit_double_array([mn for mn, _mx in stats])
    scales = lit_double_array(_scales(stats, levels))
    scaled = F.zip_with(
        F.col(code_col), scales, lambda c, s: c.cast("double") * s
    )
    return F.zip_with(scaled, mns, lambda t, m: m + t)


def sq_topk(
    queries: DataFrame,
    df: DataFrame,
    stats: list[tuple[float, float]],
    k: int,
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
    id_col: str = "vec_id",
    vec_col: str = "vec",
    levels: int = 256,
) -> DataFrame:
    """Asymmetric top-k over the quantized corpus: encode, decode to
    the reconstruction, score raw queries against it with the exact
    left-fold sqL2, rank per query (ties to the smaller neighbor
    id). The tiny query set broadcasts; the corpus is scanned in
    place over its 8x-smaller stored form - the brute shape whose
    scale story is the representation, and which composes with an
    IVF/LSH candidate cut exactly like the PQ scorer."""
    enc = sq_encode(df, stats, vec_col=vec_col, levels=levels).withColumn(
        "__recon", sq_recon(stats, levels=levels)
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    scored = (
        enc.crossJoin(F.broadcast(q))
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


def sq_topk_rerank(
    queries: DataFrame,
    df: DataFrame,
    stats: list[tuple[float, float]],
    k: int,
    shortlist: int,
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
    id_col: str = "vec_id",
    vec_col: str = "vec",
    levels: int = 256,
) -> DataFrame:
    """Two-stage retrieval over the SQ tier (the
    search_ivfpq_index_rerank shape with SQ as the compressed stage):
    stage 1 shortlists ``shortlist`` >= k candidates per query by
    asymmetric L2 over the 8x-smaller quantized form; stage 2
    re-ranks ONLY that sliver by exact squared L2 against the raw
    vectors (broadcast of queries x shortlist rows against the
    source scan). Exact distances on a bounded set, compressed scan
    over the corpus - returns (qid, neighbor_id, sq_dist, rnk) with
    ranks that equal brute force whenever the true top-k survives
    the shortlist (test-pinned)."""
    if shortlist < k:
        raise ValueError(f"shortlist={shortlist} must be >= k={k}")
    cand = sq_topk(
        queries, df, stats, shortlist,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
        id_col=id_col, vec_col=vec_col, levels=levels,
    ).select("qid", "neighbor_id")
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    cand_q = cand.join(q, "qid")
    src = df.select(
        F.col(id_col).alias("__sid"), F.col(vec_col).alias("__sv")
    )
    exact = src.join(
        F.broadcast(cand_q), F.col("__sid") == F.col("neighbor_id")
    ).withColumn("sq_dist", sq_l2(F.col("qv"), F.col("__sv")))
    ranked = top_k_per_group(
        exact, ["qid"], [F.col("sq_dist").asc(), F.col("neighbor_id").asc()], k
    )
    return ranked.select(
        "qid", "neighbor_id", "sq_dist", F.col("rnk").cast("int").alias("rnk")
    )
