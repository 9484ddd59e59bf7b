"""Binary sign quantization for embedding ANN (1 bit per dimension).

The cheapest point on the compressed-vector curve below SQ/PQ/OPQ
(operators/sq.py, pq.py, opq.py): threshold each dimension at its
corpus mean and keep only the sign, packing 32 dimensions per 64-bit
word - float64 -> 1/64th the bytes, and candidate scoring collapses
to XOR + popcount over packed integers (Charikar, STOC 2002: Hamming
distance between sign vectors estimates angular distance; FAISS
ships the same idea as the ``LSH``/binary index family). Like the
other compressed tiers it is a SHORTLIST representation: stage 1
scans the 1-bit codes and keeps ``shortlist`` candidates per query
by Hamming distance, stage 2 re-ranks only that sliver by exact
squared L2 over the raw vectors (the search_ivfpq_index_rerank
shape, `ivfpq_rerank_top5`'s contract).

Determinism / oracle story: thresholds are quantized-integer means
(BIGINT sums of floor(v*1e9+0.5) - partition-order independent,
map-side combining), bits are exact `>` comparisons, packed words
are integer arithmetic, Hamming is integer popcount, and the re-rank
distance is the shared left-fold sqL2 - every step re-derivable
relationally, so the catalog query carries a full hash-exact DuckDB
oracle (bit_count(xor(...)) over the same packed BIGINTs).

Scale shape: fit is ONE aggregation whose partials combine map-side
(dim BIGINTs reach the driver); encoding is pure scan expression;
stage 1 broadcasts only the query codes and never shuffles the
corpus (per-query top-k via the bounded window); stage 2 touches
queries x shortlist rows. At 100 TB the persisted artifact is the
packed code column - 8 bytes per 64-dim vector.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import lit_double_array, lit_long_array, sq_l2
from .topk import top_k_per_group

_WORD = 32  # bits packed per BIGINT word: keeps every word in
# [0, 2^32) so shifts/xor/popcount never touch the sign bit in
# either engine, and the packing lambda stays overflow-free.


def signq_fit_thresholds(
    df: DataFrame, dim: int, vec_col: str = "vec"
) -> list[float]:
    """Per-dimension corpus mean as the sign threshold: one
    aggregation of quantized 1e-9 integer partials (the k-means /
    drift-monitor scheme - BIGINT sums are partition-order
    independent and combine map-side), then mean =
    float(sum)/1e9/float(n) in the same IEEE step order the oracle's
    ``CAST(s AS DOUBLE)/1000000000.0/CAST(n AS DOUBLE)`` performs."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("__j", "__x"))
        .groupBy("__j")
        .agg(
            F.sum(
                F.floor(F.col("__x") * F.lit(1e9) + F.lit(0.5)).cast("long")
            ).alias("__s"),
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
        out[r["__j"]] = float(r["__s"]) / 1e9 / float(r["__n"])
    return out


def signq_encode(
    df: DataFrame,
    thresholds: list[float],
    vec_col: str = "vec",
    code_col: str = "signq_code",
) -> DataFrame:
    """Add ``code_col``: array<bigint> of ceil(dim/32) packed words;
    bit j of the code is 1 iff v[j] > threshold[j], stored at weight
    2^(j mod 32) inside word j//32. Thresholds ride as ONE array
    literal through zip_with (the sq_encode plan-size lesson); the
    packing is an integer dot product with a constant weight array -
    pure scan expression, no shuffle, no UDF.

    Dimension guard (r15 ADVICE): zip_with NULL-pads a short vector
    and the when().otherwise(0) would map the NULL comparisons to
    0-bits - a wrong-dim (or NULL) vector would get a
    plausible-but-wrong code whose Hamming distances silently
    poison every scan of the touched lists. An in-expression
    assert_true raises at encode time instead - fail-loudly, the
    index-params discipline applied to the row itself. The assert
    rides inside the code expression (a separate projected column
    would be pruned away) and its values/NULL-passthrough are the
    identity on every correct-dim row, so oracle bit-exactness is
    untouched."""
    dim = len(thresholds)
    n_words = (dim + _WORD - 1) // _WORD
    pad = n_words * _WORD - dim
    bits = F.zip_with(
        F.col(vec_col),
        lit_double_array(list(thresholds)),
        lambda v, t: F.when(v > t, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    if pad:
        bits = F.concat(
            bits, F.array_repeat(F.lit(0).cast("long"), pad)
        )
    weights = lit_long_array([1 << j for j in range(_WORD)])
    words = [
        F.aggregate(
            F.zip_with(
                F.slice(bits, w * _WORD + 1, _WORD), weights, lambda b, p: b * p
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        for w in range(n_words)
    ]
    guard = F.assert_true(
        F.size(F.col(vec_col)) == F.lit(dim),
        F.concat_ws(
            " ",
            F.lit("signq_encode: vector length"),
            F.size(F.col(vec_col)).cast("string"),
            F.lit(f"!= thresholds dim {dim}"),
        ),
    )
    return df.withColumn(code_col, F.when(guard.isNull(), F.array(*words)))


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount Hamming over packed word arrays:
    sum_i bit_count(a[i] XOR b[i]) - exact integer arithmetic, the
    DuckDB twin is ``list_sum(list_transform(list_zip(a, b), x ->
    bit_count(xor(x[1], x[2]))))``."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def signq_topk_rerank(
    queries: DataFrame,
    df: DataFrame,
    thresholds: list[float],
    k: int,
    shortlist: int,
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Two-stage binary ANN: stage 1 shortlists ``shortlist`` >= k
    candidates per query by Hamming distance over the packed 1-bit
    codes (ties to the smaller neighbor id); stage 2 re-ranks ONLY
    that sliver by exact squared L2 against the raw vectors. Returns
    (qid, neighbor_id, hamming, sq_dist, rnk) - Hamming kept for
    observability (it is exact integer arithmetic, so it stays
    oracle-checkable through the re-rank join).

    Plan shape: the query codes broadcast (queries are a sliver);
    the corpus scans its packed form in place; both rank cuts are
    per-query windows - no global sort, no corpus shuffle."""
    if shortlist < k:
        raise ValueError(f"shortlist={shortlist} must be >= k={k}")
    enc = signq_encode(df, thresholds, vec_col=vec_col)
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    )
    q_enc = signq_encode(q, thresholds, vec_col="qv", code_col="__qcode")
    scored = (
        enc.crossJoin(F.broadcast(q_enc))
        .filter(F.col(id_col) != F.col("qid"))
        .withColumn(
            "hamming",
            hamming_distance(F.col("__qcode"), F.col("signq_code")),
        )
    )
    cand = top_k_per_group(
        scored, ["qid"], [F.col("hamming").asc(), F.col(id_col).asc()],
        shortlist,
    ).select("qid", "qv", F.col(id_col).alias("neighbor_id"), "hamming")
    src = df.select(
        F.col(id_col).alias("__sid"), F.col(vec_col).alias("__sv")
    )
    exact = src.join(
        F.broadcast(cand), F.col("__sid") == F.col("neighbor_id")
    ).withColumn("sq_dist", sq_l2(F.col("qv"), F.col("__sv")))
    ranked = top_k_per_group(
        exact, ["qid"], [F.col("sq_dist").asc(), F.col("neighbor_id").asc()], k
    )
    return ranked.select(
        "qid",
        "neighbor_id",
        "hamming",
        "sq_dist",
        F.col("rnk").cast("int").alias("rnk"),
    )
