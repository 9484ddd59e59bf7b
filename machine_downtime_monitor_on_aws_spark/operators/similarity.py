"""Approximate / exact nearest-neighbor search over embedding columns.

Extension surface per BASELINE.json's north star. Two tiers:

- brute-force cosine top-k: the correctness baseline; a broadcast of
  the (small) query set against the full corpus, per-partition local
  scoring, then a per-query top-k window - no all-pairs shuffle;
- sign-LSH bucketed near-dup: random-hyperplane signatures bucket the
  corpus; only intra-bucket pairs are scored. At 100 TB the bucket
  join replaces the quadratic cross product, and bucket skew is
  handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, hyperplanes, l2_norm, sign_bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    dim: int | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query (excluding self-matches by id).

    ``queries`` is broadcast; ranking is fully deterministic
    (cosine desc, neighbor id asc). ``parallelism`` repartitions the
    corpus before scoring - with a broadcast join the stream side's
    partitioning governs task count, and a corpus arriving in few
    input splits would otherwise score on a fraction of the cores.
    """
    # Precompute norms per side: higher-order folds are interpreted
    # (not codegen'd), so computing |q| and |v| inside the pair loop
    # triples the work. Same doubles - each norm is the same fold,
    # just evaluated once per vector instead of once per pair.
    corpus_n = corpus.withColumn("__vnorm", l2_norm(vec_col, dim))
    if parallelism:
        corpus_n = corpus_n.repartition(parallelism)
    queries_n = queries.withColumn("__qnorm", l2_norm(query_vec_col, dim))
    scored = (
        corpus_n.crossJoin(F.broadcast(queries_n))
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine_sim",
            dot(query_vec_col, vec_col, dim)
            / (F.col("__qnorm") * F.col("__vnorm")),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col(query_id_col).alias("qid"),
            F.col(id_col).alias("neighbor_id"),
            F.col("cosine_sim"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def lsh_buckets(
    df: DataFrame,
    num_planes: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, bucket) sign-LSH assignment."""
    planes = hyperplanes(num_planes, dim)
    return df.select(
        F.col(id_col), F.col(vec_col), sign_bucket(vec_col, planes).alias("bucket")
    )


def lsh_neardup_pairs(
    df: DataFrame,
    threshold: float,
    num_planes: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    parallelism: int | None = None,
) -> DataFrame:
    """Intra-bucket pairs with exact cosine >= threshold.

    Approximate by construction: pairs split across buckets are
    missed - the standard LSH recall trade, tuned via num_planes.

    ``parallelism`` repartitions the probe side before the pair
    expansion: the build side broadcasts, so the probe side's
    partitioning is what spreads the quadratic in-bucket scoring
    across cores (a corpus in one input split would otherwise rescore
    every candidate pair in a single task).
    """
    b = lsh_buckets(df, num_planes, dim, id_col, vec_col).withColumn(
        "__norm", l2_norm(vec_col, dim)
    )
    a = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("v_a"),
        F.col("__norm").alias("n_a"),
    )
    if parallelism:
        a = a.repartition(parallelism)
    c = b.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("v_b"),
        F.col("__norm").alias("n_b"),
    )
    pairs = a.join(c, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn(
            "cosine_sim",
            dot("v_a", "v_b", dim) / (F.col("n_a") * F.col("n_b")),
        )
        .filter(F.col("cosine_sim") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine_sim")
    )
