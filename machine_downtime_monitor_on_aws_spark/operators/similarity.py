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

from ..functions.vectors import cosine, hyperplanes, sign_bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k per query (excluding self-matches by id).

    ``queries`` is broadcast; ranking is fully deterministic
    (cosine desc, neighbor id asc).
    """
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cosine_sim", cosine(F.col(query_vec_col), F.col(vec_col)))
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
        F.col(id_col), F.col(vec_col), sign_bucket(F.col(vec_col), planes).alias("bucket")
    )


def lsh_neardup_pairs(
    df: DataFrame,
    threshold: float,
    num_planes: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Intra-bucket pairs with exact cosine >= threshold.

    Approximate by construction: pairs split across buckets are
    missed - the standard LSH recall trade, tuned via num_planes.
    """
    b = lsh_buckets(df, num_planes, dim, id_col, vec_col)
    a = b.select(
        F.col("bucket"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    )
    c = b.select(
        F.col("bucket"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")
    )
    pairs = a.join(c, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine_sim", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cosine_sim") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine_sim")
    )
