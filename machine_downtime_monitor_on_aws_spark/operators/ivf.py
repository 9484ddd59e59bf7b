"""Persisted IVF (inverted-file) ANN index.

The catalog's ``ivf_knn_top5`` builds its inverted lists inline per
query (oracle-checked); a production corpus builds the index ONCE and
serves many queries from it. This module is that lifecycle:

- :func:`build_ivf_index` writes ``<path>/centroids`` (tiny parquet)
  and ``<path>/corpus`` parquet **partitioned by list_id**;
- :func:`search_ivf_index` broadcasts the centroid table, picks each
  query's top-P lists, and reads ONLY those partitions - the probe
  predicate is a partition filter, so a search over a 100 TB corpus
  scans P/C of it (verified by a plan test on PartitionFilters).

Centroids are the deterministic first-C vectors by id (same scheme as
the oracle-checked inline query; swap in ML KMeans centroids by
passing ``centroids=`` without changing the read path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import dot, l2_norm
from .topk import top_k_per_group


def _nearest(
    side: DataFrame,
    cents: DataFrame,
    vec_col: str,
    norm_col: str,
    key_cols: list[str],
    dim: int,
    top: int,
) -> DataFrame:
    sim = dot(vec_col, "cv", dim) / (F.col(norm_col) * F.col("__cn"))
    return top_k_per_group(
        side.crossJoin(F.broadcast(cents)).withColumn("__sim", sim),
        key_cols,
        [F.col("__sim").desc(), F.col("cid").asc()],
        top,
    )


def build_ivf_index(
    df: DataFrame,
    path: str,
    n_centroids: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    centroids: DataFrame | None = None,
) -> None:
    """Write the index: ``centroids`` (cid, cv) + ``corpus`` rows
    (id, vec, norm) partitioned by their nearest centroid's list_id.

    One broadcast join + one partitioned write; the corpus shuffles
    once (into list partitions). Norms are precomputed - queries never
    recompute corpus-side norms."""
    e = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).withColumn("__n", l2_norm("vec", dim))
    # explicit None test: DataFrame truthiness is undefined surface
    # (pandas-on-Spark raises on __bool__; classic API may follow)
    if centroids is None:
        centroids = e.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cid"), F.col("vec").alias("cv")
        )
    cents = centroids
    cents = cents.withColumn("__cn", l2_norm("cv", dim))
    cents.select("cid", "cv").write.mode("overwrite").parquet(f"{path}/centroids")
    assign = _nearest(e, cents, "vec", "__n", ["vec_id"], dim, 1).select(
        "vec_id", "vec", F.col("__n").alias("norm"), F.col("cid").alias("list_id")
    )
    assign.write.mode("overwrite").partitionBy("list_id").parquet(f"{path}/corpus")


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> None:
    """Add a batch of new vectors to an existing index WITHOUT
    rebuilding: assign each vector against the persisted centroid
    table (broadcast join) and append into the corpus' ``list_id``
    partitions. O(batch), never O(corpus) - the steady-state
    operation of a continuously-ingesting embedding store.

    Centroids stay fixed, which is standard IVF practice: assignment
    must stay consistent with what searches probe. A drifting corpus
    therefore skews list sizes until probes scan most of the data -
    audit with :func:`ivf_list_stats` (and ``ivf_recall_at5`` for the
    recall signal) and let :func:`rebalance_ivf_index_if_needed`
    retrain past the skew bound."""
    spark = df.sparkSession
    cents = spark.read.parquet(f"{path}/centroids").withColumn(
        "__cn", l2_norm("cv", dim)
    )
    e = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).withColumn("__n", l2_norm("vec", dim))
    assign = _nearest(e, cents, "vec", "__n", ["vec_id"], dim, 1).select(
        "vec_id", "vec", F.col("__n").alias("norm"), F.col("cid").alias("list_id")
    )
    assign.write.mode("append").partitionBy("list_id").parquet(f"{path}/corpus")


def build_ivfpq_index(
    df: DataFrame,
    path: str,
    n_centroids: int,
    dim: int,
    m: int,
    pq_centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "vec",
    centroids: DataFrame | None = None,
) -> None:
    """IVF-PQ: the standard composition - coarse inverted lists for
    pruning, product-quantization codes for compression. The corpus
    partition stores ``(vec_id, pq_code, list_id)`` and NOT the raw
    vector: at 100 TB of float64 embeddings that is the difference
    between an index that fits (64x smaller at dim=64/m=8) and one
    that is just a copy of the data. Assignment + encoding are one
    pass over the corpus (broadcast coarse centroids, literal PQ
    codebooks), one partitioned write.

    ``pq_centroids`` are full-dim codebook vectors (K entries; the
    per-subspace books are their slices) - hash-sample them from the
    corpus (operators/pq docstring) or pass k-means centroids."""
    from .pq import pq_encode_reconstruct

    e = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).withColumn("__n", l2_norm("vec", dim))
    if centroids is None:
        centroids = e.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cid"), F.col("vec").alias("cv")
        )
    cents = centroids.withColumn("__cn", l2_norm("cv", dim))
    cents.select("cid", "cv").write.mode("overwrite").parquet(f"{path}/centroids")
    assign = _nearest(e, cents, "vec", "__n", ["vec_id"], dim, 1).select(
        "vec_id", "vec", F.col("cid").alias("list_id")
    )
    encoded = pq_encode_reconstruct(assign, pq_centroids, dim, m)
    encoded.select("vec_id", "pq_code", "list_id").write.mode(
        "overwrite"
    ).partitionBy("list_id").parquet(f"{path}/corpus")


def search_ivfpq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    n_probes: int,
    dim: int,
    m: int,
    pq_centroids: list[list[float]],
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """ADC search over an IVF-PQ index: probe each query's top-P
    lists (partition-pruned scan, same I/O story as
    :func:`search_ivf_index`), reconstruct candidates from their
    codes against the literal codebooks, rank by approximate squared
    L2 (= sum of subspace distances - the ADC identity). The scan
    reads M-byte codes, never vectors: probe I/O shrinks by the same
    64x the index did. Returns (qid, neighbor_id, approx_l2, rnk)."""
    from ..functions.vectors import sq_l2
    from .pq import _literal_subcodebook

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    cents = spark.read.parquet(f"{path}/centroids").withColumn(
        "__cn", l2_norm("cv", dim)
    )
    corpus = spark.read.parquet(f"{path}/corpus")
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    ).withColumn("__qn", l2_norm("qv", dim))
    probe = _nearest(q, cents, "qv", "__qn", ["qid"], dim, n_probes).select(
        "qid", "qv", F.col("cid").alias("list_id")
    )
    recon = F.flatten(
        F.array(
            *[
                F.element_at(
                    _literal_subcodebook(pq_centroids, j, sub),
                    F.element_at(F.col("pq_code"), j + 1) + 1,
                )
                for j in range(m)
            ]
        )
    )
    scored = (
        corpus.join(F.broadcast(probe), "list_id")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("approx_l2", sq_l2(F.col("qv"), recon))
    )
    ranked = top_k_per_group(
        scored, ["qid"], [F.col("approx_l2").asc(), F.col("vec_id").asc()], k
    )
    return ranked.select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        "approx_l2",
        F.col("rnk").cast("int").alias("rnk"),
    )


def ivf_list_stats(spark: SparkSession, path: str) -> dict:
    """List-size audit (r5 verdict item #4): ``append_to_ivf_index``
    assigns against FROZEN centroids, so a drifting corpus piles new
    vectors into few lists until probes scan most of the data -
    search cost is proportional to probed-list share, so
    ``max_list_share`` IS the degradation metric. One aggregation
    over the partition column (list_id comes from directory names -
    no vector data is read). Collected output is bounded by
    n_centroids, never by corpus size."""
    sizes = {
        r.list_id: r.n
        for r in spark.read.parquet(f"{path}/corpus")
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(sizes.values())
    return {
        "n_lists": len(sizes),
        "n_vectors": total,
        "max_list_size": max(sizes.values(), default=0),
        "max_list_share": (max(sizes.values(), default=0) / total) if total else 0.0,
        "list_sizes": sizes,
    }


def sampled_centroids(
    df: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Deterministic uniform centroid sample from the CURRENT corpus:
    the ``n_centroids`` vectors with the smallest
    ``xxhash64(vec_id)`` (id tiebreak). Hash order is uniform over
    the corpus regardless of how ids drifted, so rebuilt centroids
    cover new regions - unlike build's first-C-ids bootstrap scheme,
    which a drifting corpus leaves behind. orderBy+limit plans as a
    per-partition top-k merge (TakeOrdered), not a global sort."""
    return (
        df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy(F.xxhash64(F.col("cid").cast("string")), F.col("cid"))
        .limit(n_centroids)
    )


def rebuild_ivf_index(
    spark: SparkSession,
    path: str,
    n_centroids: int,
    dim: int,
    centroids: DataFrame | None = None,
) -> None:
    """Retrain the index from its own current contents: fresh
    centroids (hash-sampled from the live corpus by default - drift
    participates), full reassignment, move-aside swap.

    This is the REBUILD arm of split-or-rebuild maintenance. A
    per-list split pass would rewrite only oversized partitions
    (O(skewed lists) instead of O(corpus)) but needs a transaction
    log to keep centroids and partitions consistent across a crash;
    without a table format the atomic unit is the directory swap, so
    the dependency-free realization rebuilds - gated by
    :func:`rebalance_ivf_index_if_needed` so the O(corpus) cost is
    paid only when skew actually crossed the line. Crash mid-swap
    leaves both copies on disk (recoverable), never a half-updated
    index."""
    from .. import fsio

    corpus = spark.read.parquet(f"{path}/corpus").select("vec_id", "vec")
    cents = centroids if centroids is not None else sampled_centroids(
        corpus, n_centroids
    )
    # localCheckpoint both: the rebuild reads the path it will replace,
    # and the swap must not leave a plan re-reading moved directories
    corpus = corpus.localCheckpoint(eager=True)
    cents = cents.localCheckpoint(eager=True)
    tmp = path.rstrip("/") + "__rebuilding"
    fsio.delete(spark, tmp)
    build_ivf_index(corpus, tmp, n_centroids, dim, centroids=cents)
    old = path.rstrip("/") + "__old"
    if not fsio.rename(spark, path, old):
        raise OSError(f"rebuild_ivf_index: could not move {path} aside")
    if not fsio.rename(spark, tmp, path):
        raise OSError(f"rebuild_ivf_index: could not publish {tmp}")
    fsio.delete(spark, old)


def rebalance_ivf_index_if_needed(
    spark: SparkSession,
    path: str,
    n_centroids: int,
    dim: int,
    max_list_share: float = 0.10,
) -> bool:
    """Skew gate for sustained appends: when the largest inverted
    list holds more than ``max_list_share`` of the corpus, probing it
    approaches a scan and recall/latency targets silently die -
    rebuild with fresh centroids. The audit is one bounded
    aggregation per call (cheap after every append batch); the
    rebuild it gates is O(corpus), amortized by the threshold.
    Returns True when a rebuild ran."""
    stats = ivf_list_stats(spark, path)
    if stats["n_vectors"] == 0 or stats["max_list_share"] <= max_list_share:
        return False
    rebuild_ivf_index(spark, path, n_centroids, dim)
    return True


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    n_probes: int,
    dim: int,
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Top-k cosine neighbors per query, probing each query's top-P
    inverted lists.

    The probed list ids land in an ``isin``-style join predicate on
    the corpus' ``list_id`` PARTITION column, so the parquet scan
    prunes to P lists per query batch - the I/O story that makes IVF
    an index rather than a re-bucketing."""
    cents = spark.read.parquet(f"{path}/centroids").withColumn(
        "__cn", l2_norm("cv", dim)
    )
    corpus = spark.read.parquet(f"{path}/corpus")
    q = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("qv")
    ).withColumn("__qn", l2_norm("qv", dim))
    probe = _nearest(q, cents, "qv", "__qn", ["qid"], dim, n_probes).select(
        "qid", "qv", "__qn", F.col("cid").alias("list_id")
    )
    # Partition pruning: the probed-list set is tiny (queries x P) ->
    # broadcast side of the join; DPP/AQE prunes corpus partitions to
    # exactly the probed lists.
    pair_sim = dot("qv", "vec", dim) / (F.col("__qn") * F.col("norm"))
    scored = (
        corpus.join(F.broadcast(probe), "list_id")
        .filter(F.col("vec_id") != F.col("qid"))
        .withColumn("cosine_sim", pair_sim)
    )
    ranked = top_k_per_group(
        scored, ["qid"], [F.col("cosine_sim").desc(), F.col("vec_id").asc()], k
    )
    return ranked.select(
        "qid",
        F.col("vec_id").alias("neighbor_id"),
        "cosine_sim",
        F.col("rnk").cast("int").alias("rnk"),
    )
