"""Streaming ANN index maintenance: the embedding-ingest loop.

A training-data pipeline's embedding store grows continuously (new
documents arrive embedded, edited documents re-embed their changed
chunks - the feed ``run_incremental_dedup_stream``'s chunk leg
publishes). This loop keeps a persisted IVF index current with
O(batch) work per micro-batch and EXACTLY-ONCE semantics throughout:

- **bootstrap** (first batch): coarse centroids are TRAINED on the
  batch (operators/kmeans, hash-sampled init - not the first-K
  bootstrap), the index skeleton is built epoch-partitioned, and the
  batch lands as the first epoch. params.json acts as the
  bootstrap-commit signal: a crash anywhere before it re-runs the
  whole deterministic bootstrap; after it, replays skip straight to
  the append.
- **steady state**: each micro-batch assigns against the frozen
  persisted centroids (broadcast, partial-agg argmin) and
  dynamic-overwrites its own ``(__epoch, touched lists)`` corpus
  partitions. Assignment is deterministic, so a crash-replayed epoch
  rewrites exactly the same partitions - duplicates are structurally
  impossible (a plain parquet append would at-least-once duplicate
  vectors, and duplicated corpus rows silently eat top-k slots).
- **epoch markers** (Hadoop-FS, same discipline as the dedup loop)
  make fully-committed replays no-ops and are pruned by epoch id
  parsed from the name.
- **skew gate** (optional): after each committed epoch,
  ``rebalance_ivf_index_if_needed`` retrains when drift pushed one
  list past the share bound; the rebuild preserves the epoch layout
  and doubles as epoch compaction (everything lands back in
  ``__epoch=base``), so a long-lived loop's partition count stays
  bounded.

Searches (`search_ivf_index`) read the same corpus path; the probe
predicate prunes on ``list_id`` regardless of the extra epoch level.
Search after the first committed epoch - an empty bootstrap skeleton
has no data files yet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .. import fsio
from ..operators.ivf import (
    append_to_ivf_index,
    build_ivf_index,
    read_ivf_index_params,
    rebalance_ivf_index_if_needed,
)
from .ingest import _checkpoint_sink_token


def run_incremental_ann_stream(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    n_centroids: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    train_iters: int = 2,
    rebalance_max_list_share: float | None = None,
    bootstrap_centroids: DataFrame | None = None,
    drift_smd_threshold: float | None = None,
    drift_max_dims: int = 0,
) -> StreamingQuery:
    """Start the ANN maintenance loop over a vector stream
    (``id_col`` long, ``vec_col`` array<double>). See the module
    docstring for the crash-semantics contract.

    ``bootstrap_centroids`` (cid, cv): bootstrap the index from an
    OFFLINE-trained model instead of training on the first batch -
    the standard production path when a batch pipeline already owns
    the codebook (the persisted-centroid-store discipline): the
    stream then only ever assigns + appends, and the bootstrap is
    deterministic regardless of which batch arrives first. Ignored
    once a committed index exists.

    ``drift_smd_threshold`` arms the POPULATION-drift gate
    (operators/drift.py) - the retrain signal the skew gate cannot
    see: each committed batch's per-dimension statistics are compared
    against the reference population persisted beside the index
    (``{index_path}__popstats``, OUTSIDE the index dir so rebuild
    swaps never clobber it); when more than ``drift_max_dims``
    dimensions shift past the threshold, the index retrains and the
    reference refreshes to the full post-rebuild corpus (also after a
    SKEW-triggered rebuild, so both gates agree on what "trained-on"
    means). The first population seen seeds the reference, and
    re-seeds it if the stats dir is ever lost - the gate is advisory:
    a missed check is a delayed retrain, never a wrong answer. Per
    batch this adds one O(batch) dim-row aggregation and bounded
    dim-row driver pulls."""
    spark = vec_stream.sparkSession
    token = _checkpoint_sink_token(spark, checkpoint_dir)
    marker_dir = checkpoint_dir.rstrip("/") + "/ann_epochs"
    fsio.mkdirs(spark, marker_dir)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        epoch_val = f"{token}-{epoch_id}"
        marker = f"{marker_dir}/{epoch_val}"
        if fsio.exists(spark, marker):
            return  # fully committed epoch replayed after restart
        e = batch_df.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
        )
        if not read_ivf_index_params(spark, index_path):
            # bootstrap: params.json is written LAST by build, so its
            # absence means no committed skeleton - (re-)run the
            # deterministic train+build; the batch itself lands via
            # the idempotent epoch append below, never inside build
            # (a bootstrap crash window must not double-insert it).
            # A first batch SMALLER than n_centroids trains with
            # k = batch size instead of raising (r7 advice: the raise
            # wedged the loop - the marker never commits, so every
            # restart replays the same too-small batch and fails
            # again) and instead of returning (which would silently
            # DROP the batch: foreachBatch advances the checkpoint
            # either way). Fewer lists only coarsens pruning; the
            # rebalance gate retrains to full k as the corpus grows.
            if bootstrap_centroids is not None:
                cents = bootstrap_centroids.select("cid", "cv")
            else:
                avail = e.limit(n_centroids).count()
                if avail == 0:
                    return  # nothing to train on yet
                from ..operators.kmeans import kmeans_fit_centroids_df

                cents = kmeans_fit_centroids_df(
                    e, min(n_centroids, avail), dim,
                    iters=train_iters, init="hash",
                ).select(F.col("cid"), F.col("cv"))
            build_ivf_index(
                e.limit(0), index_path, n_centroids, dim,
                centroids=cents, epoch_partitioned=True,
            )
        append_to_ivf_index(e, index_path, dim, epoch=epoch_val)
        fsio.write_text_atomic(spark, marker, epoch_val)
        # prune committed markers older than this epoch (ordering by
        # the epoch id parsed from the name, never mtime; foreign
        # lineage tokens are stale by construction)
        for old in fsio.list_names(spark, marker_dir):
            if old == epoch_val or old.endswith(".tmp") or old.startswith("."):
                continue
            old_tok, _, old_eid = old.rpartition("-")
            if old_tok != token or (old_eid.isdigit() and int(old_eid) < epoch_id):
                fsio.delete(spark, f"{marker_dir}/{old}", recursive=False)
        # maintenance AFTER the epoch committed (same placement as the
        # dedup loop's compaction): the rebuild never races its own
        # epoch's write, and a crash mid-swap leaves both copies on
        # disk rather than a half-updated index
        rebuilt = False
        if rebalance_max_list_share is not None:
            rebuilt = rebalance_ivf_index_if_needed(
                spark, index_path, n_centroids, dim,
                max_list_share=rebalance_max_list_share,
            )
        if drift_smd_threshold is not None:
            from ..operators.drift import (
                embedding_drift_stats,
                embedding_population_stats,
                population_drifted,
                read_population_stats,
                write_population_stats,
            )
            from ..operators.ivf import rebuild_ivf_index

            stats_path = index_path.rstrip("/") + "__popstats"
            # <= dim rows: the bounded-pull class (centroid fetches)
            cur_rows = embedding_population_stats(e, "vec", dim).collect()
            stats_schema = "dim int, n long, sum_q long, sumsq_q long"
            if cur_rows and not fsio.exists(
                spark, f"{stats_path}/_STORE_OK"
            ):
                write_population_stats(
                    spark,
                    spark.createDataFrame(cur_rows, stats_schema),
                    stats_path,
                )
            elif cur_rows and not rebuilt:
                report = embedding_drift_stats(
                    read_population_stats(spark, stats_path),
                    spark.createDataFrame(cur_rows, stats_schema),
                    smd_threshold=drift_smd_threshold,
                )
                if population_drifted(report, drift_max_dims):
                    rebuild_ivf_index(spark, index_path, n_centroids, dim)
                    rebuilt = True
            if rebuilt:
                # either gate retrained: the reference is now the full
                # corpus the fresh centroids were trained on
                corpus = spark.read.parquet(f"{index_path}/corpus").select(
                    "vec_id", "vec"
                )
                write_population_stats(
                    spark,
                    embedding_population_stats(corpus, "vec", dim),
                    stats_path,
                    replace=True,
                )

    return (
        vec_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
