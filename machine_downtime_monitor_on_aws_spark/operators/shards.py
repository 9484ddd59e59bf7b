"""Deterministic training-order shuffle + shard assignment.

The last step of dataset assembly (after quality filter -> dedup ->
mixture sampling -> sequence packing, operators/sampling.py): give
every packed training sequence a reproducible (shard, position) so N
data-loader workers can each read one shard file in a fixed order and
the global example order is a pure function of (corpus, salt) - the
"deterministic data order" contract training reproducibility depends
on (epoch N re-runs byte-identically; an elastic restart resumes at
the exact step).

Design: a salted md5 over the sequence key drives BOTH decisions -
``shard = h(salt_shard:key) mod n_shards`` spreads sequences evenly,
and ``order_key = md5(salt_order:key)`` is the shuffle (sorting by a
cryptographic hash of the key IS a uniform random permutation,
re-derivable by any engine - no RNG state, no seed files). Position
is a per-shard row_number, NEVER a global one: a total training
order is by definition a sort, so the operator shards first and
sorts each shard independently - n_shards bounded windows instead of
the global sort the reference's QuickSight layer used
(create-quicksight.ts:20, designed out repo-wide). Changing the salt
re-shuffles; changing n_shards re-balances; both stay deterministic.

Scale shape: shard/order_key are scan expressions (md5 of short
keys); the only exchange is the per-shard window's hash partition.
Each shard's sort is 1/n_shards of the manifest - and the manifest
rows are key + counters, never text/tokens, so at 100 TB this sorts
the (corpus_tokens / pack_budget)-row pack table, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import sample_hash, sample_hash_sql


def assign_training_shards(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int,
    salt_shard: str = "shard",
    salt_order: str = "order",
) -> DataFrame:
    """Add (shard, order_key, position) to ``df``: shard =
    salted-hash of the '|'-joined key columns mod ``n_shards``,
    order_key = md5('<salt_order>:<key>') (the deterministic
    shuffle), position = row_number within shard ordered by
    (order_key, key) - md5 collisions are astronomically unlikely,
    but the key tiebreak keeps the order a total function anyway.

    n_shards should divide sample_hash's 10000-bucket range (any
    power of 2 up to 16, or 5/10/25/...) so the mod is unbiased."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    out = df.withColumn(
        "shard", (sample_hash(key, salt_shard) % n_shards).cast("int")
    ).withColumn(
        "order_key", F.md5(F.concat(F.lit(f"{salt_order}:"), key))
    )
    w = Window.partitionBy("shard").orderBy(
        "order_key", *[F.col(c) for c in key_cols]
    )
    return out.withColumn(
        "position", F.row_number().over(w).cast("int")
    )


def assign_balanced_shards(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    n_shards: int,
    salt_order: str = "order",
    bucket_hex: int = 2,
) -> DataFrame:
    """Length-balanced deterministic shard assignment: add
    (shard, order_key, position) to ``df`` such that every shard
    carries the same TOTAL ``weight_col`` to within a corpus-size-
    independent constant - the loader step-time-variance bound hash
    assignment cannot give (hash spreads COUNTS evenly; its weight
    imbalance grows as sqrt(N) * max_weight).

    Scheme: stratified round-robin. Items stratify by their exact
    integer weight; within a stratum, items order by the salted-md5
    order_key (the deterministic shuffle - same coin as
    :func:`assign_training_shards`) and the item of stratum rank r
    goes to shard (r - 1) mod n_shards. Within each stratum the
    per-shard item counts differ by at most 1, so the weight gap
    contributed by stratum w is at most w - summed over strata the
    total gap between ANY two shards is bounded by
    sum(distinct weights), a constant independent of corpus size
    (the bin-packing-quality theorem the tests pin empirically
    against hash assignment).

    The stratum rank needs a total order WITHOUT a global sort (the
    repo-wide no-SinglePartition discipline): the first
    ``bucket_hex`` hex chars of order_key split each stratum into
    16^bucket_hex hash buckets; per-(weight, bucket) counts fold to
    a tiny table (strata x buckets); a window over THAT table turns
    counts into per-bucket base offsets; offsets broadcast back and
    rank = base + row_number within (weight, bucket). Because the
    bucket is a PREFIX of order_key, (bucket, order_key) ordering IS
    order_key ordering, so the distributed rank equals the oracle's
    single-window rank exactly.

    Scale shape: two scan expressions, ONE map-side-combining count
    to the strata x buckets sliver, a window over that sliver
    (partitioned by weight, never SinglePartition), a broadcast join
    back, and bounded-partition windows over (weight, bucket) and
    (shard). Weights must be non-negative integers with a bounded
    domain (token counts, byte buckets) - the strata sliver is
    domain x buckets rows."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if not 1 <= bucket_hex <= 8:
        raise ValueError(f"bucket_hex must be in [1, 8], got {bucket_hex}")
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    w_guard = F.assert_true(
        F.col(weight_col).isNotNull()
        & (F.col(weight_col) >= 0)
        # non-integral weights would silently truncate in the long
        # cast below while the DuckDB oracle strata on the raw value
        # (r16 ADVICE #4) - fail loudly instead; integral types pass
        # trivially (floor(x) == x)
        & (
            F.col(weight_col).cast("double")
            == F.floor(F.col(weight_col)).cast("double")
        ),
        F.concat_ws(
            " ",
            F.lit(f"assign_balanced_shards: {weight_col}"),
            F.col(weight_col).cast("string"),
            F.lit("must be a non-negative integer"),
        ),
    )
    out = (
        df.withColumn(
            "order_key", F.md5(F.concat(F.lit(f"{salt_order}:"), key))
        )
        .withColumn(
            "__w",
            F.when(
                w_guard.isNull(), F.col(weight_col).cast("long")
            ),
        )
        .withColumn("__bkt", F.substring("order_key", 1, bucket_hex))
    )
    counts = out.groupBy("__w", "__bkt").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    off_w = Window.partitionBy("__w").orderBy("__bkt")
    offsets = counts.withColumn(
        "__base", F.sum("__cnt").over(off_w) - F.col("__cnt")
    ).select("__w", "__bkt", "__base")
    local = Window.partitionBy("__w", "__bkt").orderBy(
        "order_key", *[F.col(c) for c in key_cols]
    )
    ranked = (
        out.join(F.broadcast(offsets), ["__w", "__bkt"])
        .withColumn(
            "__rank", F.col("__base") + F.row_number().over(local)
        )
        .withColumn(
            "shard", ((F.col("__rank") - 1) % n_shards).cast("int")
        )
    )
    pos = Window.partitionBy("shard").orderBy(
        "order_key", *[F.col(c) for c in key_cols]
    )
    return (
        ranked.withColumn(
            "position", F.row_number().over(pos).cast("int")
        )
        .drop("__w", "__bkt", "__base", "__rank")
    )


def balanced_shard_sql(
    weight_sql: str,
    key_sql: str,
    n_shards: int,
    salt_order: str = "order",
) -> str:
    """DuckDB twin of the balanced shard id: the single-window form
    ((rank within weight stratum by order_key) - 1) mod n_shards -
    the distributed prefix-bucket rank equals it exactly because the
    bucket is a prefix of the rank's own sort key. Emit alongside
    {order_key_sql(...)} and a per-shard position window to mirror
    the full operator output."""
    ok = order_key_sql(key_sql, salt_order)
    return (
        f"CAST((row_number() OVER (PARTITION BY {weight_sql} "
        f"ORDER BY {ok}, {key_sql}) - 1) % {n_shards} AS INT)"
    )


def shard_key_sql(key_sql: str, n_shards: int, salt_shard: str = "shard") -> str:
    """DuckDB twin of the shard expression (for oracle SQL)."""
    return f"CAST(({sample_hash_sql(key_sql, salt_shard)}) % {n_shards} AS INT)"


def order_key_sql(key_sql: str, salt_order: str = "order") -> str:
    """DuckDB twin of the order-key expression (for oracle SQL)."""
    return f"md5('{salt_order}:' || CAST({key_sql} AS VARCHAR))"
