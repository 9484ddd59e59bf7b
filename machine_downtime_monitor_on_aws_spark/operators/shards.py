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


def shard_key_sql(key_sql: str, n_shards: int, salt_shard: str = "shard") -> str:
    """DuckDB twin of the shard expression (for oracle SQL)."""
    return f"CAST(({sample_hash_sql(key_sql, salt_shard)}) % {n_shards} AS INT)"


def order_key_sql(key_sql: str, salt_order: str = "order") -> str:
    """DuckDB twin of the order-key expression (for oracle SQL)."""
    return f"md5('{salt_order}:' || CAST({key_sql} AS VARCHAR))"
