"""Count-min sketch and Bloom filter - the two fixed-size frequency /
membership summaries a large-scale pipeline keeps beside its corpus
(heavy-hitter monitoring over token streams; join pre-filtering the
way Spark's own runtime row-level bloom filtering works).

Both are built from md5-derived hash positions, so - like the KMV
sketch in operators/sampling.py - they are DETERMINISTIC across runs,
partitionings, and engines: DuckDB replays the exact cell/bit layout
and the estimates hash-match bit-for-bit. This is deliberate; Spark's
built-in `bloom_filter_agg` and datasketches functions are
implementation-defined binary blobs that could only ever be
rows-only-checked.

Scale shape (the whole point of a sketch): the summary is a FIXED
number of rows regardless of corpus size - ``depth * width`` CMS
cells, at most ``n_bits`` set-bit rows - so it always broadcasts.
Building is one map-side-combining aggregation over the corpus
(count/distinct of small integers - the exchange carries cell ids,
never values), and probing is a broadcast hash join against the
summary: the 100 TB pattern is "sketch in memory, stream the probes",
with zero shuffle of the probe side beyond its own regroup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_24bit(col: Column, salt: str) -> Column:
    """24-bit uniform integer from md5(salt ':' value) - the same
    hex-prefix scheme as operators/sampling.sample_hash, replayed in
    DuckDB by plans.textops._md5_24bit_sql. Distinct salts give
    independent hash functions (the d CMS rows / k bloom probes)."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), col))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("long")


def _positions(value: Column, n_hashes: int, modulus: int, salt: str) -> Column:
    """array<long> of ``n_hashes`` independent positions in
    [0, modulus) for one value."""
    return F.array(
        *[(_md5_24bit(value, f"{salt}{i}") % modulus) for i in range(n_hashes)]
    )


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int,
    width: int,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``df[value_col]`` occurrences:
    every occurrence increments one cell per hash row, and a cell is
    (r, c, ct). Returns at most ``depth * width`` rows however large
    the input - the exchange carries (r, c) pairs with map-side
    combining, and the result is meant to be broadcast to probes.

    ``weight_col``: when the input is ALREADY an aggregated count
    table (value, count), pass the count column and each value
    increments its cells by that weight - sum(ct) per cell is then
    bit-identical to counting the raw occurrence rows (integer
    addition is associative/commutative), at vocabulary-sized work
    instead of corpus-sized (r17: cms_token_heavy_hitters folds its
    sketch from the exact count table it already computes, deleting
    a whole corpus explode).

    ``width`` must be <= 2**24 (positions come from 24-bit hashes);
    estimates are upward-biased by collisions, never downward - the
    classic CMS guarantee, pinned in tests."""
    if not (0 < depth <= 16):
        raise ValueError(f"depth must be in 1..16, got {depth}")
    if not (0 < width <= 1 << 24):
        raise ValueError(f"width must be in 1..2^24, got {width}")
    v = F.col(value_col).cast("string")
    if weight_col is None:
        cells = df.select(
            F.posexplode(_positions(v, depth, width, salt)).alias("r", "c")
        )
        return cells.groupBy("r", "c").agg(F.count(F.lit(1)).alias("ct"))
    cells = df.select(
        F.col(weight_col).cast("long").alias("__w"),
        F.posexplode(_positions(v, depth, width, salt)).alias("r", "c"),
    )
    return cells.groupBy("r", "c").agg(F.sum("__w").alias("ct"))


def cms_estimate(
    probes: DataFrame,
    value_col: str,
    cells: DataFrame,
    depth: int,
    width: int,
    salt: str = "cms",
) -> DataFrame:
    """Estimate each probe value's occurrence count from a
    :func:`cms_build` sketch: min over the value's ``depth`` cells
    (an absent cell is 0 - nothing ever hashed there). The sketch
    side is broadcast; the probe side regroups on the probe value
    only. Returns (value_col, cms_ct)."""
    v = F.col(value_col).cast("string")
    pr = probes.select(
        F.col(value_col),
        F.posexplode(_positions(v, depth, width, salt)).alias("r", "c"),
    )
    joined = pr.join(F.broadcast(cells), ["r", "c"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("ct"), F.lit(0).cast("long"))).alias("cms_ct")
    )


def bloom_build(
    df: DataFrame, key_col: str, n_bits: int, n_hashes: int, salt: str = "bloom"
) -> DataFrame:
    """Build a Bloom filter over the distinct keys of ``df``: each key
    sets ``n_hashes`` bit positions; the filter is the DISTINCT set of
    set positions - at most ``n_bits`` rows, one BIGINT column
    ``bit``. Relational on purpose: a bit-position table broadcasts
    and joins (how Spark's runtime row-level filtering ships its
    blooms), needs no binary blob format, and replays exactly in
    SQL."""
    if not (0 < n_bits <= 1 << 24):
        raise ValueError(f"n_bits must be in 1..2^24, got {n_bits}")
    if not (0 < n_hashes <= 16):
        raise ValueError(f"n_hashes must be in 1..16, got {n_hashes}")
    key = F.col(key_col).cast("string")
    return (
        df.select(F.explode(_positions(key, n_hashes, n_bits, salt)).alias("bit"))
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    key_col: str,
    bits: DataFrame,
    n_bits: int,
    n_hashes: int,
    salt: str = "bloom",
) -> DataFrame:
    """Membership-test each probe key against a :func:`bloom_build`
    filter: member iff ALL of its positions are set. No false
    negatives ever (a built key's positions are all present by
    construction); false positives at the standard
    (1 - e^(-kn/m))^k rate - both properties pinned in tests.
    Returns (key_col, bloom_member: boolean). The bits side is
    broadcast; keys whose ``n_hashes`` positions collide still probe
    correctly (duplicate rows all hit or all miss together)."""
    key = F.col(key_col).cast("string")
    pr = probes.select(
        F.col(key_col),
        F.explode(_positions(key, n_hashes, n_bits, salt)).alias("bit"),
    )
    marked = bits.select("bit", F.lit(1).alias("__hit"))
    joined = pr.join(F.broadcast(marked), "bit", "left")
    return joined.groupBy(key_col).agg(
        F.min(F.col("__hit").isNotNull()).alias("bloom_member")
    )
