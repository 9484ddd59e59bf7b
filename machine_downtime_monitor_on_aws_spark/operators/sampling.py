"""Deterministic sampling / corpus mixing / sequence packing.

Training-data-pipeline surface (BASELINE.json north star): dataset
assembly steps downstream of dedup + quality filtering. All three are
pure column arithmetic over an md5-derived integer, so they are
reproducible across runs AND engines (exact DuckDB oracles), and none
of them shuffles more than its output:

- sampling is a filter (no shuffle at all);
- mixing is sampling with a per-stratum rate expression;
- packing windows over hash buckets, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 24-bit integer from the first 6 hex chars of md5 - enough headroom
# that `% 10_000` rate selection is effectively unbiased (16.7M / 10k
# buckets), and cheap to reproduce in any engine with md5 + string
# ops.
_HASH_MOD = 10_000


def sample_hash(id_col: Column, salt: str) -> Column:
    """Uniform [0, 10000) integer from md5(salt ':' id). Salting makes
    independent sampling decisions independent: reusing one hash for
    two different sample steps would correlate them."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % _HASH_MOD


def sample_hash_sql(id_sql: str, salt: str) -> str:
    """DuckDB twin of :func:`sample_hash` (no conv() in DuckDB: the
    24-bit value is rebuilt from hex digits positionally, the same
    instr trick as the simhash oracle)."""
    md5 = f"md5('{salt}:' || CAST({id_sql} AS VARCHAR))"
    terms = " + ".join(
        f"(instr('0123456789abcdef', substring({md5}, {j + 1}, 1)) - 1) * {16 ** (5 - j)}"
        for j in range(6)
    )
    return f"(({terms}) % {_HASH_MOD})"


def deterministic_sample(
    df: DataFrame, id_col: str, rate_pct: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~rate_pct% of rows, chosen by id hash: reproducible across
    runs, partitionings, and engines (unlike ``df.sample``, whose
    output depends on partition layout). Pure filter - pushes to the
    scan, no shuffle, trivially 100 TB-safe."""
    if not 0 <= rate_pct <= 100:
        raise ValueError(f"rate_pct must be in [0, 100], got {rate_pct}")
    return df.filter(sample_hash(F.col(id_col), salt) < int(rate_pct * 100))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates_pct: dict[str, float],
    default_pct: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Corpus mixing: per-stratum keep rates (e.g. web 25%, wiki 100%)
    applied as one hash-threshold filter. The rate lookup is a CASE
    expression (strata sets are config-sized), so the whole mix is a
    scan-level filter with zero joins and zero shuffles."""
    for value, pct in rates_pct.items():
        if not 0 <= pct <= 100:
            raise ValueError(f"rate for {value!r} must be in [0, 100], got {pct}")
    rate = F.lit(int(default_pct * 100))
    for value, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == value, int(pct * 100)).otherwise(rate)
    return df.filter(sample_hash(F.col(id_col), salt) < rate)


def stratified_rate_sql(
    strata_sql: str, rates_pct: dict[str, float], default_pct: float = 0.0
) -> str:
    """DuckDB CASE expression matching :func:`stratified_sample`'s
    rate lookup, generated from the same dict so they cannot drift."""
    whens = " ".join(
        "WHEN {} = '{}' THEN {}".format(
            strata_sql, str(v).replace("'", "''"), int(p * 100)
        )
        for v, p in sorted(rates_pct.items(), reverse=True)
    )
    return f"(CASE {whens} ELSE {int(default_pct * 100)} END)"


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    max_tokens: int,
    num_buckets: int,
    salt: str = "pack",
) -> DataFrame:
    """Assign documents to training-context packs of ~``max_tokens``:
    hash docs into ``num_buckets`` independent streams, order each
    stream by id, and cut packs at cumulative token boundaries
    (``pack_id = floor((cumsum - n) / max_tokens)``). A doc longer
    than max_tokens occupies its own pack(s) boundary - the standard
    greedy-offset packing, made deterministic.

    Scale: per-bucket windows, never a global sort; bucket count
    scales parallelism independently of corpus size, and each pack
    is built from one bucket's ordered slice, so the only shuffle is
    the window's hash partition on bucket. Non-id/token columns pass
    through untouched."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    base = df.withColumn(
        "bucket", sample_hash(F.col(id_col), salt) % num_buckets
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    cum = F.sum(token_count_col).over(w)
    return base.select(
        *df.columns,
        "bucket",
        cum.alias("cum_tokens"),
        F.floor((cum - F.col(token_count_col)) / max_tokens)
        .cast("int")
        .alias("pack_id"),
    )
