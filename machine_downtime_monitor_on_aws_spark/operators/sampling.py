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


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into overlapping token windows (the chunking
    step before embedding in a retrieval/training pipeline):
    ``(doc_id, chunk_id, chunk_text, n_chunk_tokens)`` with stride
    ``chunk_size - overlap``.

    Chunk boundaries are pure integer arithmetic over the token
    array (sequence + slice + explode - no UDF), so chunk counts and
    contents are engine-exact. Each input row expands independently:
    no shuffle at all; output parallelism follows the scan."""
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"overlap must be in [0, chunk_size), got {overlap}")
    from ..functions.text import tokens

    stride = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # ceil((n - chunk)/stride) + 1; double-division floor is exact for
    # token counts (integers far below 2^53)
    n_chunks = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.floor((n - chunk_size + stride - 1) / F.lit(stride)).cast("int") + 1
    )
    piece = F.explode(
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda k: F.struct(
                k.cast("int").alias("chunk_id"),
                F.slice(toks, (k - 1) * stride + 1, chunk_size).alias("ctoks"),
            ),
        )
    ).alias("c")
    return df.select(F.col(id_col).alias("doc_id"), piece).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.array_join(F.col("c.ctoks"), " ").alias("chunk_text"),
        F.size(F.col("c.ctoks")).cast("int").alias("n_chunk_tokens"),
    )


def weighted_sample(
    df: DataFrame, id_col: str, rate_pct_col: Column, salt: str = "wsample"
) -> DataFrame:
    """Importance sampling: per-ROW keep probability from a column
    expression (e.g. a quality score mapped to [0, 100]), decided by
    the same deterministic id hash as the fixed-rate variants. Still
    a pure scan-level filter - the rate expression rides the
    projection; no shuffle, reproducible across partitionings.

    The threshold is ``floor(rate_pct * 100)`` EXPLICITLY: a bare
    double->long cast truncates toward zero in Spark but rounds to
    nearest in DuckDB (CAST(8549.7 AS BIGINT) = 8550 there), so the
    rounding mode must be pinned on both sides or docs whose hash
    lands between the two thresholds flip engines."""
    return df.filter(
        sample_hash(F.col(id_col), salt)
        < F.floor(rate_pct_col * 100).cast("long")
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    boundary_mod: int = 16,
) -> DataFrame:
    """Content-defined chunking: chunk boundaries fall AFTER any token
    whose portable 24-bit hash is divisible by ``boundary_mod``
    (expected chunk length = boundary_mod tokens), so boundaries
    depend on CONTENT, not position. The property fixed-size
    chunking (:func:`chunk_documents`) lacks: inserting one sentence
    shifts every downstream fixed window, but content-defined
    boundaries re-synchronize immediately - identical text runs
    produce identical chunks wherever they sit, which is what makes
    cross-document chunk-level dedup (and incremental re-embedding
    of edited documents) work.

    The rolling window is the token BIGRAM ending at each position
    (boundary after token i when hash(t_i ' ' t_{i+1}) divides
    evenly): hashing a 2-token window instead of single tokens keeps
    boundaries content-defined while being robust to tiny
    vocabularies, where a single-token rule can degenerate to zero
    boundaries corpus-wide (every doc = one chunk) if no vocabulary
    word happens to hash to the residue.

    Output: (doc_id, chunk_idx, start_token, n_tokens, chunk_md5) -
    chunk_idx and start_token are both 1-BASED (pinned by the oracle
    and the first-principles model test); the md5 is over the
    chunk's space-joined tokens, the join key for chunk-store dedup.
    Docs with no tokens produce no chunks.
    Production deployments usually add min/max chunk-length clamps;
    the unclamped form keeps the oracle expression shared and the
    boundary semantics pure.

    Shape: tokens EXPLODE to rows, the bigram hash is one md5 per
    row (lead() supplies the next token), the chunk id is a running
    boundary count, and chunks reassemble with a grouped sort_array
    - window, running sum, and groupBy all ride ONE doc_id exchange
    (hashpartitioning(doc_id) satisfies every downstream
    clustering). An array-lambda formulation would look shuffle-free
    but costs O(tokens^2) md5 calls per doc: Spark does no
    common-subexpression elimination inside higher-order-function
    lambdas, so each element_at(hs, i) re-evaluates the whole hash
    array (the winnow_fingerprints lesson)."""
    from ..functions.text import tokens as _tokens

    if boundary_mod < 1:
        raise ValueError(f"boundary_mod must be >= 1, got {boundary_mod}")
    t = _tokens(F.col(text_col))
    tok_rows = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(t).alias("__pos", "__tok")
    )
    by_doc = Window.partitionBy("doc_id").orderBy("__pos")
    bigram_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws(" ", F.col("__tok"), F.lead("__tok", 1).over(by_doc))),
            1,
            6,
        ),
        16,
        10,
    ).cast("long")
    # boundary AFTER token at __pos when the bigram (tok, next) hash
    # divides evenly; the last token never opens a new chunk
    marked = tok_rows.select(
        "doc_id",
        "__pos",
        "__tok",
        F.when(
            F.lead("__tok", 1).over(by_doc).isNotNull()
            & (bigram_hash % boundary_mod == 0),
            1,
        )
        .otherwise(0)
        .alias("__is_boundary"),
    )
    # chunk of a token = 1 + boundaries strictly BEFORE it: running
    # sum shifted by one row - rides the same doc_id window
    chunked = marked.select(
        "doc_id",
        "__pos",
        "__tok",
        (
            F.coalesce(
                F.sum("__is_boundary").over(
                    by_doc.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + 1
        )
        .cast("int")
        .alias("chunk_idx"),
    )
    grouped = chunked.groupBy("doc_id", "chunk_idx").agg(
        F.min("__pos").alias("__start0"),
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.sort_array(F.collect_list(F.struct("__pos", "__tok"))).alias("__ord"),
    )
    return grouped.select(
        "doc_id",
        "chunk_idx",
        (F.col("__start0") + 1).cast("int").alias("start_token"),
        "n_tokens",
        F.md5(
            F.concat_ws(
                " ", F.transform(F.col("__ord"), lambda s: s["__tok"])
            )
        ).alias("chunk_md5"),
    )


def dsir_importance_weights(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score every document by how target-like its token distribution
    is - the importance-resampling signal for selecting pretraining
    data that matches a target domain. Two add-one-smoothed unigram
    models train over the split ``is_target`` defines (shared
    smoothing vocabulary); each document's weight is the product of
    per-token likelihood RATIOS p_target(tok)/p_raw(tok), folded
    left-to-right over token positions with the two-sided
    mantissa/exponent accumulator (operators/nbayes.
    signed_product_fold) so neither log() nor overflow/underflow
    ever enters - the whole computation is correctly-rounded IEEE
    arithmetic a DuckDB list_reduce replays bit-for-bit.

    Returns (doc_id, is_target, weight_m, weight_e): true weight =
    ``weight_m * 1e150**weight_e``; rank by (weight_e desc,
    weight_m desc). Resampling composes downstream (weighted_sample
    / top-k by weight); this operator deliberately emits weights
    only - no global sort.

    Scale shape: two count aggregations (map-side combining) train
    both models; scoring joins each token row against the two count
    tables on the token key and regroups per doc - token-sized
    skinny rows, no fan-out (unlike NB's L-label broadcast, the
    "label" here is a 2-model ratio folded into one factor)."""
    from pyspark.sql import functions as F

    from ..functions.text import tokens
    from .nbayes import signed_product_fold

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("is_target"),
        F.col(text_col).alias("__text"),
    )
    tok_rows = base.select(
        "doc_id",
        "is_target",
        F.posexplode(tokens(F.col("__text"))).alias("pos", "tok"),
    )
    ct = (
        tok_rows.filter(F.col("is_target"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    cs = (
        tok_rows.filter(~F.col("is_target"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cs"))
    )
    tot = tok_rows.agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("tt"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("ts"),
        F.countDistinct("tok").alias("v"),
    ).collect()[0]
    tt, ts, v = int(tot.tt or 0), int(tot.ts or 0), int(tot.v or 0)
    p_t = (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double") / F.lit(
        tt + v
    ).cast("double")
    p_s = (F.coalesce(F.col("cs"), F.lit(0)) + F.lit(1)).cast("double") / F.lit(
        ts + v
    ).cast("double")
    arrs = (
        tok_rows.join(ct, "tok", "left")
        .join(cs, "tok", "left")
        .withColumn("r", p_t / p_s)
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "r"))),
                lambda s: s["r"],
            ).alias("rs")
        )
    )
    folded = base.join(arrs, "doc_id", "left").select(
        "doc_id",
        "is_target",
        signed_product_fold(
            F.coalesce(F.col("rs"), F.array().cast("array<double>")),
            F.lit(1.0),
        ).alias("s"),
    )
    return folded.select(
        "doc_id",
        "is_target",
        F.col("s")["m"].alias("weight_m"),
        F.col("s")["e"].cast("int").alias("weight_e"),
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    budget_frac: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based mixture sampling at alpha = 0.5 (the
    classic multilingual/multi-source rebalancing: sample source i
    proportionally to n_i**alpha instead of n_i, lifting small
    sources): target share s_i = sqrt(n_i) / sum_j sqrt(n_j), a
    total budget of ``budget_frac`` * N docs, per-source keep rate
    r_i = s_i * M / n_i (clamped to 1), applied as the
    deterministic hash-threshold filter.

    alpha = 0.5 is deliberately the ONE temperature that stays
    engine-exact: n**0.5 is ``sqrt``, correctly rounded per
    IEEE-754 everywhere, where a general ``pow`` is a libm call
    with no cross-engine ulp guarantee. The sqrt shares are summed
    via the 1e-9-quantized BIGINT scheme so the normalizer is
    partition-order independent. Scale shape: one tiny per-source
    aggregate broadcast back onto the scan filter - zero extra
    shuffles over the corpus."""
    from pyspark.sql import functions as F

    if not 0 < budget_frac <= 1:
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")
    sizes = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    sq = F.floor(
        F.sqrt(F.col("__n").cast("double")) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    sized = sizes.withColumn("__sq", sq)
    tot = sized.agg(
        F.sum("__sq").alias("__tot"), F.sum("__n").alias("__nall")
    )
    rated = sized.crossJoin(F.broadcast(tot)).select(
        "__g",
        F.least(
            F.lit(10_000),
            F.floor(
                (
                    F.col("__sq").cast("double") / F.col("__tot").cast("double")
                )
                * (F.col("__nall").cast("double") * F.lit(float(budget_frac)))
                / F.col("__n").cast("double")
                * F.lit(10_000.0)
                + F.lit(0.5)
            ).cast("long"),
        ).alias("__thr"),
    )
    return (
        df.join(
            F.broadcast(rated), df[group_col] == rated["__g"]
        )
        .filter(sample_hash(F.col(id_col), salt) < F.col("__thr"))
        .select(*df.columns, F.col("__thr").cast("int").alias("keep_threshold"))
    )


def kmv_distinct_estimate(
    df: DataFrame, value_col: str, k: int, salt: str = "kmv"
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch - the
    DETERMINISTIC, engine-portable alternative to HLL++ for
    cardinality estimates that must reproduce bit-for-bit across
    runs and engines (approx_count_distinct's sketch is
    implementation-defined, so its catalog query is rows-only;
    this one oracle-pairs). Hash every distinct value to a 52-bit
    uniform fraction (md5 hex prefix - 52 bits fits a double
    EXACTLY), keep the k smallest via a TakeOrdered heap (never a
    global sort), and estimate distinct = (k-1) / kth_min_fraction.
    Fewer than k distinct values degrade to the exact count (the
    standard KMV fallback). Returns one row:
    (n_hashed, kmv_estimate)."""
    from pyspark.sql import functions as F

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = F.md5(
        F.concat(F.lit(f"{salt}:"), F.col(value_col).cast("string"))
    )
    frac = F.conv(F.substring(h, 1, 13), 16, 10).cast("long")
    top = (
        df.select(frac.alias("__f"))
        .distinct()
        .orderBy(F.col("__f").asc())
        .limit(k)
    )
    two52 = float(16**13)
    return top.agg(
        F.count(F.lit(1)).alias("n_hashed"),
        F.when(
            F.count(F.lit(1)) < F.lit(k),
            F.count(F.lit(1)).cast("double"),
        )
        .otherwise(
            F.lit(float(k - 1))
            / (F.max("__f").cast("double") / F.lit(two52))
        )
        .alias("kmv_estimate"),
    )


def largest_remainder_allocation(
    weights: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment: split an integer
    ``budget`` across groups proportionally to integer ``weight_col``,
    exactly - floor every quota, then hand the leftover units to the
    largest fractional remainders (ties: group asc). The mixture
    PLANNER a training run needs upstream of the samplers: target
    shares come from a mixing policy (e.g. the alpha=0.5 sqrt
    weights), and this turns them into per-source token/doc counts
    that sum to the budget EXACTLY - no drift for the epoch
    scheduler to absorb.

    Exactness: weights are integers (callers quantize rational
    policies, e.g. the 1e-9 sqrt scheme), quotas are one pinned tree
    of double ops (budget * w / total), floors/remainders derive from
    them, and the remainder ranking is a deterministic
    (rem desc, group asc) order - every step engine-identical, so
    the whole apportionment is oracle-exact. Honest footnote on the
    sums-to-budget invariant: it is exact for real-valued quotas;
    double rounding can shift floor(quota) by one when a quota lands
    within an ulp of an integer, which shifts the leftover count the
    same amount in the opposite direction - totals then still land
    within +-(boundary cases) of the budget, identically on both
    engines (same doubles, same floors). Scale shape: one
    map-side-combining total, one broadcast of the 1-row scalar, a
    window over the per-group SLIVER (S rows - groups, never corpus),
    zero corpus shuffles."""
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.sql import Window

    # weight-total guard (mirrors the budget guard): an empty frame or
    # an all-zero/null weight column would make quota 0/0 = NaN,
    # floor(NaN) = NULL, and the output would silently carry null
    # allocations. Fail loudly instead. The fetch is one scalar - the
    # k-means-centroids control-plane pattern - and the literal it
    # yields replaces the broadcast 1-row join bit-identically (same
    # double divides the same quotas).
    total = weights.agg(F.sum(F.col(weight_col))).first()[0]
    if total is None or total == 0:
        raise ValueError(
            "largest_remainder_allocation: weight total is zero or null "
            "(empty frame, or all weights zero/null) - quotas would be "
            "NaN; supply at least one positive weight"
        )
    based = weights.select(
        F.col(group_col).alias("group"),
        F.col(weight_col).alias("weight"),
        (
            F.lit(budget).cast("double")
            * F.col(weight_col).cast("double")
            / F.lit(total).cast("double")
        ).alias("quota"),
    )
    based = based.select(
        "group",
        "weight",
        "quota",
        F.floor(F.col("quota")).cast("long").alias("alloc_floor"),
        (F.col("quota") - F.floor(F.col("quota"))).alias("__rem"),
    )
    leftover = based.agg(
        (F.lit(budget) - F.sum("alloc_floor")).alias("__left")
    )
    w = Window.orderBy(F.col("__rem").desc(), F.col("group").asc())
    return (
        based.crossJoin(F.broadcast(leftover))
        .withColumn("__rk", F.row_number().over(w))
        .select(
            "group",
            "weight",
            "quota",
            "alloc_floor",
            (
                F.col("alloc_floor")
                + F.when(F.col("__rk") <= F.col("__left"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("allocation"),
        )
    )
