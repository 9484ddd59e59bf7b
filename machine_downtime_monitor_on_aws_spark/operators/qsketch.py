"""Mergeable fixed-grid quantile sketch - the incremental
percentile store the adaptive quality gate runs on at 100 TB.

The batch gate (plans/textops.adaptive_quality_filter) computes
per-source percentile cutoffs with one exact aggregation - fine for
a frozen corpus, but exact quantiles do NOT merge: a streaming
curation loop would re-read every document ever ingested to refresh
its cutoffs. This module fills the t-digest/KLL role (mergeable
quantile state maintained in O(delta) per batch) with a
determinism-first design:

- the score axis quantizes onto a FIXED grid of ``n_bins`` equal
  cells over a declared [lo, hi] (the catalog instance: lexical
  diversity in [0, 1] at 4096 bins - lo/hi/scale all binary-exact,
  so the quantization arithmetic is the identical IEEE multiply +
  floor on every engine);
- the sketch state is per-key bin COUNTS - bounded at
  ``n_bins + 1`` rows per key regardless of corpus size, and counts
  merge ADDITIVELY across batches (the KN trigram-counts argument:
  integer sums are partition/epoch-order independent, so the folded
  feed equals a one-shot build exactly - streaming/qsketch.py);
- quantiles read off the sketch by the inverted-CDF rule (type-1):
  the cutoff bin is the smallest bin whose cumulative count reaches
  ceil(q * N), all integer arithmetic.

Accuracy is a THEOREM here, not an estimate: quantization (floor of
a monotone rescale) is order-preserving, so the k-th smallest bin
equals the bin of the k-th smallest raw score - the sketch's type-1
quantile bin is EXACTLY floor(rescale(exact type-1 quantile)), i.e.
the cutoff errs by less than one grid cell (2^-12 of the range at
the catalog's 4096 bins) and never mis-ranks two scores more than a
cell apart. Unlike KLL/t-digest the state never compacts and never
randomizes - the 100 TB trade is n_bins rows per key (KBs) for
bit-reproducibility and an exact DuckDB oracle, which is the right
trade when the score axis is a known bounded ratio (quality scores,
probabilities, normalized lengths). Unbounded heavy-tailed axes
(raw byte lengths) should pre-map through a monotone squash or use
a true rank sketch; that variant composes behind the same bin/cnt
schema.

Scale shape: quantization is a pure scan expression; the histogram
is ONE map-side-combining aggregation to key x occupied-bin rows;
the quantile read is a per-key window over <= n_bins + 1 rows (the
key-sized table broadcasts back over the stream for gating). The
corpus never shuffles for the cutoffs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _check_grid(lo: float, hi: float, n_bins: int) -> None:
    if not lo < hi:
        raise ValueError(f"need lo < hi, got [{lo}, {hi}]")
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")


def quantize_score(
    score: Column, lo: float, hi: float, n_bins: int
) -> Column:
    """Grid cell of ``score``: floor((score - lo) / (hi - lo) *
    n_bins), as a long; score == hi lands in cell ``n_bins`` (the
    closed top edge), so the grid has ``n_bins + 1`` cells. An
    out-of-range or NULL score raises in-expression (assert_true -
    the signq_encode fail-loudly discipline: a silently clamped
    outlier would shift every cumulative count it passes through)."""
    guard = F.assert_true(
        (score >= F.lit(lo)) & (score <= F.lit(hi)),
        F.concat_ws(
            " ",
            F.lit("quantize_score: score"),
            score.cast("string"),
            F.lit(f"outside [{lo}, {hi}]"),
        ),
    )
    cell = F.floor(
        (score - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n_bins))
    ).cast("long")
    return F.when(guard.isNull(), cell)


def sketch_bins(
    df: DataFrame,
    key_cols: list[str],
    score_col: str,
    lo: float,
    hi: float,
    n_bins: int,
    bin_col: str = "score_bin",
    cnt_col: str = "cnt",
) -> DataFrame:
    """The sketch state: ``(key..., score_bin, cnt)`` - one map-side-
    combining aggregation; <= n_bins + 1 rows per key, merged across
    any partitioning of the input by plain addition (the additive
    contract streaming/qsketch.py's fold relies on)."""
    _check_grid(lo, hi, n_bins)
    q = df.withColumn(
        bin_col, quantize_score(F.col(score_col), lo, hi, n_bins)
    )
    return q.groupBy(*key_cols, bin_col).agg(
        F.count(F.lit(1)).alias(cnt_col)
    )


def merge_sketches(
    bins: DataFrame,
    key_cols: list[str],
    bin_col: str = "score_bin",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Fold any union of same-grid sketch states into one: sum counts
    by (key, bin). Grids must match - the streaming store stamps the
    grid params and fails loudly on drift (streaming/qsketch.py);
    merging sketches cut on different grids is meaningless in the
    same way Hamming across threshold vectors is."""
    return bins.groupBy(*key_cols, bin_col).agg(
        F.sum(cnt_col).alias(cnt_col)
    )


def sketch_quantile_bins(
    bins: DataFrame,
    key_cols: list[str],
    q_num: int,
    q_den: int,
    bin_col: str = "score_bin",
    cnt_col: str = "cnt",
    out_col: str = "cutoff_bin",
) -> DataFrame:
    """Per-key type-1 (inverted-CDF) quantile bin read off the
    sketch: the smallest bin whose cumulative count reaches
    k = ceil(N * q_num / q_den) - integer arithmetic end to end, so
    the read is engine-exact. The window runs over <= n_bins + 1
    rows per key (the sketch bound), never over data."""
    if not (0 < q_num <= q_den):
        raise ValueError(f"need 0 < q_num <= q_den, got {q_num}/{q_den}")
    w = Window.partitionBy(*key_cols).orderBy(bin_col)
    tot = Window.partitionBy(*key_cols)
    cum = F.sum(cnt_col).over(w)
    n = F.sum(cnt_col).over(tot)
    # integer ceil(N * q / den), exact at ANY N: Spark's `/` on
    # integral types is IEEE double division (exact only below 2^53),
    # so route the divide through decimal(38,0), whose division +
    # floor are integer-exact - matching the DuckDB oracle's true
    # integer division and the documented "integer arithmetic end to
    # end" claim (r16 ADVICE #2).
    k = F.floor(
        (n.cast("decimal(38,0)") * F.lit(q_num) + F.lit(q_den - 1))
        / F.lit(q_den)
    )
    return (
        bins.withColumn("__cum", cum)
        .withColumn("__k", k)
        .filter(F.col("__cum") >= F.col("__k"))
        .groupBy(*key_cols)
        .agg(F.min(bin_col).alias(out_col))
    )
