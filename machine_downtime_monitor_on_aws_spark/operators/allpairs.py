"""Exact all-pairs Jaccard similarity join via prefix filtering
(AllPairs, Bayardo et al. 2007; PPJoin, Xiao et al. 2008).

The LOSSLESS leg of the near-dup stack: MinHash+LSH
(operators/dedup.py) trades recall for speed - a pair can land in no
shared band and be missed. Prefix filtering is exact: order every
document's distinct shingles by a single global total order (document
frequency asc, then shingle asc - rarest first), and any two sets
with Jaccard >= t MUST share an element inside each one's first
``|d| - ceil(t*|d|) + 1`` shingles (if they shared none, the
remaining suffixes are too short to reach the required overlap
``o >= t*|d|``, which follows from J >= t because the union is at
least max(|a|,|b|)). Joining on prefix shingles only therefore finds
EVERY qualifying pair, and the candidate fan-out stays bounded
because prefixes hold the rarest shingles - few partners each.

Floating-point safety: the overlap bound is computed as
``floor(t * |d|)`` (not ceil) and the size filter as
``min + 1 > t * max``, both of which can only OVER-admit candidates
when the double rounds across an integer - never drop a true pair.
Candidates verify with exact integer set arithmetic
(operators/dedup.jaccard_verified_pairs), so extras cost a row in a
join, not correctness. The catalog oracle brute-forces ALL n*(n-1)/2
pairs in DuckDB - a hash match is a machine-checked proof of
losslessness, evidence the LSH queries (which share their candidate
derivation with their oracle) cannot give.

Scale shape: one shingle explode + one vocabulary-sized df-count
aggregation, one keyed join shingle-rows x df-counts, one per-doc
regroup (array_sort of a struct array - the global order is realized
per-document, NO global sort or single-partition window anywhere),
an equi-join on prefix shingles (rare keys - the skew story is the
df-ordering itself; a stop-shingle cap like minhash's
max_bucket_size can bolt on unchanged), and exact verification over
the surviving sliver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles
from .dedup import jaccard_verified_pairs


def allpairs_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 5,
    parallelism: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs guaranteed to contain every
    pair with shingle-set Jaccard >= threshold (and usually few
    others: prefix filtering + the size-ratio filter)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    # spread the narrow projection BEFORE the explode (the minhash /
    # symbolized_words shape): a single-file corpus would otherwise
    # shingle, count, and join on one core.
    n_par = parallelism or df.sparkSession.sparkContext.defaultParallelism
    sh_rows = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
        .repartition(n_par)
        .select(
            "id",
            F.explode(
                F.array_distinct(shingles(F.col("__t"), shingle_n))
            ).alias("shingle"),
        )
    )
    dfreq = sh_rows.groupBy("shingle").agg(F.count(F.lit(1)).alias("sdf"))
    # realize the global (df asc, shingle asc) order per document:
    # struct comparison is lexicographic by field, and shingles are
    # distinct within a doc, so the sort is total and deterministic
    # regardless of collect_list's arrival order.
    per_doc = (
        sh_rows.join(dfreq, "shingle")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("sdf"), F.col("shingle")))
            ).alias("ordered"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    # overlap bound o >= t*|d| underestimated as floor(t*|d|) ->
    # prefix one longer than strictly needed at integer boundaries,
    # never shorter.
    p_len = (
        F.col("sz")
        - F.floor(F.lit(threshold) * F.col("sz").cast("double")).cast("long")
        + F.lit(1)
    )
    prefix = per_doc.select(
        "id",
        "sz",
        F.explode(
            F.slice(
                F.transform(F.col("ordered"), lambda x: x["shingle"]),
                F.lit(1),
                p_len.cast("int"),
            )
        ).alias("shingle"),
    )
    a = prefix.selectExpr("id AS doc_a", "sz AS sz_a", "shingle")
    b = prefix.selectExpr("id AS doc_b", "sz AS sz_b", "shingle")
    return (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (
                (F.least("sz_a", "sz_b") + F.lit(1)).cast("double")
                > F.lit(threshold)
                * F.greatest("sz_a", "sz_b").cast("double")
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def allpairs_jaccard_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 5,
) -> DataFrame:
    """(doc_a, doc_b, jaccard): EXACTLY the pairs with shingle-set
    Jaccard >= threshold - prefix-filtered candidates verified with
    exact integer set arithmetic. No false negatives by the prefix
    theorem; no false positives by verification."""
    # jaccard_verified_pairs consumes the pairs THREE times (two
    # candidate-id semi-join legs + the scored join); materialize the
    # candidate pipeline once (measured 17s -> ~2s at sf0.1).
    cands = allpairs_candidates(
        df, id_col, text_col, threshold, shingle_n
    ).localCheckpoint(eager=False)
    return jaccard_verified_pairs(
        df, cands, id_col, text_col, threshold, shingle_n
    )
