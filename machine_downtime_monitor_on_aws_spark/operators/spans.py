"""Exact substring (duplicated-span) detection across documents -
the third leg of a production text-dedup stack next to doc-level
MinHash/SimHash and chunk-level winnowing/CDC (r7 verdict
next-round #3; the batch analogue of Lee et al. 2022's
suffix-array "Deduplicating Training Data Makes Language Models
Better" pass).

Relational formulation instead of a suffix array (which needs the
whole corpus's character space in one address space - a non-starter
distributed): every overlapping k-token window hashes to an md5
digest, windows join on the digest across documents, and runs of
matches on the same alignment diagonal stitch into MAXIMAL shared
spans with the classic gaps-and-islands trick. A span of L >= k
shared tokens appears as exactly L - k + 1 consecutive diagonal
matches, so maximal spans are exact - no sampling, unlike winnowing
fingerprints which keep only per-window minima.

Scale shape:
- the window table is O(total corpus tokens) rows of
  (doc_id, pos, digest) - 32-hex digests plus two ints; document
  TEXT never shuffles (same discipline as dedup.py's exact dedup);
- the self-join keys on the digest - Spark shuffles both sides once
  on a high-entropy 32-byte key, AQE handles residual skew;
- ``max_gram_occurrences`` is the skew valve: a boilerplate k-gram
  occurring W times corpus-wide would emit O(W^2) join rows; past
  the cap its windows are EXCLUDED (the standard
  frequent-gram-drop; spans containing it split or vanish - a
  documented recall tradeoff, analogous to the MinHash capped-star
  degradation, and irrelevant to the spans the pass exists to find:
  long verbatim copies are made of rare grams). None = exact
  enumeration, the mode the oracle-paired catalog query pins;
- stitching windows/aggregations key on (doc_a, doc_b, diag) -
  pair-local, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def kgram_windows(
    docs: DataFrame, id_col: str, text_col: str, k: int,
    parallelism: int | None = None,
) -> DataFrame:
    """Every overlapping k-token window of every document:
    (doc_id, pos, g) with pos the 0-based token offset and g the md5
    of the space-joined window. Documents with fewer than k tokens
    emit nothing - they cannot contain a k-token span (deliberately
    NOT the whole-text fallback shingles() uses: a short doc's
    degenerate gram would fabricate spans of inflated token length).

    ``parallelism``: optional repartition width for the narrow
    (doc_id, tokens) projection before the md5-heavy explode (the
    minhash/allpairs discipline): a corpus arriving in few input
    splits would otherwise hash every window on a fraction of the
    cores. Keyed by doc_id, so the two sides of the batch self-join
    share ONE exchange (ReusedExchange) and only the parallel
    Generate runs per side.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    d = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")
    ).filter(F.size("__t") >= k)
    if parallelism:
        d = d.repartition(parallelism, "doc_id")
    grams = F.transform(
        F.sequence(F.lit(1), F.size("__t") - F.lit(k - 1)),
        lambda i: F.md5(F.array_join(F.slice("__t", i, k), " ")),
    )
    return d.select("doc_id", F.posexplode(grams).alias("pos", "g")).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "g"
    )


def duplicated_spans(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    min_span_tokens: int | None = None,
    max_gram_occurrences: int | None = None,
    parallelism: int | None = None,
) -> DataFrame:
    """Maximal cross-document duplicated spans of >= ``k`` (or
    ``min_span_tokens``) consecutive tokens, one row per
    (unordered doc pair, alignment, maximal run):
    ``(doc_a, doc_b, start_a, start_b, span_tokens)`` with
    ``doc_a < doc_b`` and starts as 0-based token offsets.

    Matching window pairs at (pos_a, pos_b) belong to the same
    candidate span iff they share the diagonal d = pos_a - pos_b and
    are consecutive in pos_a; ``pos_a - row_number()`` is constant
    exactly on such runs (gaps-and-islands), so one window + one
    groupBy per (pair, diag) recovers every maximal span exactly.
    A doc pair sharing several distinct spans (or the same text at
    several alignments) yields several rows - downstream policy
    (trim the span from one side, drop the later doc, count
    duplicated tokens per source) aggregates as it needs.
    """
    if min_span_tokens is None:
        min_span_tokens = k
    if min_span_tokens < k:
        raise ValueError(
            f"min_span_tokens={min_span_tokens} below window size k={k}: "
            "spans shorter than k are undetectable by construction"
        )
    w = kgram_windows(docs, id_col, text_col, k, parallelism)
    if max_gram_occurrences is not None:
        w = (
            w.withColumn(
                "__wc", F.count(F.lit(1)).over(Window.partitionBy("g"))
            )
            .filter(F.col("__wc") <= max_gram_occurrences)
            .drop("__wc")
        )
    a = w.select(
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
        "g",
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        "g",
    )
    m = a.join(b, "g").filter(F.col("doc_a") < F.col("doc_b"))
    return _stitch_spans(m, k, min_span_tokens)


def _stitch_spans(m: DataFrame, k: int, min_span_tokens: int) -> DataFrame:
    """Diagonal gaps-and-islands stitching of matched window pairs
    (doc_a, doc_b, pos_a, pos_b) into maximal spans - shared by the
    batch self-join and the incremental index probe (identical
    stitching guarantees the incremental result can be pinned
    set-equal to a full rerun)."""
    diag = (F.col("pos_a") - F.col("pos_b")).alias("diag")
    run = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    r = m.select("doc_a", "doc_b", "pos_a", "pos_b", diag).withColumn(
        "__isl", F.col("pos_a") - F.row_number().over(run)
    )
    spans = (
        r.groupBy("doc_a", "doc_b", "diag", "__isl")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.max("pos_a") - F.min("pos_a") + F.lit(k)).alias("span_tokens"),
        )
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )
    if min_span_tokens > k:
        spans = spans.filter(F.col("span_tokens") >= min_span_tokens)
    return spans


def remove_duplicated_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
) -> DataFrame:
    """The REMOVAL half of exact substring dedup (Lee et al. 2022's
    actual corpus transform): every span keeps its earliest copy -
    the ``doc_a`` side (ids are the tie-break; doc_a < doc_b by
    construction) - and is cut from every later doc. Returns one row
    per input doc: (doc_id, n_tokens, n_removed, dedup_text).

    Steps, all relational:
    1. the spans' doc_b sides become half-open token ranges
       [start_b, start_b + span_tokens);
    2. per doc, overlapping/adjacent ranges merge (gaps-and-islands
       again: a range opens a new island iff it starts past the
       running max end of everything before it);
    3. the merged ranges ride back onto the doc as ONE array column
       (groupBy collect_list - ranges per doc are few by
       construction), and the doc's tokens filter through a nested
       higher-order expression: keep token at pos iff NO range
       covers pos. Document text shuffles exactly once (the ranges
       join is on doc_id against a span-derived sliver).

    Docs untouched by any span pass through with n_removed = 0 -
    the output is the full deduplicated corpus, not just the edited
    sliver."""
    from pyspark.sql import Window

    ranges = spans.select(
        F.col("doc_b").alias("doc_id"),
        F.col("start_b").alias("s"),
        (F.col("start_b") + F.col("span_tokens")).alias("e"),
    )
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = (
        ranges.withColumn(
            "__new_island",
            F.when(
                prev_max.isNull() | (F.col("s") > prev_max), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__island",
            F.sum("__new_island").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "__island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__rm")
        )
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t")
    ).join(grouped, "doc_id", "left")
    indexed = F.transform(
        F.col("__t"),
        lambda tok, i: F.struct(i.alias("pos"), tok.alias("tok")),
    )
    kept = F.filter(
        indexed,
        lambda x: ~F.exists(
            F.coalesce(
                F.col("__rm"),
                F.array().cast("array<struct<s:long,e:long>>"),
            ),
            lambda r: (x["pos"] >= r["s"]) & (x["pos"] < r["e"]),
        ),
    )
    return d.select(
        "doc_id",
        F.size("__t").cast("long").alias("n_tokens"),
        (F.size("__t") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(F.transform(kept, lambda x: x["tok"]), " ").alias(
            "dedup_text"
        ),
    )


def write_kgram_index(
    docs: DataFrame,
    table_name: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> None:
    """Persist a corpus's k-gram windows as a table bucketed on the
    digest - the layout that makes INCREMENTAL substring dedup (each
    new batch vs the whole historical corpus) shuffle-free on the
    history side, the exact discipline write_minhash_index
    established for band rows. The window size ``k`` is stamped as a
    table property and validated on every probe/append: windows
    hashed with a drifted k are incomparable digests and would
    SILENTLY find zero cross-history spans."""
    from ..operators.dedup import _stamp_index_params
    from ..sources.lake import write_bucketed_table

    w = kgram_windows(docs, id_col, text_col, k)
    write_bucketed_table(w, table_name, "g", num_buckets)
    _stamp_index_params(docs.sparkSession, table_name, kgram_k=k)


def append_to_kgram_index(
    docs: DataFrame,
    table_name: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> None:
    """Grow the window index with a processed batch - O(batch),
    bucket layout validated by Spark, k validated against the
    stamp."""
    from ..operators.dedup import _check_index_params
    from ..sources.lake import write_bucketed_table

    spark = docs.sparkSession
    _check_index_params(spark, table_name, kgram_k=k)
    w = kgram_windows(docs, id_col, text_col, k)
    write_bucketed_table(w, table_name, "g", num_buckets, mode="append")
    spark.catalog.refreshTable(table_name)


def incremental_duplicated_spans(
    spark,
    new_docs: DataFrame,
    table_name: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_span_tokens: int | None = None,
) -> DataFrame:
    """Duplicated spans for a NEW batch of documents against (a) the
    persisted historical window index and (b) itself - exactly the
    spans :func:`duplicated_spans` would produce on
    (history ∪ batch) restricted to pairs touching the batch
    (test-pinned set-equal), at O(batch + touched buckets) instead
    of O(corpus²) per ingest batch.

    Scale shape mirrors incremental_candidate_pairs: the history
    side is bucketed on the digest, so the probe join shuffles ONLY
    the batch's window rows; history never moves. Docs present in
    BOTH the index and the batch (append-then-crash replay,
    overlapping batches) are handled: the history side anti-joins
    the batch's ids (broadcast - batch-sized), so a duplicate doc
    can never pair from both legs or in both orientations. The
    stitching is the shared :func:`_stitch_spans`, so maximality
    semantics are identical to the batch path."""
    from ..operators.dedup import _check_index_params

    if min_span_tokens is None:
        min_span_tokens = k
    _check_index_params(spark, table_name, kgram_k=k)
    spark.catalog.refreshTable(table_name)
    bw = kgram_windows(new_docs, id_col, text_col, k)
    batch_ids = new_docs.select(F.col(id_col).alias("doc_id")).distinct()
    hist = spark.table(table_name).join(
        F.broadcast(batch_ids), "doc_id", "left_anti"
    )
    # cross leg: orientation by id so doc_a < doc_b holds regardless
    # of which side is historical
    cross = (
        bw.select(
            F.col("doc_id").alias("__bid"), F.col("pos").alias("__bpos"), "g"
        )
        .join(
            hist.select(
                F.col("doc_id").alias("__hid"),
                F.col("pos").alias("__hpos"),
                "g",
            ),
            "g",
        )
        .select(
            F.least("__bid", "__hid").alias("doc_a"),
            F.greatest("__bid", "__hid").alias("doc_b"),
            F.when(F.col("__bid") < F.col("__hid"), F.col("__bpos"))
            .otherwise(F.col("__hpos"))
            .alias("pos_a"),
            F.when(F.col("__bid") < F.col("__hid"), F.col("__hpos"))
            .otherwise(F.col("__bpos"))
            .alias("pos_b"),
        )
    )
    # batch-internal leg: in-memory self-join, same shape as the
    # batch path
    ba = bw.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "g"
    )
    bb = bw.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b"), "g"
    )
    internal = ba.join(bb, "g").filter(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b", "pos_a", "pos_b"
    )
    # replay shield: a crashed append_to_kgram_index re-append leaves
    # duplicate (doc_id, pos, g) history rows, and duplicate MATCH
    # rows would inflate _stitch_spans' diagonal row_number and
    # fragment islands (wrong spans, not just duplicate spans - the
    # same hazard class as the exact loop's intersection counts).
    # Deduping the match SLIVER restores exactness at sliver cost;
    # on a clean index matches are unique and this is a no-op.
    matches = cross.unionByName(internal).dropDuplicates(
        ["doc_a", "doc_b", "pos_a", "pos_b"]
    )
    return _stitch_spans(matches, k, min_span_tokens)


# ---- k-gram index maintenance (shared bucketed-index swap core)
#
# The minhash/shingle lifecycle discipline applies verbatim: the swap
# core (operators/dedup._swap_rewritten_index) parameterized on the
# bucket column 'g', the two-rename crash window and its healing, and
# the stamped-params re-stamp are shared code, so the three bucketed
# indexes cannot drift apart in filesystem behavior.

def recover_kgram_index(spark, table_name: str) -> bool:
    """Heal a compaction/purge interrupted mid-swap; shared recovery
    (never touches the bucket column)."""
    from .dedup import recover_minhash_index

    return recover_minhash_index(spark, table_name)


def compact_kgram_index(spark, table_name: str) -> None:
    """Fold a sustained-append window table back to one file per
    bucket, dropping verbatim duplicate rows (crash re-appends),
    preserving the CLUSTERED BY (g) spec and the stamped kgram_k the
    shuffle-free probe stands on. O(index); gate by file count."""
    from .dedup import _swap_rewritten_index

    _swap_rewritten_index(
        spark, table_name, spark.table(table_name), bucket_col="g"
    )


def purge_from_kgram_index(
    spark, table_name: str, doc_ids: DataFrame, id_col: str = "doc_id"
) -> int:
    """Targeted deletion (takedown): remove every window row of the
    given documents, preserving the bucketed layout. Returns the
    number of distinct indexed documents removed; idempotent. Honest
    cost: windows are bucketed on the digest, so doc rows have no
    pruned location - a purge is an O(index) bucket-preserving
    rewrite (batch takedowns; piggyback a due compaction).
    Correctness note specific to THIS index: a window row is
    (doc_id, pos, g) - removing all of a doc's rows removes every
    diagonal it could ever stitch on, so no partial span against a
    purged doc can survive."""
    from .dedup import _swap_rewritten_index

    recover_kgram_index(spark, table_name)
    spark.catalog.refreshTable(table_name)
    ids = doc_ids.select(F.col(id_col).alias("__pid")).distinct()
    tbl = spark.table(table_name)
    n = (
        tbl.join(F.broadcast(ids), tbl["doc_id"] == F.col("__pid"), "left_semi")
        .select("doc_id")
        .distinct()
        .count()
    )
    if n == 0:
        return 0
    remaining = tbl.join(
        F.broadcast(ids), tbl["doc_id"] == F.col("__pid"), "left_anti"
    )
    _swap_rewritten_index(spark, table_name, remaining, bucket_col="g")
    return n
