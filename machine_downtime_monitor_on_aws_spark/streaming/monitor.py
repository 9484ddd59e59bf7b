"""Streaming corpus monitors: the in-stream QA twins of the batch
text-analysis queries, for pipelines that ingest documents
continuously (the LLM-data counterpart of the machine-status stream).

Batch twins: vocab_top_terms / lang_source_stats / doc_quality_scores
run the same logic over the lake; these run it over the live stream
with watermarked windows, so a crawl source going bad (gibberish
flood, language drift, boilerplate burst) shows up within a window of
arrival instead of at the next batch rebuild.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import non_space_chars, token_count, tokens


def streaming_trending_terms(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "event_ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    min_count: int = 2,
) -> DataFrame:
    """Tumbling-window token frequencies over a document stream -
    the corpus-drift monitor (a term spiking inside one window =
    boilerplate flood / spam template arriving). Explode to token
    rows, watermarked window count; append mode emits each finalized
    (window, term) exactly once. State is bounded by
    (windows in watermark horizon) x (distinct terms per window) -
    the explode itself is stateless scan work.

    ``min_count`` prunes the singleton tail before it ever leaves the
    aggregation - at 100 TB/day most terms are hapax and dropping
    them in-agg keeps the sink write proportional to the trending
    head, not the vocabulary."""
    toks = docs.select(
        F.col(ts_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    return (
        toks.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select(F.col("window.start").alias("window_start"), "term", "n")
    )


def streaming_source_quality(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    ts_col: str = "event_ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-(window, source) intake quality rollup: doc count, token
    sum, and the integer inputs of the avg-token-length ratio (the
    gibberish signal doc_token_length_outliers fences in batch).
    Sums and counts only - algebraic aggregates, map-side combined;
    one state row per (window, source).

    The char count uses the SAME functions.text.non_space_chars the
    batch fence uses (literal spaces stripped, tabs/newlines
    retained) - a different whitespace definition here would make
    streaming ratios systematically diverge from the batch fences an
    operator compares them against."""
    n_tok = token_count(F.col(text_col))
    non_space = non_space_chars(F.col(text_col))
    return (
        docs.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("n_tokens"),
            F.sum(non_space).alias("n_non_space_chars"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "source",
            "n_docs",
            "n_tokens",
            "n_non_space_chars",
        )
    )
