"""Envelope decode + config-driven dynamic-schema parse (S2/P1/P2/D2).

The reference probes each incoming record against N MESSAGE_FORMAT
configs until one matches
(``source/lambda/filter-kinesis-stream/machine-data-parser.ts:105-149``).
A record matches a format iff:

- the configured messages key exists and is an array (:108-110);
- EVERY message has non-null, non-blank alias/quality/value/timestamp
  under the configured key names (:113-132);
- every timestamp parses strictly under the format's pattern
  (:134-137);
- every alias splits into >= 2 tokens on the format's delimiter
  (:139-144).

Unmatched records are rejected and skipped, one bad record never
kills the batch (:52-55; ``index.ts:86-90``).

Spark-first realization: key names are *data*, so the parse plan is
built per-format at plan-build time. We parse the payload once into a
VARIANT (semi-structured, Spark 4 native), then evaluate each
format's validity predicate and extraction over that variant with
pure built-ins (``try_variant_get`` / ``forall`` / ``transform`` /
``try_to_timestamp``). First matching format wins via ``coalesce`` -
the reference's ``formats.find(...)`` probe order. No Python UDFs:
everything stays JVM-side and whole-stage-codegen'd, and corrupt
records become NULLs that we route to a rejects output instead of
exceptions (T10).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import MessageFormat
from ..functions.alias import alias_machine_id, alias_tag, alias_token_count

# canonical normalized message schema (long/narrow table, SURVEY.md SS1.1)
NORMALIZED_COLUMNS = (
    "machine_id",
    "tag",
    "alias",
    "value",
    "quality",
    "event_ts",
    "event_epoch",
    "format_id",
)


def decode_payload(df: DataFrame, data_col: str = "data", base64_encoded: bool = True) -> DataFrame:
    """base64 -> utf8 JSON string (machine-data-parser.ts:42-50).

    Invalid input surfaces as NULL, not an exception (T10): Spark's
    ``unbase64`` uses the lenient MIME decoder but still *throws* on
    inputs whose valid-char count leaves a 1-char final unit, so we
    gate the decode behind a strict canonical-base64 predicate -
    non-canonical records are rejects, same as the reference's
    per-record try/catch (index.ts:86-90).
    """
    payload = F.col(data_col)
    if base64_encoded:
        stripped = F.regexp_replace(payload, r"[\r\n]", "")
        canonical = stripped.rlike(r"^[A-Za-z0-9+/]*={0,2}$") & (
            F.length(stripped) % 4 == 0
        )
        payload = F.when(canonical, F.unbase64(stripped).cast("string"))
    return df.withColumn("__json", payload)


def _non_blank(c: Column) -> Column:
    return c.isNotNull() & (F.trim(c) != F.lit(""))


def _try_ts(c: Column, fmt: MessageFormat) -> Column:
    """Strict parse under the format's pattern variants (moment ZZ
    accepts both offset shapes -> possibly two Java patterns; see
    MessageFormat.timestamp_format_variants). First hit wins."""
    variants = fmt.timestamp_format_variants
    if len(variants) == 1:
        return F.try_to_timestamp(c, F.lit(variants[0]))
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(p)) for p in variants])


def _msg_field(msg: Column, key: str) -> Column:
    # try_variant_get renders any JSON scalar as its string form
    # (100 -> '100', true -> 'true'), matching the reference's
    # `${value}` stringification (index.ts:322, convert_parquet.py:131)
    return F.try_variant_get(msg, f"$.{_json_path_escape(key)}", "string")


def _json_path_escape(key: str) -> str:
    # config key names are simple identifiers in practice; guard the
    # path syntax anyway
    if re.fullmatch(r"[A-Za-z0-9_]+", key):
        return key
    return f"['{key}']"


def _format_candidate(v: Column, fmt: MessageFormat) -> tuple[Column, Column]:
    """(valid?, raw extracted messages array) for one format config.

    Extraction pulls only the raw STRINGS (alias/value/quality/raw
    timestamp) out of the variant; everything derivable from them
    (machine_id, tag, parsed timestamp, epoch) moves to
    :func:`explode_messages`, where the Generate node is a
    CollapseProject barrier. Before this split, validity + extraction
    + post-explode field projection collapsed into ONE projection with
    ~255 try_variant_get and 30 try_to_timestamp evaluations per
    record (measured, r2); now a record costs ~2x4 gets and ~2 parses
    pre-explode plus 2 parses post-explode.
    """
    msgs = F.try_variant_get(v, f"$.{_json_path_escape(fmt.messages_key)}", "array<variant>")

    def raw_extract(m: Column) -> Column:
        return F.struct(
            _msg_field(m, fmt.alias_key).alias("alias"),
            _msg_field(m, fmt.value_key).alias("value"),
            _msg_field(m, fmt.quality_key).alias("quality"),
            _msg_field(m, fmt.timestamp_key).alias("ts_raw"),
        )

    raw = F.transform(msgs, raw_extract)

    def msg_valid(e: Column) -> Column:
        return (
            _non_blank(e["alias"])
            & _non_blank(e["quality"])
            & _non_blank(e["value"])
            & _non_blank(e["ts_raw"])
            & _try_ts(e["ts_raw"], fmt).isNotNull()
            & (alias_token_count(e["alias"], fmt.alias_delimiter) >= 2)
        )

    valid = msgs.isNotNull() & (F.size(msgs) >= 0) & F.forall(raw, msg_valid)
    return valid, raw


def parse_envelopes(
    df: DataFrame,
    formats: list[MessageFormat],
    data_col: str = "data",
    base64_encoded: bool = True,
) -> DataFrame:
    """Record-level parse: adds ``format_id`` (matched format or NULL)
    and ``messages`` (array of normalized structs). Does not explode;
    rejected records have NULL format_id (route with
    :func:`split_rejects`)."""
    if not formats:
        raise ValueError("at least one MessageFormat required")
    dec = decode_payload(df, data_col, base64_encoded)
    v = F.try_parse_json(F.col("__json"))
    dec = dec.withColumn("__v", v)

    valid_exprs: list[Column] = []
    msg_exprs: list[Column] = []
    for fmt in formats:
        fmt.validate()
        ok, msgs = _format_candidate(F.col("__v"), fmt)
        valid_exprs.append(F.when(ok, F.lit(fmt.id)))
        msg_exprs.append(F.when(ok, msgs))

    return (
        dec.withColumn("format_id", F.coalesce(*valid_exprs, F.lit(None).cast("string")))
        .withColumn("messages", F.coalesce(*msg_exprs))
        .drop("__json", "__v")
    )


def split_rejects(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(matched, rejected) record DataFrames (T10 error isolation)."""
    return (
        parsed.filter(F.col("format_id").isNotNull()),
        parsed.filter(F.col("format_id").isNull()),
    )


def explode_messages(
    parsed: DataFrame,
    formats: list[MessageFormat],
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Matched records -> one row per tag message (D2,
    convert_parquet.py:187), normalized long schema.

    Alias decomposition and timestamp parsing happen HERE, after the
    explode: the Generate node stops CollapseProject from re-inlining
    them into the variant-probe projection (see _format_candidate).
    Format-specific parameters (timestamp pattern, alias delimiter)
    dispatch on format_id - one cheap CASE branch per configured
    format.

    No ``format_id IS NOT NULL`` pre-filter, and ``explode_outer``
    rather than ``explode``: both record-level filters (an explicit
    one, or the ``size(messages) > 0`` that InferFiltersFromGenerate
    derives for inner explode) contain the full variant probe and get
    predicate-pushed through any upstream repartition into the file
    scan - serializing the whole parse onto the scan's input splits
    (measured: the entire chain ran in a 1-task stage, 6.5 s at sf0.1
    vs 0.9 s distributed). explode_outer is exempt from filter
    inference; the ``m IS NOT NULL`` filter on the *generator output*
    drops unmatched/empty records identically and cannot cross the
    Generate."""
    keep = [F.col(c) for c in (keep_cols or [])]
    ex = parsed.select(
        *keep, F.col("format_id"), F.explode_outer("messages").alias("m")
    ).filter(F.col("m").isNotNull())
    alias = F.col("m.alias")

    def per_fmt(build):
        return F.coalesce(
            *[F.when(F.col("format_id") == F.lit(f.id), build(f)) for f in formats]
        )

    ts = per_fmt(lambda f: _try_ts(F.col("m.ts_raw"), f))
    return ex.select(
        *keep,
        per_fmt(lambda f: alias_machine_id(alias, f.alias_delimiter)).alias("machine_id"),
        per_fmt(lambda f: alias_tag(alias, f.alias_delimiter)).alias("tag"),
        alias.alias("alias"),
        F.col("m.value").alias("value"),
        F.col("m.quality").alias("quality"),
        ts.alias("event_ts"),
        # epoch seconds, floor - moment .unix() (machine-data-parser.ts:78)
        ts.cast("long").alias("event_epoch"),
        F.col("format_id"),
    )


def normalize_stream(
    df: DataFrame,
    formats: list[MessageFormat],
    data_col: str = "data",
    base64_encoded: bool = True,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """decode -> probe formats -> explode: the full S2/P1/P2/D2 chain."""
    return explode_messages(
        parse_envelopes(df, formats, data_col, base64_encoded), formats, keep_cols
    )
