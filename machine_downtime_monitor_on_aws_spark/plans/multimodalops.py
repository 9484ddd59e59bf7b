"""Multimodal pipeline query: binary payloads through the
``mapInPandas`` feature-extraction path, hash-checked end to end.

Payloads are synthesized from ``documents.text`` (cast to binary =
UTF-8 bytes), so the FakeDigestCodec's md5-derived features are
reproducible in DuckDB exactly: byte j of md5(payload) rebuilt from
hex digits, divided by 255.0 (a single rounding - engine-identical).
This puts the Arrow/mapInPandas plumbing itself under the oracle:
a batching, schema, or codec-contract bug breaks the hash, not just
a unit test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features
from ..session import pin_utc
from ..tables import load_table
from .catalog import register

_FEATURE_DIM = 8

_KIND_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
    "ELSE 'video' END"
)


def _feature_cols_sql() -> str:
    cols = []
    for j in range(_FEATURE_DIM):
        hi = f"instr('0123456789abcdef', substring(md5(text), {2 * j + 1}, 1)) - 1"
        lo = f"instr('0123456789abcdef', substring(md5(text), {2 * j + 2}, 1)) - 1"
        cols.append(f"(({hi}) * 16 + ({lo})) / 255.0 AS f{j}")
    return ", ".join(cols)


@register(
    "multimodal_payload_features",
    oracle=f"""
SELECT doc_id AS media_id,
       {_KIND_SQL} AS kind,
       CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
       md5(text) AS digest,
       {_feature_cols_sql()}
FROM documents
""",
)
def multimodal_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas feature extraction (FakeDigestCodec)
    with the feature vector flattened to columns. The payloads are
    documents' UTF-8 bytes, so byte counts, digests, and features all
    carry an exact DuckDB oracle - the Arrow batch path itself is
    hash-verified. (A real image/audio codec plugs into the same
    MediaCodec seam; see operators/multimodal.py.)"""
    pin_utc(spark)
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.expr(
            "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
            "ELSE 'video' END"
        ).alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
    )
    feats = extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "digest",
        *[F.col("feature")[j].alias(f"f{j}") for j in range(_FEATURE_DIM)],
    )


@register(
    "video_frame_samples",
    oracle=f"""
WITH media AS (
  SELECT doc_id AS media_id, {_KIND_SQL} AS kind,
         CAST(n_chars * 10 AS INT) AS duration_ms
  FROM documents
)
SELECT media_id, CAST(unnest(range(0, duration_ms, 1000)) AS INT) AS frame_ms
FROM media WHERE kind = 'video'
""",
)
def video_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (operators/multimodal
    frame_sample_plan): one row per sampled timestamp, sequence over
    the clip duration - pure built-ins, each clip expands
    independently (no shuffle). The frame DECODE is the stubbed codec
    step; the sampling dataflow is what runs at scale and is
    oracle-checked here."""
    from ..operators.multimodal import frame_sample_plan

    pin_utc(spark)
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.expr(_KIND_SQL).alias("kind"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000).select(
        "media_id", F.col("frame_ms").cast("int").alias("frame_ms")
    )
