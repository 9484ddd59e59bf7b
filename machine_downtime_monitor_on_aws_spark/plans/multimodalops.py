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


@register(
    "wav_pcm_features",
    oracle="""
WITH s AS (
  -- fixed-span series + filter: this DuckDB build rejects lateral
  -- column parameters in generate_series
  SELECT doc_id, ((doc_id * 31 + t.i * 7) % 65536) - 32768 AS samp
  FROM documents, generate_series(0, 98) t(i)
  WHERE t.i < 50 + doc_id % 50
)
SELECT doc_id AS media_id,
       CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
       CAST(count(*) AS INT) AS n_samples,
       CAST(min(samp) AS INT) AS min_sample,
       CAST(max(samp) AS INT) AS max_sample,
       CAST(sum(samp) AS BIGINT) AS sum_samples,
       CAST(sum(samp * samp) AS BIGINT) AS sum_sq
FROM s GROUP BY doc_id
""",
)
def wav_pcm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL codec through the MediaCodec seam (r6 verdict
    next-round #7 - no more md5 stand-in): deterministic PCM clips
    are synthesized per document (sample i of doc d is
    ((d*31 + i*7) mod 65536) - 32768, 50-99 samples, 8/12/16 kHz),
    packed into genuine RIFF/WAVE containers (encode_wav_pcm16), and
    DECODED BACK by WavPcmCodec's byte-level RIFF parser inside
    mapInPandas - chunk walk, fmt validation, little-endian int16
    unpack. The oracle recomputes the summary features straight from
    the sample formula and never sees a WAV byte, so any
    header-offset / endianness / padding bug in the parser breaks
    the hash. Scale shape: synthesis and decode are one
    Arrow-batched pass each, no shuffle until the final projection
    (and none there either) - payload bytes never leave their
    partition."""
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import WavPcmCodec, encode_wav_pcm16

    pin_utc(spark)
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.lit("audio/wav").alias("mime"),
        (F.lit(50) + F.col("doc_id") % 50).cast("int").alias("n_samples"),
        (F.lit(8000) + (F.col("doc_id") % 3) * 4000)
        .cast("int")
        .alias("sample_rate"),
    )

    def synth(batches):
        for pdf in batches:
            payloads = []
            for mid, n, rate in zip(
                pdf["media_id"], pdf["n_samples"], pdf["sample_rate"]
            ):
                i = np.arange(int(n), dtype=np.int64)
                samples = (int(mid) * 31 + i * 7) % 65536 - 32768
                payloads.append(encode_wav_pcm16(samples, int(rate)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "mime": pdf["mime"],
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(
        synth, "media_id long, kind string, mime string, payload binary"
    )
    feats = extract_features(media, codec=WavPcmCodec())
    f = F.col("feature")
    return feats.select(
        "media_id",
        f[0].cast("int").alias("sample_rate"),
        f[1].cast("int").alias("n_samples"),
        f[2].cast("int").alias("min_sample"),
        f[3].cast("int").alias("max_sample"),
        f[4].cast("long").alias("sum_samples"),
        f[5].cast("long").alias("sum_sq"),
    )
