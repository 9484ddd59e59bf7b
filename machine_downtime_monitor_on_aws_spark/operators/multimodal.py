"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (BASELINE.json north-star surface).

The Spark-side machinery here is real and tested - schemas, Arrow
batch shapes, ``mapInPandas`` signatures, partition sizing - while
the codec step is a deterministic stub (`decode_image` raises
NotImplementedError unless `fake=True`): the image/audio libraries
are not in this container, and at 100 TB the engineering risk is the
dataflow (binary skew, batch memory), not the pixel math.

Design notes for scale:
- binary payloads ride the same rows as their metadata; size-based
  repartitioning (`repartition_by_payload`) keeps Arrow batches
  bounded so one 4K video doesn't OOM a task;
- feature extraction is ``mapInPandas`` (iterator form) so a batch is
  processed streaming-wise without materializing the whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, digest string, feature array<double>"
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Codec stub. Real decode needs PIL/ffmpeg (not in container).

    ``fake=True`` yields a deterministic 8-dim pseudo-feature from the
    payload digest so the full pipeline is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image/audio codecs not available in this environment; "
            "pass fake=True for the deterministic test feature"
        )
    d = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Iterator-of-batches signature: each Arrow batch becomes a pandas
    DataFrame; output rows stream back batch-by-batch.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "digest": payloads.map(
                        lambda p: hashlib.md5(p or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda p: decode_image(p, fake=fake)),
                }
            )

    return df.mapInPandas(op, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (the decode of each frame is the stubbed step). Pure
    built-ins: sequence over the clip duration."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )


def repartition_by_payload(df: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Size-aware repartition: estimates partition count from total
    payload bytes so Arrow batches stay within executor memory. At
    100 TB this is the difference between a smooth map stage and
    OOM-retry churn on the skewed tail."""
    total = df.select(
        F.sum(F.coalesce(F.octet_length("payload"), F.lit(0)))
    ).collect()[0][0] or 0
    n = max(1, int(total / target_bytes))
    return df.repartition(n)
