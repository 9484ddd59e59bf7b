"""Multimodal codec-seam contract and skew-bounded partitioning
(r1 next-round item #9).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    FakeDigestCodec,
    UnavailableCodec,
    extract_features,
    repartition_by_payload,
)


def _media(spark, rows):
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_custom_codec_pluggable(spark):
    class _MimeAwareCodec:
        """Custom MediaCodec implementation: proves the seam accepts
        any conforming object and that mime reaches decode. Defined
        in-function so cloudpickle ships it by value (a test-module
        class would be pickled by reference the executor can't
        import - real codecs live in installed packages)."""

        feature_dim = 2

        def decode(self, payload, mime=None):
            return [float(len(payload or b"")), float(1 if mime == "image/png" else 0)]

    df = _media(
        spark,
        [
            (1, "image", "image/png", bytearray(b"abcd"), 2, 2, None),
            (2, "image", "image/jpeg", bytearray(b"xy"), 2, 2, None),
        ],
    )
    feats = {r.media_id: r.feature for r in extract_features(df, codec=_MimeAwareCodec()).collect()}
    assert feats[1] == [4.0, 1.0]
    assert feats[2] == [2.0, 0.0]


def test_codec_determinism_and_dim(spark):
    codec = FakeDigestCodec(feature_dim=6)
    df = _media(spark, [(1, "image", None, bytearray(b"payload"), None, None, None)])
    out1 = extract_features(df, codec=codec).collect()[0]
    out2 = extract_features(df, codec=codec).collect()[0]
    assert out1.feature == out2.feature and len(out1.feature) == 6
    # pure-python contract check, no Spark: None payload OK
    assert len(codec.decode(None)) == 6


def test_unavailable_codec_raises_through_pipeline(spark):
    df = _media(spark, [(1, "image", None, bytearray(b"x"), None, None, None)])
    with pytest.raises(Exception, match="codecs not available"):
        extract_features(df, codec=UnavailableCodec()).collect()


def test_repartition_bounds_skewed_payloads(spark):
    """100:1 payload skew: partition count must follow total bytes and
    no partition may hold more than target + one max-size payload (a
    single row is unsplittable - that's the floor)."""
    big = bytearray(b"B" * 1_000_000)  # 1 MB
    small = bytearray(b"s" * 10_000)  # 10 KB
    rows = [(0, "video", "video/mp4", big, None, None, 1000)] + [
        (i, "image", "image/png", small, 2, 2, None) for i in range(1, 101)
    ]
    df = _media(spark, rows)
    target = 256 * 1024
    out = repartition_by_payload(df, target_bytes=target)
    total = 1_000_000 + 100 * 10_000
    assert out.rdd.getNumPartitions() == max(1, total // target)

    sizes = (
        out.withColumn("__sz", F.coalesce(F.octet_length("payload"), F.lit(0)))
        .withColumn("__p", F.spark_partition_id())
        .groupBy("__p")
        .agg(F.sum("__sz").alias("bytes"))
        .collect()
    )
    bound = target + 1_000_000
    assert all(r.bytes <= bound for r in sizes), sorted(r.bytes for r in sizes)


def test_repartition_sizes_from_scan_stats_job_free(spark, tmp_path):
    """r5 verdict nit: parquet-backed media frames size their
    repartition from Catalyst scan statistics (file bytes) - no
    sizing job runs - and incompressible payloads make the estimate
    track actual bytes, so the partition count lands within 2x of
    the exact-bytes ideal."""
    import random

    from machine_downtime_monitor_on_aws_spark.operators.similarity import (
        approx_size_bytes,
    )

    rng = random.Random(3)
    rows = [
        (i, "image", "image/png", bytearray(rng.randbytes(100_000)), 2, 2, None)
        for i in range(40)
    ]
    path = str(tmp_path / "media")
    _media(spark, rows).write.parquet(path)
    df = spark.read.parquet(path)

    est = approx_size_bytes(df)
    total = 40 * 100_000
    assert total / 2 <= est <= total * 2  # incompressible ≈ raw

    target = 512 * 1024
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    out = repartition_by_payload(df, target_bytes=target)
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    assert jobs_after == jobs_before  # sizing ran zero jobs
    ideal = total // target
    assert ideal // 2 <= out.rdd.getNumPartitions() <= ideal * 2 + 1


def test_wav_codec_roundtrip_and_guards(spark):
    """WavPcmCodec parses real RIFF/WAVE bytes: encode->decode
    roundtrips the exact integer features; malformed containers fail
    loudly; odd-sized chunks honor RIFF even-padding; missing
    payloads yield the zero row."""
    import struct

    import pytest

    from machine_downtime_monitor_on_aws_spark.operators.multimodal import (
        WavPcmCodec,
        encode_wav_pcm16,
    )

    codec = WavPcmCodec()
    samples = [0, 100, -32768, 32767, -1]
    wav = encode_wav_pcm16(samples, 8000)
    assert codec.decode(wav) == [
        8000.0, 5.0, -32768.0, 32767.0,
        float(sum(samples)), float(sum(s * s for s in samples)),
    ]

    assert codec.decode(None) == [0.0] * 6
    with pytest.raises(ValueError, match="RIFF"):
        codec.decode(b"JUNK" + wav[4:])
    # float-format WAV (format code 3) must be rejected, not misread
    bad_fmt = bytearray(wav)
    struct.pack_into("<H", bad_fmt, 20, 3)
    with pytest.raises(ValueError, match="16-bit PCM"):
        codec.decode(bytes(bad_fmt))

    # an odd-sized pre-chunk must be skipped WITH its pad byte: build
    # RIFF with a 3-byte 'junk' chunk before fmt/data
    body = wav[12:]
    odd = b"RIFF" + struct.pack("<I", 4 + 8 + 3 + 1 + len(body)) + b"WAVE"
    odd += b"junk" + struct.pack("<I", 3) + b"abc\x00" + body
    assert codec.decode(odd) == codec.decode(wav)


def test_wav_codec_multichannel_frames():
    """n_frames divides interleaved samples by channel count; sums
    cover every channel's samples."""
    from machine_downtime_monitor_on_aws_spark.operators.multimodal import (
        WavPcmCodec,
        encode_wav_pcm16,
    )

    inter = [1, -1, 2, -2, 3, -3]  # 3 stereo frames
    wav = encode_wav_pcm16(inter, 16000, n_channels=2)
    got = WavPcmCodec().decode(wav)
    assert got == [16000.0, 3.0, -3.0, 3.0, 0.0, float(sum(s * s for s in inter))]


def test_ppm_codec_roundtrip_and_guards():
    """PpmImageCodec parses real P6 bytes: header comments and
    arbitrary whitespace are skipped per the netpbm spec; features
    are the exact channel integers; malformed containers fail
    loudly."""
    import pytest

    from machine_downtime_monitor_on_aws_spark.operators.multimodal import (
        PpmImageCodec,
        encode_ppm_p6,
    )

    codec = PpmImageCodec()
    # 2x2 image, bytes 0..11
    rgb = bytes(range(12))
    ppm = encode_ppm_p6(2, 2, rgb)
    got = codec.decode(ppm)
    assert got == [
        2.0, 2.0, 0.0, 11.0,
        float(0 + 3 + 6 + 9), float(1 + 4 + 7 + 10), float(2 + 5 + 8 + 11),
        float(sum(b * b for b in rgb)),
    ]

    # weird-but-legal header: multiple comments, tabs/CRLF separators
    hairy = b"P6\t# c1\n#c2\n 2\r\n#between\n2 \n255\n" + rgb
    assert codec.decode(hairy) == got

    assert codec.decode(None) == [0.0] * 8
    with pytest.raises(ValueError, match="P6"):
        codec.decode(b"P5\n2 2\n255\n" + rgb)
    with pytest.raises(ValueError, match="maxval"):
        codec.decode(b"P6\n2 2\n65535\n" + rgb)
    with pytest.raises(ValueError, match="truncated"):
        codec.decode(ppm[:-1])
    # raster byte that LOOKS like whitespace must not be eaten: first
    # raster byte 0x0A (newline) — exactly one separator is consumed
    raster = bytes([0x0A]) + rgb[1:]
    got_nl = codec.decode(b"P6\n2 2\n255\n" + raster)
    assert got_nl == [
        2.0, 2.0, float(min(raster)), float(max(raster)),
        float(sum(raster[0::3])), float(sum(raster[1::3])),
        float(sum(raster[2::3])), float(sum(b * b for b in raster)),
    ]


def test_y4m_parse_and_frame_sampling(spark):
    """parse_y4m walks FRAME markers with exact 4:2:0 plane sizes —
    a chroma-skip bug would corrupt frame 1+'s luma; sample_video_frames
    keeps every 2nd frame with exact integer luma stats."""
    import pytest

    from machine_downtime_monitor_on_aws_spark.operators.multimodal import (
        encode_y4m,
        parse_y4m,
        sample_video_frames,
    )

    w, h = 4, 2
    cw, ch = w // 2, h // 2
    frames = []
    for f in range(4):
        y = bytes((f * 50 + i) % 256 for i in range(w * h))
        u = bytes((f + i) % 256 for i in range(cw * ch))
        v = bytes((f * 2 + i) % 256 for i in range(cw * ch))
        frames.append((y, u, v))
    clip = encode_y4m(w, h, frames)

    pw, ph, planes = parse_y4m(clip)
    assert (pw, ph) == (w, h)
    assert planes == [fr[0] for fr in frames]

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        parse_y4m(b"JUNK\n" + clip)
    with pytest.raises(ValueError, match="4:2:0"):
        parse_y4m(clip.replace(b"C420jpeg", b"C444jpeg"))
    with pytest.raises(ValueError, match="truncated"):
        parse_y4m(clip[:-1])
    # C param absent -> 420jpeg default per the y4m spec
    assert parse_y4m(clip.replace(b" C420jpeg", b""))[2] == planes

    df = spark.createDataFrame([(7, bytearray(clip))], "media_id long, payload binary")
    out = {r["frame_idx"]: r for r in sample_video_frames(df, every_n=2).collect()}
    assert sorted(out) == [0, 2]
    for f in (0, 2):
        y = frames[f][0]
        r = out[f]
        assert (r["width"], r["height"]) == (w, h)
        assert (r["min_luma"], r["max_luma"]) == (min(y), max(y))
        assert (r["sum_luma"], r["sum_sq_luma"]) == (
            sum(y), sum(b * b for b in y),
        )
