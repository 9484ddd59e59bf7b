"""Dimension export + downtime dataset (J5/D3) against FIXTURES.md
SS4/SS7 shapes, and the full SS3.3 batch path end-to-end."""

from __future__ import annotations

from datetime import datetime

from machine_downtime_monitor_on_aws_spark.config import UIReferenceMapping
from machine_downtime_monitor_on_aws_spark.operators.dimensions import (
    downtime_dataset,
    machine_config_information,
    machine_information,
)
from machine_downtime_monitor_on_aws_spark.operators.rle import state_durations


def test_machine_information(spark):
    ui = spark.createDataFrame(
        [
            ("siteA/area1/line7/m1", "MACHINE", "Press 1"),
            ("siteA/area1/line7/m2", "MACHINE", None),  # name defaults to id
            ("siteA/area1", "LOCATION", "Site A"),  # filtered out (P6)
        ],
        "id string, type string, name string",
    )
    out = {
        r.id: r
        for r in machine_information(ui, UIReferenceMapping("0/1", "2")).collect()
    }
    assert set(out) == {"siteA/area1/line7/m1", "siteA/area1/line7/m2"}
    m1 = out["siteA/area1/line7/m1"]
    assert m1.machine_name == "Press 1"
    assert m1.location == "siteA/area1"  # tokens 0,1 rejoined (D3)
    assert m1.line == "line7"  # token 2
    assert out["siteA/area1/line7/m2"].machine_name == "siteA/area1/line7/m2"


def test_machine_config_information_explodes_down_values(spark):
    cfg = spark.createDataFrame(
        [
            ("m1", "status", "d, false, False, 500"),
            ("m2", "status", None),  # no down values -> absent
            ("m3", None, "d"),  # no status tag -> absent
        ],
        "id string, status_tag string, status_down_values string",
    )
    rows = machine_config_information(cfg).collect()
    assert {(r.id, r.down_value) for r in rows} == {
        ("m1", "d"),
        ("m1", "false"),
        ("m1", "False"),
        ("m1", "500"),
    }


def test_downtime_dataset_join_filters_to_down(spark):
    """The config join doubles as the DOWN filter
    (create-quicksight.ts:151-189)."""

    def ts(s):
        return datetime(2021, 3, 5, 18, 0, s)

    lake = spark.createDataFrame(
        [
            ("m1", "status", ts(0), "u", 0),
            ("m1", "status", ts(10), "d", 1),   # DOWN run, 20s
            ("m1", "status", ts(30), "u", 2),   # back up (open run, dropped)
            ("m1", "temp", ts(0), "d", 3),      # wrong tag - excluded by join
            ("m2", "status", ts(0), "d", 4),    # machine without config - excluded
        ],
        "id string, tag string, ts timestamp, value string, seq long",
    )
    durations = state_durations(lake, ["id", "tag"], ["ts", "seq"], "value", "ts")
    cfg_info = machine_config_information(
        spark.createDataFrame(
            [("m1", "status", "d")],
            "id string, status_tag string, status_down_values string",
        )
    )
    minfo = machine_information(
        spark.createDataFrame(
            [("m1", "MACHINE", "Press")], "id string, type string, name string"
        ),
        UIReferenceMapping("0", "0"),
    )
    rows = downtime_dataset(durations, cfg_info, minfo).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id, r.value, r.duration_seconds, r.machine_name) == ("m1", "d", 20, "Press")
    assert float(r.duration_minutes) == 20 / 60 or str(r.duration_minutes).startswith("0.333")


def test_multimodal_plumbing(spark):
    from machine_downtime_monitor_on_aws_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        frame_sample_plan,
    )

    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNGdata"), 4, 4, None),
        (2, "video", "video/mp4", bytearray(b"mp4data"), 16, 16, 3500),
        (3, "image", "image/png", None, None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in extract_features(df, fake=True).collect()}
    assert feats[1].n_bytes == 8 and len(feats[1].feature) == 8
    assert feats[3].n_bytes == 0  # null payload handled
    assert all(0.0 <= x <= 1.0 for x in feats[2].feature)
    # deterministic: same payload -> same digest/feature
    feats2 = {r.media_id: r for r in extract_features(df, fake=True).collect()}
    assert feats2[1].digest == feats[1].digest

    frames = frame_sample_plan(df, every_ms=1000).collect()
    assert [f.frame_ms for f in frames] == [0, 1000, 2000, 3000]

    import pytest as _pytest

    from machine_downtime_monitor_on_aws_spark.operators.multimodal import decode_image

    with _pytest.raises(NotImplementedError):
        decode_image(b"x", fake=False)
