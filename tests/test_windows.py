"""Golden window semantics from the reference's query tests
(``source/lambda/data-sources/test/machine-detail.spec.ts`` and
``web-ui/src/views/machines/MachineDetail.tsx``) - FIXTURES.md SS5.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.operators.minute_rollup import (
    minute_chart,
    minute_grid,
    minute_status_rollup,
)
from machine_downtime_monitor_on_aws_spark.operators.rle import (
    change_points,
    run_durations,
)
from machine_downtime_monitor_on_aws_spark.operators.rollover import rollover_total


def _ts(sec: int) -> datetime:
    return datetime.fromtimestamp(1_700_000_000 + sec, tz=timezone.utc).replace(tzinfo=None)


BASE = 1_700_000_000 - (1_700_000_000 % 60)  # minute-aligned


def _aligned(sec: int) -> datetime:
    return datetime.utcfromtimestamp(BASE + sec)


def test_golden_minute_semantics(spark):
    """machine-detail.spec.ts:205-280: 9 status readings at 10s
    cadence - UPx3, IDLE, UPx2, DOWN, UPx2 over 2 minutes =>
    minute 1 = IDLE?? No: chunk 1 latest = IDLE at :30?? Golden:
    minute 1's LAST status in window wins (IDLE arrives at :50),
    minute 2 contains one DOWN => DOWN regardless of later UPs."""
    # minute 1: UP@0 UP@10 UP@20 IDLE@50  -> latest = IDLE
    # minute 2: UP@70 DOWN@80 UP@90 UP@100 -> DOWN poisons
    rows = [
        ("m", _aligned(0), "UP", 0),
        ("m", _aligned(10), "UP", 1),
        ("m", _aligned(20), "UP", 2),
        ("m", _aligned(50), "IDLE", 3),
        ("m", _aligned(70), "UP", 4),
        ("m", _aligned(80), "DOWN", 5),
        ("m", _aligned(90), "UP", 6),
        ("m", _aligned(100), "UP", 7),
    ]
    df = spark.createDataFrame(rows, "id string, ts timestamp, status string, seq long")
    out = {
        int(r.minute_start.timestamp()): r.status
        for r in minute_status_rollup(df, order_col="seq").collect()
    }
    assert out[BASE] == "IDLE"
    assert out[BASE + 60] == "DOWN"


def test_sixty_chunks_per_hour(spark):
    """machine-detail.spec.ts:201: a 1-hour range yields exactly 60
    chunks, empty minutes filled UNKNOWN."""
    df = spark.createDataFrame(
        [("m", _aligned(0), "UP", 0)], "id string, ts timestamp, status string, seq long"
    )
    start, end = _aligned(0), _aligned(3600)
    chart = minute_chart(df, None, start, end, order_col="seq").collect()
    assert len(chart) == 60
    statuses = {int(r.minute_start.timestamp()): r.status for r in chart}
    assert statuses[BASE] == "UP"
    assert all(
        s == "UNKNOWN" for t, s in statuses.items() if t != BASE
    )


def test_minute_grid_excludes_end(spark):
    ids = spark.createDataFrame([("m",)], "id string")
    g = minute_grid(ids, _aligned(0), _aligned(180))
    assert g.count() == 3  # minutes 0,1,2 - not the end boundary


def test_rle_change_points_and_durations(spark):
    """create-quicksight.ts:23-48 semantics: keep first + changed
    rows; duration to next change; last (open) run dropped."""
    rows = [
        ("m", "t", _ts(0), "UP", 0),
        ("m", "t", _ts(10), "UP", 1),     # repeat - compressed away
        ("m", "t", _ts(30), "DOWN", 2),   # change point
        ("m", "t", _ts(45), "DOWN", 3),
        ("m", "t", _ts(100), "UP", 4),    # change point, open run
        ("m2", "t", _ts(5), "DOWN", 5),   # other machine: only row, open run
    ]
    df = spark.createDataFrame(rows, "id string, tag string, ts timestamp, value string, seq long")
    cps = change_points(df, ["id", "tag"], ["ts", "seq"], "value").collect()
    assert {(r.id, int(r.ts.timestamp()) - 1_700_000_000) for r in cps} == {
        ("m", 0),
        ("m", 30),
        ("m", 100),
        ("m2", 5),
    }
    runs = run_durations(df, ["id", "tag"], ["ts", "seq"], "value", "ts").collect()
    got = {(r.id, r.value): r.duration_seconds for r in runs}
    assert got == {("m", "UP"): 30, ("m", "DOWN"): 70}
    # keep_open_runs variant retains the tails with NULL duration
    all_runs = run_durations(
        df, ["id", "tag"], ["ts", "seq"], "value", "ts", keep_open_runs=True
    )
    assert all_runs.count() == 4


def test_rollover_golden(spark):
    """MachineDetail.tsx:104-118 golden: counts 10,11,12,1,1,2,3,4,5
    => total 12 + 5 = 17; None rows skipped."""
    rows = [("m", i, c) for i, c in enumerate([10, 11, 12, None, 1, 1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "id string, seq long, cnt int")
    out = rollover_total(df, ["id"], ["seq"], "cnt").collect()
    assert out[0].total_production == 17


def test_rollover_single_session(spark):
    df = spark.createDataFrame(
        [("m", i, c) for i, c in enumerate([1, 2, 3])], "id string, seq long, cnt int"
    )
    assert rollover_total(df, ["id"], ["seq"], "cnt").collect()[0].total_production == 3
