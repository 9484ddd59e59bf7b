"""Round-14 differential-model sweep (r13 verdict next-round #4):
randomized Python models - written from the reference's rules, not
from the Spark plans - for the three operators whose only coverage
was goldens: rollover_total (reset boundaries, equal counts, zeros),
minute_grid (negative epochs, unaligned ends), sessionize (gap
exactly at the timeout, duplicate timestamps, pre-1970 epochs)."""

from __future__ import annotations

import datetime as dt
import random

from machine_downtime_monitor_on_aws_spark.operators.minute_rollup import (
    minute_grid,
)
from machine_downtime_monitor_on_aws_spark.operators.rollover import (
    rollover_total,
)
from machine_downtime_monitor_on_aws_spark.operators.sessionize import (
    session_stats,
)

UTC = dt.timezone.utc


def _model_rollover(counts: list[int | None]) -> int:
    """MachineDetail.tsx:99-119 verbatim: running max, add it to the
    total whenever the next value dips below it, plus the final max."""
    total = 0
    cur = 0
    for v in counts:
        if v is None:
            continue
        if v > cur:
            cur = v
        elif cur > v:
            total += cur
            cur = v
    return total + cur


def test_rollover_matches_reference_model_randomized(spark):
    rng = random.Random(42)
    rows = []
    want = {}
    for k in range(30):
        key = f"m{k}"
        counts: list[int | None] = []
        v = rng.randint(0, 5)
        for _ in range(rng.randint(1, 40)):
            roll = rng.random()
            if roll < 0.12:
                counts.append(None)  # empty minute
                continue
            if roll < 0.30:
                v = rng.randint(0, 3)  # reset (possibly to 0)
            elif roll < 0.45:
                pass  # plateau: equal value at a potential boundary
            else:
                v += rng.randint(0, 4)
            counts.append(v)
        # planted edges: reset landing EXACTLY on the previous value
        # (no reset - strict comparison) and a 0-valued reset
        counts += [7, 7, 7, 0, 0, 5]
        rows += [(key, i, c) for i, c in enumerate(counts)]
        want[key] = _model_rollover(counts)
    df = spark.createDataFrame(rows, "id string, seq long, cnt int")
    got = {
        r.id: r.total_production
        for r in rollover_total(df, ["id"], ["seq"], "cnt").collect()
    }
    assert got == want


def test_rollover_equal_at_boundary_is_not_a_reset(spark):
    # 5,5 never splits; 9,5,5 splits once at the drop only
    df = spark.createDataFrame(
        [("a", i, c) for i, c in enumerate([5, 5])]
        + [("b", i, c) for i, c in enumerate([9, 5, 5])],
        "id string, seq long, cnt int",
    )
    got = {
        r.id: r.total_production
        for r in rollover_total(df, ["id"], ["seq"], "cnt").collect()
    }
    assert got == {"a": 5, "b": 14}


def _model_grid(start: dt.datetime, end: dt.datetime) -> list[int]:
    """machine-detail.ts:17-25: from start.startOf('minute'), step one
    minute while ``chunkEnd <= endTimestamp`` — only fully-elapsed
    minutes are emitted. Python floordiv floors negatives."""
    m = int(start.timestamp()) // 60 * 60
    e = end.timestamp()
    out = []
    while m + 60 <= e:
        out.append(m)
        m += 60
    return out


def test_minute_grid_matches_model_edges(spark):
    ids = spark.createDataFrame([("m",)], "id string")
    cases = [
        # negative epochs straddling 1970 (floor-vs-trunc divergence)
        (dt.datetime(1969, 12, 31, 23, 57, 30, tzinfo=UTC),
         dt.datetime(1970, 1, 1, 0, 2, 0, tzinfo=UTC)),
        # fully pre-1970, unaligned start AND end
        (dt.datetime(1969, 12, 31, 22, 0, 59, tzinfo=UTC),
         dt.datetime(1969, 12, 31, 22, 5, 1, tzinfo=UTC)),
        # end exactly on a minute boundary: that minute fully elapsed
        (dt.datetime(2026, 3, 8, 6, 58, 0, tzinfo=UTC),
         dt.datetime(2026, 3, 8, 7, 2, 0, tzinfo=UTC)),
        # end mid-minute: the trailing in-progress minute is EXCLUDED
        # (reference loop guard chunkEnd <= endTimestamp)
        (dt.datetime(2026, 3, 8, 6, 58, 20, tzinfo=UTC),
         dt.datetime(2026, 3, 8, 7, 1, 40, tzinfo=UTC)),
        # degenerate: no minute fully elapses -> empty grid
        (dt.datetime(2026, 1, 1, 0, 0, 30, tzinfo=UTC),
         dt.datetime(2026, 1, 1, 0, 0, 45, tzinfo=UTC)),
        # unaligned 1-hour window: exactly 60 fully-elapsed minutes
        (dt.datetime(2026, 5, 4, 9, 17, 42, tzinfo=UTC),
         dt.datetime(2026, 5, 4, 10, 17, 42, tzinfo=UTC)),
    ]
    for start, end in cases:
        got = sorted(
            int(r.minute_start.replace(tzinfo=UTC).timestamp())
            for r in minute_grid(
                ids, start.replace(tzinfo=None), end.replace(tzinfo=None)
            ).collect()
        )
        assert got == _model_grid(start, end), (start, end)


def _model_sessions(ts: list[int], gap: int) -> dict[int, tuple]:
    """Per session id: (start, end, duration, n)."""
    out: dict[int, list[int]] = {}
    sid = 0
    prev = None
    for t in sorted(ts):
        if prev is not None and t - prev > gap:
            sid += 1
        out.setdefault(sid, []).append(t)
        prev = t
    return {
        s: (min(v), max(v), max(v) - min(v), len(v)) for s, v in out.items()
    }


def test_sessionize_matches_model_randomized(spark):
    rng = random.Random(7)
    gap = 300
    rows = []
    want = {}
    for k in range(20):
        key = f"u{k}"
        t = rng.randint(-5000, 5000)  # pre-1970 epochs included
        ts = []
        for _ in range(rng.randint(1, 50)):
            ts.append(t)
            roll = rng.random()
            if roll < 0.15:
                t += gap  # gap EXACTLY at the timeout: same session
            elif roll < 0.25:
                t += gap + 1  # minimal new-session gap
            elif roll < 0.35:
                t += 0  # duplicate timestamp
            else:
                t += rng.randint(1, gap - 1)
        rows += [
            (key, dt.datetime.fromtimestamp(x, tz=UTC).replace(tzinfo=None))
            for x in ts
        ]
        want[key] = _model_sessions(ts, gap)
    df = spark.createDataFrame(rows, "uid string, ts timestamp")
    got: dict[str, dict[int, tuple]] = {}
    for r in session_stats(df, ["uid"], "ts", gap).collect():
        got.setdefault(r.uid, {})[r.session_id] = (
            r.session_start_epoch,
            r.session_end_epoch,
            r.session_duration_seconds,
            r.n_events,
        )
    assert got == want
