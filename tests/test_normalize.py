"""Golden parser semantics ported from the reference's test corpus
(``source/lambda/filter-kinesis-stream/test/machine-data-parser.spec.ts``
and ``test/index.spec.ts`` - see FIXTURES.md SS1-3).

Fixtures are constructed in-test per FIXTURES.md; the driver's
synthetic tables cover the relational surface, these cover the
config-driven ingest semantics.
"""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F

from machine_downtime_monitor_on_aws_spark.config import (
    ConfigValidationError,
    MachineConfig,
    MessageFormat,
)
from machine_downtime_monitor_on_aws_spark.operators.classify import (
    classify_messages,
    machine_config_df,
    new_machines,
    reportable_messages,
    to_real_time_rows,
)
from machine_downtime_monitor_on_aws_spark.operators.normalize import (
    normalize_stream,
    parse_envelopes,
    split_rejects,
)

# test-config key names per machine-data-parser.spec.ts:18-28
TEST_FORMAT = MessageFormat(
    id="TESTFMT",
    alias_delimiter="/",
    messages_key="mkn",
    alias_key="akn",
    quality_key="qkn",
    timestamp_key="tkn",
    value_key="vkn",
    timestamp_format="yyyy-MM-dd HH:mm:ss.SSSSSSXXX",
)

TS = "2021-03-05 18:16:10.517000+00:00"
TS_EPOCH = 1614968170  # golden from machine-data-parser.spec.ts (.unix())


def b64(obj) -> str:
    return base64.b64encode(json.dumps(obj).encode()).decode()


def msg(alias, value, ts=TS, quality="GOOD", **extra):
    m = {"akn": alias, "qkn": quality, "tkn": ts, "vkn": value}
    m.update(extra)
    return m


def envelope(*messages) -> str:
    return b64({"mkn": list(messages)})


@pytest.fixture(scope="module")
def configs():
    # fixture mirroring index.spec.ts:46-73: multi-value CSV status
    # lists 'u, true,True, 200' / 'd, false, False, 500' / 'i'
    return [
        MachineConfig(
            id="site/area/proc/m1",
            status_tag="status",
            production_count_tag="pc",
            status_up_values="u, true,True, 200",
            status_down_values="d, false, False, 500",
            status_idle_values="i",
        ),
        MachineConfig(id="site/area/proc/m2"),  # unconfigured
    ]


def _records(spark, *datas):
    return spark.createDataFrame([(i, d) for i, d in enumerate(datas)], "record_id int, data string")


def test_golden_parse(spark):
    """machine-data-parser.spec.ts:258-372: status + production-count
    messages parse to machine_id/tag split, epoch seconds, stringified
    value."""
    df = _records(
        spark,
        envelope(
            msg("site/area/proc/m1/status", "u"),
            msg("site/area/proc/m1/pc", 100),
            msg("site/area/proc/m1/status", True),
        ),
    )
    out = normalize_stream(df, [TEST_FORMAT]).collect()
    assert len(out) == 3
    assert all(r.machine_id == "site/area/proc/m1" for r in out)
    assert [r.tag for r in out] == ["status", "pc", "status"]
    assert [r.value for r in out] == ["u", "100", "true"]
    assert all(r.event_epoch == TS_EPOCH for r in out)
    assert all(r.format_id == "TESTFMT" for r in out)


@pytest.mark.parametrize(
    "bad",
    [
        "!!!not-base64-json",
        b64({"mkn": "notanarray"}),  # messages not an array (:108-110)
        envelope(msg(None, "u")),  # null alias (:113-132)
        envelope(msg("  ", "u")),  # blank alias
        envelope(msg("site/area/proc/m1/status", "u", ts="2021-03-05 18:16:10")),  # ts format mismatch (:134-137)
        envelope(msg("nodelimiter", "u")),  # alias < 2 tokens (:139-144)
        envelope({"akn": "site/a/t", "qkn": "GOOD", "tkn": TS}),  # missing value key
        envelope(msg("site/area/proc/m1/status", "u"), msg(None, "x")),  # ONE bad message rejects the whole record (`every`)
    ],
)
def test_rejection_table(spark, bad):
    """machine-data-parser.spec.ts:162-256: malformed records are
    rejected whole, not partially parsed."""
    parsed = parse_envelopes(_records(spark, bad), [TEST_FORMAT])
    matched, rejected = split_rejects(parsed)
    assert matched.count() == 0
    assert rejected.count() == 1


def test_multi_format_probe(spark):
    """SS1.3: N candidate formats probed in order; first match wins."""
    alt = MessageFormat(
        id="ALT",
        alias_delimiter=".",
        messages_key="data",
        alias_key="tag",
        quality_key="q",
        timestamp_key="t",
        value_key="v",
        timestamp_format="yyyy-MM-dd HH:mm:ss",
    )
    df = _records(
        spark,
        envelope(msg("site/area/proc/m1/status", "u")),
        b64({"data": [{"tag": "plant.line.machine.temp", "q": "GOOD", "t": "2021-03-05 18:16:10", "v": 7}]}),
    )
    out = normalize_stream(df, [TEST_FORMAT, alt])
    rows = {r.format_id: r for r in out.collect()}
    assert set(rows) == {"TESTFMT", "ALT"}
    assert rows["ALT"].machine_id == "plant.line.machine"
    assert rows["ALT"].tag == "temp"
    assert rows["ALT"].value == "7"


def test_classification_golden(spark, configs):
    """index.spec.ts: status CSV mapping incl. boolean/integer values;
    unconfigured machine classifies nothing; unmapped status dropped
    from reportables."""
    df = _records(
        spark,
        envelope(
            msg("site/area/proc/m1/status", "u"),        # UP
            msg("site/area/proc/m1/status", False),      # DOWN ('false' mapped)
            msg("site/area/proc/m1/status", 500),        # DOWN ('500')
            msg("site/area/proc/m1/status", "i"),        # IDLE
            msg("site/area/proc/m1/status", "zzz"),      # unmapped -> dropped
            msg("site/area/proc/m1/pc", 100),            # production count
            msg("site/area/proc/m1/other", "u"),         # not a configured tag
            msg("site/area/proc/m2/status", "u"),        # unconfigured machine
        ),
    )
    messages = normalize_stream(df, [TEST_FORMAT])
    classified = classify_messages(messages, machine_config_df(spark, configs))
    rep = reportable_messages(classified).collect()
    statuses = [r.status for r in rep if r.msg_type == "STATUS"]
    assert sorted(statuses) == ["DOWN", "DOWN", "IDLE", "UP"]
    assert [r.value for r in rep if r.msg_type == "PRODUCTION_COUNT"] == ["100"]
    # values that must NOT be reportable: unmapped, unconfigured tag/machine
    assert len(rep) == 5


def test_real_time_rows_shape(spark, configs):
    """index.ts:76-84: composite key, epoch, ttl, status-enum value."""
    df = _records(spark, envelope(msg("site/area/proc/m1/status", "d"), msg("site/area/proc/m1/pc", 7)))
    messages = normalize_stream(df, [TEST_FORMAT])
    rows = to_real_time_rows(
        reportable_messages(classify_messages(messages, machine_config_df(spark, configs))),
        retention_hours=24,
    ).collect()
    by_type = {r.msg_type: r for r in rows}
    st = by_type["STATUS"]
    assert st.id == "STATUS_site/area/proc/m1"
    assert st.value == "DOWN"
    assert st.message_timestamp == TS_EPOCH
    assert st.ttl_expiration_ts == TS_EPOCH + 24 * 3600
    pc = by_type["PRODUCTION_COUNT"]
    assert pc.id == "PRODUCTION_COUNT_site/area/proc/m1"
    assert pc.value == "7"


def test_new_machine_detection(spark):
    """index.ts:53-56: left-anti against known machines (J2/A2)."""
    msgs = spark.createDataFrame(
        [("m1",), ("m1",), ("m3",)], "machine_id string"
    )
    known = spark.createDataFrame([("m1",), ("m2",)], "machine_id string")
    out = [r.machine_id for r in new_machines(msgs, known).collect()]
    assert out == ["m3"]


def test_config_validation():
    """machine-data-parser.ts:151-196 validation rules."""
    with pytest.raises(ConfigValidationError):
        MessageFormat(messages_key=" ").validate()
    with pytest.raises(ConfigValidationError):
        MachineConfig(id="m", status_tag="status").validate()
    # status tag with at least one value list is fine
    MachineConfig(id="m", status_tag="status", status_up_values="u").validate()
    # no status tag, no lists required
    MachineConfig(id="m").validate()


# ---------------------------------------------------------------------------
# differential fuzz: the full decode -> probe -> explode chain vs an
# independent Python model of the reference's matching rules
# ---------------------------------------------------------------------------

_FUZZ_F1 = MessageFormat(id="F1")
_FUZZ_F2 = MessageFormat(
    id="F2",
    alias_delimiter=".",
    messages_key="batch",
    alias_key="n",
    quality_key="q",
    timestamp_key="t",
    value_key="v",
)
_FUZZ_FMTS = [
    ("F1", "messages", "name", "quality", "timestamp", "value", "/"),
    ("F2", "batch", "n", "q", "t", "v", "."),
]


def _fuzz_stringify(v):
    """try_variant_get(..., "string") semantics, probed empirically:
    scalars stringify (100 -> '100', true -> 'true'), objects/arrays
    render as compact JSON, null -> NULL."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, int):
        return str(v)
    return json.dumps(v, separators=(",", ":"))


def _fuzz_model_ts(s):
    """Strict parse under the XXX/XX variant cascade -> epoch floor."""
    import datetime as dt

    t = s[:-1] + "+00:00" if s.endswith("Z") else s
    try:
        d = dt.datetime.strptime(t, "%Y-%m-%d %H:%M:%S.%f%z")
    except ValueError:
        return None
    return int(d.timestamp())


def _fuzz_model_record(data: str):
    """(format_id|None, exploded rows) per the reference's rules
    (machine-data-parser.ts:105-149), written independently of the
    Spark plan: canonical-b64 gate, JSON parse, first-match format
    probe (messages key is an array; EVERY message has non-null
    non-space-blank alias/quality/value/timestamp; timestamp parses
    strictly; alias splits into >=2 tokens)."""
    import re as _re

    stripped = data.replace("\r", "").replace("\n", "")
    if not (
        _re.fullmatch(r"[A-Za-z0-9+/]*={0,2}", stripped)
        and len(stripped) % 4 == 0
    ):
        return None, []
    try:
        obj = json.loads(base64.b64decode(stripped).decode("utf-8"))
    except Exception:
        return None, []
    for fmt_id, mkey, akey, qkey, tkey, vkey, delim in _FUZZ_FMTS:
        msgs = obj.get(mkey) if isinstance(obj, dict) else None
        if not isinstance(msgs, list):
            continue
        rows, ok = [], True
        for m in msgs:
            def _get(k):
                return _fuzz_stringify(m.get(k)) if isinstance(m, dict) else None

            alias, value = _get(akey), _get(vkey)
            quality, ts_raw = _get(qkey), _get(tkey)
            if any(
                f is None or f.strip(" ") == ""
                for f in (alias, quality, value, ts_raw)
            ):
                ok = False
                break
            ep = _fuzz_model_ts(ts_raw)
            if ep is None:
                ok = False
                break
            toks = alias.split(delim)
            if len(toks) < 2:
                ok = False
                break
            rows.append(
                (delim.join(toks[:-1]), toks[-1], alias, value, quality, ep)
            )
        if ok:
            return fmt_id, rows
    return None, []


@pytest.mark.parametrize("seed", [7, 23])
def test_parse_explode_matches_python_model_random(spark, seed):
    """Differential fuzz of the whole S2/P1/D2 chain: ~120 adversarial
    records per seed (bad base64, non-JSON, wrong shapes, blank/typed/
    nested fields, bad timestamps, 1-token aliases, empty arrays,
    multi-format overlaps) must produce exactly the model's
    format_id per record and exactly the model's exploded message
    rows - and the chain must never throw (T10 totality: every
    record parses XOR rejects)."""
    import random

    rng = random.Random(seed)
    valid_ts = [
        "2021-03-05 18:16:10.517000+00:00",
        "2024-01-02 03:04:05.000001Z",
        "2023-06-07 08:09:10.123456+0200",
    ]
    bad_ts = ["garbage", "2021-03-05", "", "   "]
    f1_alias = ["site/a/m1/TAG", "x/y", "x/"]
    f2_alias = ["plant.m2.TAG", "a.b"]
    bad_alias = ["flat", ""]
    goodq = ["GOOD", "1064", 192, True]
    goodv = ["17.5", 100, True, {"nested": 1}]
    badv = [None, "   ", ""]

    def f1_msg(good=True):
        m = {
            "name": rng.choice(f1_alias),
            "quality": rng.choice(goodq),
            "timestamp": rng.choice(valid_ts),
            "value": rng.choice(goodv),
        }
        if not good:
            kind = rng.randrange(5)
            if kind == 0:
                del m["name"]
            elif kind == 1:
                m["name"] = rng.choice(bad_alias)
            elif kind == 2:
                m["timestamp"] = rng.choice(bad_ts)
            elif kind == 3:
                m["value"] = rng.choice(badv)
            else:
                m["quality"] = "   "
        return m

    def f2_msg():
        return {
            "n": rng.choice(f2_alias),
            "q": rng.choice(goodq),
            "t": rng.choice(valid_ts),
            "v": rng.choice(goodv),
        }

    def gen_record():
        kind = rng.randrange(11)
        if kind == 0:
            return rng.choice(["!!!not-b64!!!", "abc", "a b c d", "====", "AB=A"])
        if kind == 1:
            return base64.b64encode(
                rng.choice([b"hello world", b"{truncated", b""])
            ).decode()
        if kind == 2:
            return b64(rng.choice([42, [1, 2], "str", None]))
        if kind == 3:
            return b64({"foo": 1})
        if kind == 4:
            return b64({"messages": rng.choice([5, {"a": 1}, "x", None])})
        if kind == 5:
            return b64({"messages": []})
        if kind == 6:
            return b64({"messages": [f1_msg() for _ in range(rng.randrange(1, 4))]})
        if kind == 7:
            msgs = [f1_msg() for _ in range(rng.randrange(0, 3))] + [f1_msg(False)]
            rng.shuffle(msgs)
            return b64({"messages": msgs})
        if kind == 8:
            return b64({"batch": [f2_msg() for _ in range(rng.randrange(1, 3))]})
        if kind == 9:
            return b64({"messages": [f1_msg()], "batch": [f2_msg()]})
        return b64({"messages": [f1_msg(False)], "batch": [f2_msg()]})

    records = [(i, gen_record()) for i in range(120)]
    df = spark.createDataFrame(records, "record_id int, data string")
    parsed = parse_envelopes(df, [_FUZZ_F1, _FUZZ_F2])
    matched, rejected = split_rejects(parsed)

    got_fmt = {
        r["record_id"]: r["format_id"]
        for r in parsed.select("record_id", "format_id").collect()
    }
    want_fmt = {i: _fuzz_model_record(d)[0] for i, d in records}
    assert got_fmt == want_fmt
    assert matched.count() + rejected.count() == len(records)

    from machine_downtime_monitor_on_aws_spark.operators.normalize import (
        explode_messages,
    )

    rows = explode_messages(matched, [_FUZZ_F1, _FUZZ_F2], keep_cols=["record_id"])
    got_rows = sorted(
        (
            r["record_id"], r["machine_id"], r["tag"], r["alias"],
            r["value"], r["quality"], r["event_epoch"],
        )
        for r in rows.collect()
    )
    want_rows = sorted(
        (i, *m)
        for i, d in records
        for m in _fuzz_model_record(d)[1]
    )
    assert got_rows == want_rows
