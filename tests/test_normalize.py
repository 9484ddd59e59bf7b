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
