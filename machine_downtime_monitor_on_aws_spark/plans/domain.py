"""Domain queries: the reference's dataflows re-expressed over the
driver's ``events`` table (TESTDATA.md SS8: ``events`` stands in for
``real_time_data`` / ``raw_envelopes`` at bench scale).

Mapping of the events schema onto the machine-monitoring domain:
``user_id`` ≙ machine id, ``ts`` ≙ event timestamp, ``event_type`` ≙
raw status value, ``value`` ≙ production counter. Status
classification (P4) maps ``error -> DOWN``, ``signup -> IDLE``,
everything else ``-> UP``.

Every query pins UTC and uses engine-stable output types (bigint
epochs, decimals) so the DuckDB oracle hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import STATUS_DOWN, STATUS_IDLE, STATUS_UP
from ..operators.latest import latest_by_key
from ..operators.minute_rollup import minute_status_rollup
from ..operators.rle import run_durations, state_durations
from ..operators.rollover import rollover_total
from ..operators.sessionize import session_stats
from ..operators.topk import top_k_per_group
from ..session import pin_utc
from ..tables import load_table
from .catalog import register

# single shared status-mapping expression (P4 over events); built
# lazily - Column construction needs an active SparkContext
def _status_expr():
    return (
        F.when(F.col("event_type") == "error", STATUS_DOWN)
        .when(F.col("event_type") == "signup", STATUS_IDLE)
        .otherwise(STATUS_UP)
    )

_STATUS_SQL = (
    "CASE WHEN event_type = 'error' THEN 'DOWN' "
    "WHEN event_type = 'signup' THEN 'IDLE' ELSE 'UP' END"
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    pin_utc(spark)
    return load_table(spark, sf_dir, "events")


@register(
    "rle_event_runs",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), cps AS (
  SELECT user_id, event_type, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM ordered
  WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS start_epoch,
       CAST(floor(epoch(next_ts)) - floor(epoch(ts)) AS BIGINT) AS duration_seconds
FROM cps
WHERE next_ts IS NOT NULL
""",
)
def rle_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2/W3/J3/J4: run-length encoding + run durations.

    The reference computes this with a GLOBAL row_number + two
    self-joins (create-quicksight.ts:12-49); we use per-key lag/lead
    windows (operators/rle.py) - one shuffle on user_id, fully
    parallel at 100 TB. Open-ended final runs dropped, matching the
    reference's WHERE (create-quicksight.ts:45-48).
    """
    ev = _events(spark, sf_dir)
    runs = run_durations(
        ev, ["user_id"], ["ts", "event_id"], "event_type", "ts"
    )
    return runs.select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("start_epoch"),
        F.col("duration_seconds"),
    )


@register(
    "status_downtime_totals",
    oracle=f"""
WITH mapped AS (
  SELECT user_id, ts, event_id, {_STATUS_SQL} AS status FROM events
), ordered AS (
  SELECT user_id, status, ts, event_id, lag(status) OVER w AS prev
  FROM mapped WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), cps AS (
  SELECT user_id, status, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM ordered WHERE prev IS NULL OR status <> prev
), runs AS (
  SELECT user_id, status,
         CAST(floor(epoch(next_ts)) - floor(epoch(ts)) AS BIGINT) AS duration_seconds
  FROM cps WHERE next_ts IS NOT NULL
)
SELECT user_id,
       CAST(sum(duration_seconds) AS BIGINT) AS total_down_seconds,
       count(*) AS n_down_runs
FROM runs WHERE status = 'DOWN'
GROUP BY user_id
""",
)
def status_downtime_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI downtime dataset (A9/J5): classify -> RLE -> DOWN runs
    -> per-machine downtime totals (create-quicksight.ts:12-49,
    151-189; the reference's config join doubles as the DOWN filter).
    """
    ev = _events(spark, sf_dir).withColumn("status", _status_expr())
    runs = run_durations(ev, ["user_id"], ["ts", "event_id"], "status", "ts")
    return (
        runs.filter(F.col("status") == STATUS_DOWN)
        .groupBy("user_id")
        .agg(
            F.sum("duration_seconds").cast("long").alias("total_down_seconds"),
            F.count(F.lit(1)).alias("n_down_runs"),
        )
    )


@register(
    "state_durations_enriched",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id, lag(event_type) OVER w AS prev
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), cps AS (
  SELECT user_id, event_type, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM ordered WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS start_epoch,
       CAST(CAST(floor(epoch(next_ts)) - floor(epoch(ts)) AS DECIMAL(18,6)) AS DOUBLE) AS duration_seconds_d,
       CAST(CAST(CAST(floor(epoch(next_ts)) - floor(epoch(ts)) AS DECIMAL(18,6)) / 60 AS DECIMAL(18,6)) AS DOUBLE) AS duration_minutes,
       CAST(CAST(CAST(floor(epoch(next_ts)) - floor(epoch(ts)) AS DECIMAL(18,6)) / 3600 AS DECIMAL(18,6)) AS DOUBLE) AS duration_hours
FROM cps WHERE next_ts IS NOT NULL
""",
)
def state_durations_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-shaped duration projection: seconds/minutes/hours as
    DECIMAL (create-quicksight.ts:42-44,125-127)."""
    ev = _events(spark, sf_dir)
    runs = state_durations(ev, ["user_id"], ["ts", "event_id"], "event_type", "ts")
    return runs.select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("start_epoch"),
        F.col("duration_seconds").cast("decimal(18,6)").cast("double").alias("duration_seconds_d"),
        F.col("duration_minutes").cast("double").alias("duration_minutes"),
        F.col("duration_hours").cast("double").alias("duration_hours"),
    )


@register(
    "minute_status_rollup",
    oracle=f"""
WITH s AS (
  SELECT user_id, date_trunc('minute', ts) AS m, ts, event_id,
         {_STATUS_SQL} AS status
  FROM events
), r AS (
  SELECT user_id, m, status,
         row_number() OVER (PARTITION BY user_id, m ORDER BY ts DESC, event_id DESC) AS rn,
         max(CASE WHEN status = 'DOWN' THEN 1 ELSE 0 END) OVER (PARTITION BY user_id, m) AS any_down
  FROM s
)
SELECT user_id, CAST(floor(epoch(m)) AS BIGINT) AS minute_epoch,
       CASE WHEN any_down = 1 THEN 'DOWN' ELSE status END AS status
FROM r WHERE rn = 1
""",
)
def minute_status_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/W4: DOWN-dominant per-minute status rollup
    (machine-detail.ts:31-45): latest status in the minute wins unless
    any DOWN occurred. ``max_by`` alone is wrong - golden semantics
    from machine-detail.spec.ts:271-276."""
    ev = _events(spark, sf_dir).withColumn("status", _status_expr())
    rolled = minute_status_rollup(
        ev, id_col="user_id", ts_col="ts", status_col="status", order_col="event_id"
    )
    return rolled.select(
        F.col("id").alias("user_id"),
        F.col("minute_start").cast("long").alias("minute_epoch"),
        "status",
    )


@register(
    "status_age_seconds",
    oracle=f"""
WITH s AS (
  SELECT user_id, ts, event_id, {_STATUS_SQL} AS status FROM events
), r AS (
  SELECT user_id, status, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM s
), mx AS (SELECT max(ts) AS now_ts FROM events)
SELECT user_id, status,
       CAST(floor(epoch(ts)) AS BIGINT) AS status_epoch,
       CAST(floor(epoch(now_ts)) - floor(epoch(ts)) AS BIGINT) AS status_age_seconds
FROM r, mx WHERE rn = 1
""",
)
def status_age_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 ('DOWN for N minutes'): seconds since each machine's last
    status change, against the corpus max event time as the
    deterministic "now" (live callers pass current_timestamp into
    with_status_age). The now scalar is a 1-row broadcast - no
    cross-partition recompute."""
    from ..operators.latest import with_status_age

    ev = _events(spark, sf_dir).withColumn("status", _status_expr())
    latest = latest_by_key(
        ev, ["user_id"], "ts", ["status"], order_col="event_id"
    ).select("user_id", "status", F.col("ts").cast("long").alias("status_epoch"))
    now = ev.agg(F.max(F.col("ts").cast("long")).alias("__now"))
    aged = with_status_age(
        latest.crossJoin(F.broadcast(now)), F.col("__now"), "status_epoch"
    )
    return aged.select(
        "user_id", "status", "status_epoch",
        F.col("status_age_seconds").cast("long").alias("status_age_seconds"),
    )


@register(
    "latest_status_per_user",
    oracle=f"""
WITH s AS (
  SELECT user_id, ts, event_id, {_STATUS_SQL} AS status FROM events
), r AS (
  SELECT user_id, status, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM s
)
SELECT user_id, status, CAST(floor(epoch(ts)) AS BIGINT) AS last_epoch
FROM r WHERE rn = 1
""",
)
def latest_status_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/T2: latest-status-per-machine materialized view
    (index.ts:146-191). Order-insensitive ``max_by`` - no sort, one
    hash agg with map-side partials (strictly better than the
    reference's per-batch sort, SURVEY.md T5)."""
    ev = _events(spark, sf_dir).withColumn("status", _status_expr())
    latest = latest_by_key(
        ev, ["user_id"], "ts", ["status"], order_col="event_id"
    )
    return latest.select(
        "user_id", "status", F.col("ts").cast("long").alias("last_epoch")
    )


@register(
    "rollover_production_totals",
    oracle="""
WITH pc AS (
  SELECT user_id, ts, event_id, CAST(value AS DECIMAL(18,2)) AS cnt
  FROM events WHERE event_type = 'purchase'
), flagged AS (
  SELECT user_id, cnt, ts, event_id,
         CASE WHEN lag(cnt) OVER w IS NOT NULL AND cnt < lag(cnt) OVER w
              THEN 1 ELSE 0 END AS is_reset
  FROM pc WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, cnt,
         sum(is_reset) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS reset_session
  FROM flagged
), per_session AS (
  SELECT user_id, reset_session, max(cnt) AS session_max
  FROM sessions GROUP BY user_id, reset_session
)
SELECT user_id, CAST(sum(session_max) AS DOUBLE) AS total_production
FROM per_session GROUP BY user_id
""",
)
def rollover_production_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/D4: counter-rollover-aware totals (MachineDetail.tsx:99-119)
    as pure window composition (operators/rollover.py) - no stateful
    UDAF, no driver loop. ``purchase`` events play the production
    counter; DECIMAL casts make sums engine-exact."""
    ev = _events(spark, sf_dir)
    pc = ev.filter(F.col("event_type") == "purchase").withColumn(
        "cnt", F.col("value").cast("decimal(18,2)")
    )
    totals = rollover_total(pc, ["user_id"], ["ts", "event_id"], "cnt")
    return totals.select(
        "user_id",
        F.col("total_production").cast("decimal(28,2)").cast("double").alias("total_production"),
    )


@register(
    "session_stats",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(min(floor(epoch(ts))) AS BIGINT) AS session_start_epoch,
       CAST(max(floor(epoch(ts))) AS BIGINT) AS session_end_epoch,
       CAST(max(floor(epoch(ts))) - min(floor(epoch(ts))) AS BIGINT) AS session_duration_seconds,
       count(*) AS n_events
FROM s GROUP BY user_id, session_id
""",
)
def session_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization (30 min) - extension operator
    (operators/sessionize.py); lag + running-sum windows, one shuffle.
    """
    ev = _events(spark, sf_dir)
    # session gap on whole-second epochs so the oracle matches exactly
    ev = ev.withColumn("ts_sec", F.col("ts").cast("long").cast("timestamp"))
    stats = session_stats(
        ev, ["user_id"], "ts_sec", 1800, order_cols=["ts", "event_id"]
    )
    return stats.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start_epoch",
        "session_end_epoch",
        "session_duration_seconds",
        "n_events",
    )


@register(
    "top3_purchases_per_user",
    oracle="""
WITH p AS (
  SELECT user_id, event_id, CAST(value AS DECIMAL(18,2)) AS amount,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY CAST(value AS DECIMAL(18,2)) DESC, event_id) AS rnk
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id, CAST(amount AS DOUBLE) AS amount, CAST(rnk AS INT) AS rnk
FROM p WHERE rnk <= 3
""",
)
def top3_purchases_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (extension, SURVEY.md SS2.6 notes the reference
    has none): window row_number + filter (operators/topk.py)."""
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").withColumn(
        "amount", F.col("value").cast("decimal(18,2)")
    )
    top = top_k_per_group(
        p, ["user_id"], [F.col("amount").desc(), F.col("event_id").asc()], 3
    )
    return top.select(
        "user_id",
        "event_id",
        F.col("amount").cast("double").alias("amount"),
        F.col("rnk").cast("int").alias("rnk"),
    )


@register(
    "event_type_minute_counts",
    oracle="""
SELECT event_type, CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS minute_epoch,
       count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type, minute_epoch
""",
)
def event_type_minute_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (T8/W4) in batch form: per-type
    per-minute counts and value sums."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            "event_type",
            F.date_trunc("minute", F.col("ts")).cast("long").alias("minute_epoch"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@register(
    "minute_chart_grid",
    oracle=f"""
WITH in_range AS (
  SELECT user_id, ts, event_id, {_STATUS_SQL} AS status
  FROM events
  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-01 02:00:00'
), ids AS (SELECT DISTINCT user_id FROM in_range),
grid AS (
  SELECT user_id, unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                         TIMESTAMP '2024-01-01 01:59:00',
                                         INTERVAL 1 MINUTE)) AS m
  FROM ids
), r AS (
  SELECT user_id, date_trunc('minute', ts) AS m, status,
         row_number() OVER (PARTITION BY user_id, date_trunc('minute', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn,
         max(CASE WHEN status = 'DOWN' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id, date_trunc('minute', ts)) AS any_down
  FROM in_range
), rolled AS (
  SELECT user_id, m, CASE WHEN any_down = 1 THEN 'DOWN' ELSE status END AS status
  FROM r WHERE rn = 1
)
SELECT g.user_id, CAST(floor(epoch(g.m)) AS BIGINT) AS minute_epoch,
       coalesce(rolled.status, 'UNKNOWN') AS status
FROM grid g LEFT JOIN rolled ON rolled.user_id = g.user_id AND rolled.m = g.m
""",
)
def minute_chart_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full SS3.2 detail-chart query: minute grid materialized
    with UNKNOWN-filled empty chunks (J6/W4 + machine-detail.ts:17-25
    grid semantics) over a fixed 2-hour window."""
    from ..operators.minute_rollup import minute_chart

    ev = _events(spark, sf_dir).withColumn("status", _status_expr())
    chart = minute_chart(
        ev,
        None,
        "2024-01-01 00:00:00",
        "2024-01-01 02:00:00",
        id_col="user_id",
        ts_col="ts",
        status_col="status",
        order_col="event_id",
    )
    return chart.select(
        F.col("id").alias("user_id"),
        F.col("minute_start").cast("long").alias("minute_epoch"),
        "status",
    )


@register(
    "downtime_bi_dataset",
    oracle=f"""
WITH mapped AS (
  SELECT user_id AS id, 'state' AS tag, ts, event_id, event_type AS value
  FROM events
), ordered AS (
  SELECT id, tag, value, ts, event_id, lag(value) OVER w AS prev
  FROM mapped WINDOW w AS (PARTITION BY id, tag ORDER BY ts, event_id)
), cps AS (
  SELECT id, tag, value, ts,
         lead(ts) OVER (PARTITION BY id, tag ORDER BY ts, event_id) AS next_ts
  FROM ordered WHERE prev IS NULL OR value <> prev
), durations AS (
  SELECT id, tag, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS start_epoch,
         CAST(floor(epoch(next_ts)) - floor(epoch(ts)) AS BIGINT) AS duration_seconds
  FROM cps WHERE next_ts IS NOT NULL
), config AS (
  SELECT DISTINCT user_id AS id, 'state' AS status_tag, 'error' AS down_value FROM events
), minfo AS (
  SELECT DISTINCT user_id AS id,
         'machine_' || CAST(user_id AS VARCHAR) AS machine_name,
         'loc_' || CAST(user_id % 5 AS VARCHAR) AS location,
         'line_' || CAST(user_id % 3 AS VARCHAR) AS line
  FROM events
)
SELECT d.id, d.value, d.start_epoch, d.duration_seconds,
       m.machine_name, m.location, m.line
FROM durations d
JOIN config c ON c.id = d.id AND c.status_tag = d.tag AND c.down_value = d.value
JOIN minfo m ON m.id = d.id
""",
)
def downtime_bi_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/A9 end-to-end: the QuickSight downtime dataset
    (create-quicksight.ts:151-189) - RLE durations joined with the
    per-down-value config (the join IS the DOWN filter) and machine
    dimensions. Dims derived from the events id space the same way
    both engines."""
    from ..operators.dimensions import downtime_dataset

    ev = _events(spark, sf_dir)
    mapped = ev.select(
        F.col("user_id").alias("id"),
        F.lit("state").alias("tag"),
        "ts",
        "event_id",
        F.col("event_type").alias("value"),
    )
    durations = run_durations(
        mapped, ["id", "tag"], ["ts", "event_id"], "value", "ts"
    ).select(
        "id", "tag", "value",
        F.col("ts").cast("long").alias("start_epoch"),
        "duration_seconds",
    )
    ids = ev.select(F.col("user_id").alias("id")).distinct()
    config = ids.select(
        "id", F.lit("state").alias("status_tag"), F.lit("error").alias("down_value")
    )
    minfo = ids.select(
        "id",
        F.concat(F.lit("machine_"), F.col("id").cast("string")).alias("machine_name"),
        F.concat(F.lit("loc_"), (F.col("id") % 5).cast("string")).alias("location"),
        F.concat(F.lit("line_"), (F.col("id") % 3).cast("string")).alias("line"),
    )
    out = downtime_dataset(durations, config, minfo)
    return out.select(
        "id", "value", "start_epoch", "duration_seconds",
        "machine_name", "location", "line",
    )


@register(
    "line_availability",
    oracle=f"""
WITH latest AS (
  SELECT user_id, status FROM (
    SELECT user_id, {_STATUS_SQL} AS status,
           row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1
)
SELECT 'line_' || CAST(user_id % 3 AS VARCHAR) AS line,
       count(*) FILTER (status IN ('UP','IDLE')) AS n_available,
       count(*) AS n_machines
FROM latest GROUP BY line
""",
)
def line_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (LineRow.tsx:49-52): available (UP or IDLE) vs total machine
    count per line, over the latest-status view."""
    ev = _events(spark, sf_dir).withColumn("status", _status_expr())
    latest = latest_by_key(ev, ["user_id"], "ts", ["status"], order_col="event_id")
    return (
        latest.withColumn(
            "line", F.concat(F.lit("line_"), (F.col("user_id") % 3).cast("string"))
        )
        .groupBy("line")
        .agg(
            F.count(F.when(F.col("status").isin("UP", "IDLE"), 1)).alias("n_available"),
            F.count(F.lit(1)).alias("n_machines"),
        )
    )


@register(
    "latest_event_per_user_type",
    oracle="""
SELECT user_id, event_type, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch
FROM (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
""",
)
def latest_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 (upsert/replace-by-id, Overview.tsx:182-219): dedupe keeping
    the newest row per key - dropDuplicates-keep-latest as an
    order-insensitive max_by aggregation."""
    ev = _events(spark, sf_dir)
    latest = latest_by_key(
        ev, ["user_id", "event_type"], "ts", ["value"], order_col="event_id"
    )
    return latest.select(
        "user_id",
        "event_type",
        F.col("value").cast("decimal(18,2)").cast("double").alias("value"),
        F.col("ts").cast("long").alias("ts_epoch"),
    )


@register(
    "ingest_normalize_classify",
    oracle="""
SELECT 'STATUS_plant/area/cell/m' || CAST(user_id AS VARCHAR) AS id,
       'plant/area/cell/m' || CAST(user_id AS VARCHAR) AS machine_id,
       'STATUS' AS msg_type,
       CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS message_timestamp,
       CAST(floor(epoch(date_trunc('second', ts))) + 86400 AS BIGINT) AS ttl_expiration_ts,
       CASE event_type WHEN 'error' THEN 'DOWN'
                       WHEN 'signup' THEN 'IDLE'
                       ELSE 'UP' END AS value
FROM events
""",
)
def ingest_normalize_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SS3.1 ingest hot path as a catalog entry: synthesize
    base64 envelope records from events rows (Spark-side), then run
    the full decode -> format-probe -> explode -> broadcast-config
    join -> classify -> real-time-row chain.

    The oracle states the END state directly from events (the
    synthesize->encode->decode->parse round-trip must be the
    identity): every event becomes one reportable STATUS row whose
    epoch is the second-truncated ts (the envelope's timestamp string
    has second precision) and whose status maps through the up/down/
    idle lists - so a parse, classify, or TTL bug anywhere in the
    chain breaks the hash.

    Machine configs are synthesized distributively from the distinct
    machine-id set (machine_config_from_ids) - no driver collect."""
    from ..config import MessageFormat
    from ..operators.classify import (
        classify_messages,
        machine_config_from_ids,
        reportable_messages,
        to_real_time_rows,
    )
    from ..operators.normalize import normalize_stream

    ev = _events(spark, sf_dir)
    fmt = MessageFormat(timestamp_format="yyyy-MM-dd HH:mm:ss")
    payload = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.concat(
                        F.lit("plant/area/cell/m"),
                        F.col("user_id").cast("string"),
                        F.lit("/state"),
                    ).alias("name"),
                    F.lit("GOOD").alias("quality"),
                    F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss").alias("timestamp"),
                    F.col("event_type").alias("value"),
                )
            ).alias("messages")
        )
    )
    envelopes = ev.select(
        F.col("event_id").cast("string").alias("record_id"),
        F.base64(payload.cast("binary")).alias("data"),
    ).repartition(spark.sparkContext.defaultParallelism)
    # ^ the variant-probe parse is the CPU-heavy stage; a corpus that
    # arrives in one input split (small local parquet, giant files at
    # scale) would otherwise parse on one core (9.5 s -> ~0.6 s on
    # local[32] at sf0.1). The exchange moves pre-parse envelopes once.
    messages = normalize_stream(envelopes, [fmt], keep_cols=["record_id"])
    machine_ids = ev.select(
        F.concat(
            F.lit("plant/area/cell/m"), F.col("user_id").cast("string")
        ).alias("machine_id")
    ).distinct()
    config = machine_config_from_ids(
        machine_ids,
        status_tag="state",
        up_values=("click", "view", "purchase"),
        down_values=("error",),
        idle_values=("signup",),
    )
    classified = classify_messages(messages, config)
    return to_real_time_rows(reportable_messages(classified))


_RUNS_SQL = f"""
mapped AS (
  SELECT user_id, ts, event_id, {_STATUS_SQL} AS status FROM events
), ordered AS (
  SELECT user_id, status, ts, event_id, lag(status) OVER w AS prev
  FROM mapped WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), cps AS (
  SELECT user_id, status, ts,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM ordered WHERE prev IS NULL OR status <> prev
), runs AS (
  SELECT user_id, status,
         CAST(floor(epoch(next_ts)) - floor(epoch(ts)) AS BIGINT) AS duration_seconds
  FROM cps WHERE next_ts IS NOT NULL
)"""


@register(
    "machine_mtbf_mttr",
    oracle=f"""
WITH {_RUNS_SQL}
SELECT user_id,
       CAST(count(CASE WHEN status = 'DOWN' THEN 1 END) AS BIGINT) AS n_failures,
       CAST(sum(CASE WHEN status = 'DOWN' THEN duration_seconds END) AS BIGINT)
         AS total_down_seconds,
       CAST(sum(CASE WHEN status = 'UP' THEN duration_seconds END) AS DOUBLE)
         / CAST(count(CASE WHEN status = 'UP' THEN 1 END) AS DOUBLE)
         AS mtbf_seconds,
       CAST(sum(CASE WHEN status = 'DOWN' THEN duration_seconds END) AS DOUBLE)
         / CAST(count(CASE WHEN status = 'DOWN' THEN 1 END) AS DOUBLE)
         AS mttr_seconds
FROM runs GROUP BY user_id
""",
)
def machine_mtbf_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability KPIs the downtime monitor's dashboard implies but
    the reference never rolls up (create-quicksight.ts stops at
    per-run durations): per machine, failure count, total downtime,
    MTBF (mean UP-run duration between failures) and MTTR (mean
    DOWN-run duration). One RLE pass (the same user_id-keyed
    lag/lead windows as rle_event_runs - a single shuffle), then a
    conditional aggregation; means are one division of exact integer
    operands, so the whole KPI table is engine-exact. Machines that
    never failed carry NULL mttr (sum over an empty set), never a
    fabricated zero."""
    ev = _events(spark, sf_dir).withColumn("status", _status_expr())
    runs = run_durations(ev, ["user_id"], ["ts", "event_id"], "status", "ts")
    is_down = F.col("status") == STATUS_DOWN
    is_up = F.col("status") == STATUS_UP
    down_sum = F.sum(F.when(is_down, F.col("duration_seconds")))
    down_cnt = F.count(F.when(is_down, F.lit(1)))
    up_sum = F.sum(F.when(is_up, F.col("duration_seconds")))
    up_cnt = F.count(F.when(is_up, F.lit(1)))
    return runs.groupBy("user_id").agg(
        down_cnt.cast("long").alias("n_failures"),
        down_sum.cast("long").alias("total_down_seconds"),
        (up_sum.cast("double") / up_cnt.cast("double")).alias("mtbf_seconds"),
        (down_sum.cast("double") / down_cnt.cast("double")).alias("mttr_seconds"),
    )


@register(
    "downtime_pareto",
    oracle=f"""
WITH {_RUNS_SQL},
per_machine AS (
  SELECT user_id, CAST(sum(duration_seconds) AS BIGINT) AS total_down_seconds
  FROM runs WHERE status = 'DOWN' GROUP BY user_id
),
grand AS (SELECT sum(total_down_seconds) AS g FROM per_machine)
SELECT user_id, total_down_seconds,
       CAST(row_number() OVER o AS INT) AS down_rank,
       CAST(sum(total_down_seconds) OVER (o ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT)
         AS cum_down_seconds,
       CAST(sum(total_down_seconds) OVER (o ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS DOUBLE)
         / CAST((SELECT g FROM grand) AS DOUBLE) AS cum_share
FROM per_machine
WINDOW o AS (ORDER BY total_down_seconds DESC, user_id ASC)
""",
)
def downtime_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto analysis of downtime: machines ranked by total downtime
    with the cumulative share of fleet downtime - 'which 20% of
    machines cause 80% of the outage' is THE maintenance-priority
    question a downtime monitor feeds. Scale shape: the RLE pass and
    per-machine aggregation are keyed on user_id; only the PER-MACHINE
    AGGREGATE rows (fleet cardinality, ~10^5-10^6 at any plausible
    deployment - not event cardinality) enter the single-partition
    ranking window, and the grand total rides a broadcast scalar
    join, not a second pass. Cumulative sums are exact integers; the
    share is one division."""
    ev = _events(spark, sf_dir).withColumn("status", _status_expr())
    runs = run_durations(ev, ["user_id"], ["ts", "event_id"], "status", "ts")
    per_machine = (
        runs.filter(F.col("status") == STATUS_DOWN)
        .groupBy("user_id")
        .agg(F.sum("duration_seconds").cast("long").alias("total_down_seconds"))
    )
    from pyspark.sql import Window

    grand = per_machine.agg(
        F.sum("total_down_seconds").alias("g")
    )
    o = Window.orderBy(F.col("total_down_seconds").desc(), F.col("user_id").asc())
    cum = o.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_machine.withColumn("down_rank", F.row_number().over(o))
        .withColumn(
            "cum_down_seconds", F.sum("total_down_seconds").over(cum).cast("long")
        )
        .crossJoin(F.broadcast(grand))
        .select(
            "user_id",
            "total_down_seconds",
            "down_rank",
            "cum_down_seconds",
            (
                F.col("cum_down_seconds").cast("double")
                / F.col("g").cast("double")
            ).alias("cum_share"),
        )
    )
