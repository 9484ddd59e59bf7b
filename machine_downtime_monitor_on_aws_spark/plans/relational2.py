"""Extended relational surface: pivot, cube, set ops, exact
percentiles, moving-window frames, as-of and range joins, approximate
aggregates.

None of these exist in the reference (SURVEY.md notes the gaps in
SS2.4/SS2.6/SS2.7); they complete the engine's general-purpose
surface. Oracle-exactness tactics as elsewhere: decimal money,
bigint epochs, identical interpolation formulas for percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward
from ..operators.range_join import range_join_window
from ..session import pin_utc
from ..tables import load_table
from .catalog import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_utc(spark)
    return load_table(spark, sf_dir, name)


@register(
    "pivot_event_type_counts",
    oracle="""
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id
""",
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (explicit = single pass, no
    distinct-values pre-query - the scale-safe form)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


@register(
    "orders_status_priority_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def orders_status_priority_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with grouping flags (reference has no grouping sets,
    SURVEY.md SS2.4)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "customer_segment_setops",
    oracle="""
WITH building AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     machinery AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY')
SELECT 'both' AS which, c_nationkey FROM (SELECT * FROM building INTERSECT SELECT * FROM machinery)
UNION ALL
SELECT 'building_only' AS which, c_nationkey FROM (SELECT * FROM building EXCEPT SELECT * FROM machinery)
""",
)
def customer_segment_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one plan (SURVEY.md SS2.7:
    absent from the reference, native here)."""
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    both = building.intersect(machinery).select(
        F.lit("both").alias("which"), "c_nationkey"
    )
    # subtract = EXCEPT DISTINCT (exceptAll is multiset difference and
    # would keep keys that appear more often in building than machinery)
    only = building.subtract(machinery).select(
        F.lit("building_only").alias("which"), "c_nationkey"
    )
    return both.unionAll(only)


@register(
    "price_percentiles_by_flag",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99
FROM lineitem GROUP BY l_returnflag
""",
)
def price_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation - Spark `percentile`
    and DuckDB `quantile_cont` share the formula, so doubles match
    bit-for-bit). The approximate variant for 100 TB is
    approx_percentiles_by_flag (rows-only check)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_extendedprice"), F.lit(0.5)).alias("p50"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.9)).alias("p90"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.99)).alias("p99"),
    )


@register("approx_distinct_and_percentiles", oracle=None)
def approx_distinct_and_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates (HLL++ / KLL): the 100 TB substitutes for
    exact distinct/percentile. No SQL oracle (sketches are
    implementation-defined) -> driver rows-only check; the exact
    twins above are the correctness anchors."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx(F.col("l_extendedprice"), F.lit(0.5), F.lit(10000)).alias(
            "approx_p50"
        ),
    )


@register(
    "purchase_moving_sum",
    oracle="""
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,2)))
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv_sum_7,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS mv_n
FROM events WHERE event_type = 'purchase'
""",
)
def purchase_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAME spec (rows between) - the reference never uses
    frames (SURVEY.md SS2.5); exact decimal moving sums."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("mv_sum_7"),
        F.count(F.lit(1)).over(w).alias("mv_n"),
    )


@register(
    "asof_last_purchase_before_error",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END AS pv,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('purchase', 'error')
), carried AS (
  SELECT user_id, ts, event_id, event_type,
         last_value(pv IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, side, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS asof_value
  FROM tagged
)
SELECT user_id, event_id, CAST(asof_value AS DOUBLE) AS asof_value
FROM carried WHERE event_type = 'error'
""",
)
def asof_last_purchase_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, non-strict on ts with purchase-first tie
    order): for every error event, the user's most recent purchase
    amount. Union + ignore-nulls-last window (operators/asof.py) -
    one shuffle, no pandas."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("pv"),
    )
    joined = asof_join_backward(
        errors, purchases, ["user_id"], "ts", ["pv"], strict=False,
        tiebreak_col="event_id",
    )
    return joined.select(
        "user_id", "event_id", F.col("asof_pv").cast("double").alias("asof_value")
    )


@register(
    "error_context_counts",
    oracle="""
SELECT e.user_id, e.event_id,
       count(*) AS n_nearby,
       CAST(min(o.event_id) AS BIGINT) AS first_nearby_event
FROM events e
JOIN events o
  ON o.user_id = e.user_id
 AND floor(epoch(o.ts)) BETWEEN floor(epoch(e.ts)) - 300 AND floor(epoch(e.ts)) + 300
WHERE e.event_type = 'error'
GROUP BY e.user_id, e.event_id
""",
)
def error_context_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events within +-5 min of each error, same user.
    Bucketed formulation (operators/range_join.py): quantize to 300 s
    buckets, explode the probe to adjacent buckets, equi-join, exact
    filter - a plain shuffled equi-join instead of a per-key
    nested-loop."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    others = ev.select("user_id", "ts", F.col("event_id").alias("o_event_id"))
    joined = range_join_window(errors, others, ["user_id"], "ts", "ts", 300)
    return joined.groupBy("user_id", "event_id").agg(
        F.count(F.lit(1)).alias("n_nearby"),
        F.min("o_event_id").cast("long").alias("first_nearby_event"),
    )


@register(
    "orders_above_customer_avg",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(o_totalprice AS DOUBLE) AS total_price,
       CAST((SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
             FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS DOUBLE) AS cust_total,
       (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) AS n_orders
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(18,2))
        * (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      > (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
         FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
""",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (orders above their customer's
    average spend), written in SQL so Catalyst's decorrelation rewrite
    is what executes: each subquery becomes an aggregate + broadcast
    join, not a per-row probe (plan-verified). Three subqueries =
    three aggregates over orders; a hand-fused form (one
    groupBy(custkey).agg(sum, count) + one join) halves the scans and
    is what a hot-path pipeline should write - this entry
    deliberately keeps the subquery formulation to pin the optimizer
    behavior. The above-average predicate is stated
    multiplicatively (price * n > sum) so the comparison stays in
    exact decimals - a decimal `avg` rounds differently per engine
    (DuckDB averages decimals in double)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql("""
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS total_price,
               CAST((SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                     FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey) AS DOUBLE)
                 AS cust_total,
               (SELECT count(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
                 AS n_orders
        FROM orders_v o
        WHERE CAST(o_totalprice AS DECIMAL(18,2))
                * (SELECT count(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
              > (SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                 FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey)
    """)


@register(
    "daily_clicks_purchases_full_join",
    oracle="""
WITH c AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n_clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
p AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT coalesce(c.day, p.day) AS day,
       coalesce(n_clicks, 0) AS n_clicks,
       coalesce(n_purchases, 0) AS n_purchases
FROM c FULL OUTER JOIN p ON c.day = p.day
""",
)
def daily_clicks_purchases_full_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL OUTER join of two daily aggregates (days with clicks but
    no purchases and vice versa both survive). Aggregate-then-join:
    the join sides are day-cardinality, so the full-outer shuffle is
    tiny regardless of event volume."""
    ev = _t(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(day)
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    return (
        c.join(p, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


_BIN_SQL = (
    "CASE WHEN CAST(o_totalprice AS DOUBLE) < 0.0 THEN 0 "
    "WHEN CAST(o_totalprice AS DOUBLE) >= 600000.0 THEN 25 "
    "ELSE CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000.0) AS INT) + 1 END"
)


@register(
    "price_histogram",
    oracle=f"""
SELECT {_BIN_SQL} AS bucket,
       count(*) AS n_orders,
       CAST(min(o_totalprice) AS DOUBLE) AS min_price,
       CAST(max(o_totalprice) AS DOUBLE) AS max_price
FROM orders GROUP BY 1
""",
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (24 bins over [0, 600k), under/overflow
    bins 0/25 - width_bucket semantics, written as explicit floor
    arithmetic because DuckDB has no width_bucket): binning is a
    scan-level expression + one count aggregation (the OLAP histogram
    shape; data-driven bounds would need a min/max pre-pass)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.expr(_BIN_SQL).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )


@register(
    "lineitem_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) AS g_flag,
       CAST(grouping(l_linestatus) AS INT) AS g_status,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
)
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two independent rollups in ONE scan +
    one expanded aggregation - the cube/rollup generalization; running
    two groupBys would scan twice)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS n_items,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """)


@register(
    "purchase_outliers_iqr",
    oracle="""
WITH q AS (
  SELECT quantile_cont(CAST(value AS DOUBLE), 0.25) AS p25,
         quantile_cont(CAST(value AS DOUBLE), 0.75) AS p75
  FROM events WHERE event_type = 'purchase'
)
SELECT e.user_id, e.event_id, CAST(e.value AS DOUBLE) AS value,
       p75 + 1.5 * (p75 - p25) AS upper_fence
FROM events e, q
WHERE e.event_type = 'purchase'
  AND CAST(e.value AS DOUBLE) > p75 + 1.5 * (p75 - p25)
""",
)
def purchase_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier detection (Tukey fence): exact percentiles (the
    interpolation formula is engine-identical, proven by
    price_percentiles_by_flag) -> one scalar fence broadcast back
    over the stream. Two passes over purchases, no window over the
    full data. The anomaly-filter step of a data-cleaning pipeline;
    stddev-based z-scores are deliberately avoided - distributed
    variance is not bit-reproducible across engines."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    v = F.col("value").cast("double")
    q = ev.agg(
        F.percentile(v, F.lit(0.25)).alias("p25"),
        F.percentile(v, F.lit(0.75)).alias("p75"),
    )
    fence = (F.col("p75") + 1.5 * (F.col("p75") - F.col("p25"))).alias("upper_fence")
    return (
        ev.crossJoin(F.broadcast(q.select(fence)))
        .filter(v > F.col("upper_fence"))
        .select("user_id", "event_id", v.alias("value"), "upper_fence")
    )


@register(
    "returnflag_priority_mix",
    oracle="""
SELECT l.l_returnflag,
       count(*) AS n_lines,
       count(*) FILTER (o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS n_high_priority,
       count(DISTINCT l.l_orderkey) AS n_orders
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_returnflag
""",
)
def returnflag_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape on the synthetic schema: line items by return
    flag with the high-priority split - conditional aggregation after
    a fact-to-fact join. orders joins lineitem on its key; both sides
    shuffle once on l_orderkey (at this SF AQE demotes to broadcast;
    at 100 TB the co-located-bucket layout in sources/lake applies).
    Integer counts only - oracle-exact for free."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            # count(when(...)) not sum(cast): an all-NULL priority
            # group would make the sum NULL where the oracle's
            # count(*) FILTER yields 0
            F.count(F.when(high, F.lit(1))).alias("n_high_priority"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@register(
    "top_returned_revenue_customers",
    oracle="""
WITH rev AS (
  SELECT o.o_custkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2))
             AS DECIMAL(18,4))) AS rev_d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey
),
top AS (SELECT * FROM rev ORDER BY rev_d DESC, o_custkey LIMIT 20)
SELECT t.o_custkey AS custkey, c.c_name, CAST(t.rev_d AS DOUBLE) AS revenue
FROM top t JOIN customer c ON c.c_custkey = t.o_custkey
""",
)
def top_returned_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned line items per
    customer, top 20. Revenue accumulates in DECIMAL (exact, partial-
    agg-order independent) and the top-k ranks on the decimal with an
    id tiebreak, so the cutoff is engine-identical; the double cast
    happens only at output. orderBy+limit after aggregation is a
    TakeOrdered over customer-cardinality rows, never a global sort
    of the fact table; the 20-row result then broadcast-joins the
    customer dimension for display names."""
    from .relational import _disc_price

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(_disc_price()).alias("rev_d"))
    )
    top = rev.orderBy(F.col("rev_d").desc(), F.col("o_custkey")).limit(20)
    return (
        top.join(F.broadcast(c), top["o_custkey"] == c["c_custkey"])
        .select(
            F.col("o_custkey").alias("custkey"),
            "c_name",
            F.col("rev_d").cast("double").alias("revenue"),
        )
    )
