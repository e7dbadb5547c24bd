"""Window-function suite — SURVEY.md §2.6 W1-W3: ranking family, analytic
(lag/lead/first/last/nth), frame aggregates (running sum, moving average).

Determinism: every window ORDER BY carries a unique tiebreaker
(o_orderkey / l_linenumber), and frame sums are DECIMAL-routed so running
totals are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       first_value(o_orderkey) OVER w AS first_order,
       nth_value(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    survey_ref="W2",
    doc="lag/lead/first_value/nth_value over per-customer order history",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@register(
    "window_running",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) OVER w AS DOUBLE) AS running_qty,
       CAST(SUM(CAST(l_quantity AS DECIMAL(30,4)))
              OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
         / COUNT(*) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg3
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    survey_ref="W3",
    doc="running sum + 3-row moving average per supplier (decimal-routed)",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber"), F.col("l_partkey")]
    wrun = (
        Window.partitionBy("l_suppkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wmov = Window.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-2, 0)
    qdec = F.col("l_quantity").cast("decimal(30,4)")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(qdec).over(wrun).cast("double").alias("running_qty"),
        (F.sum(qdec).over(wmov).cast("double") / F.count(F.lit(1)).over(wmov)).alias(
            "moving_avg3"
        ),
    )


@register(
    "window_rank_family",
    oracle="""
SELECT o_orderstatus, o_orderkey,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER (PARTITION BY o_orderstatus
                            ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
""",
    survey_ref="W1",
    doc="rank/dense_rank/ntile/percent_rank/cume_dist per order status",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return orders.select(
        "o_orderstatus",
        "o_orderkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "window_range_interval",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 10000) AS BIGINT) AS value_s
  FROM events WHERE user_id % 25 = 0
)
SELECT user_id, event_id, ts_us,
       CAST(SUM(value_s) OVER (PARTITION BY user_id ORDER BY ts_us
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 10000 AS hour_sum
FROM e
""",
    survey_ref="W3",
    doc="RANGE-frame window: trailing 1-hour per-user sum over event time",
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3's range-frame variant: the frame is bounded by the ORDER BY
    *value* (event-time microseconds), not row offsets — peers with equal
    ts_us share one frame, so the result is tie-order-independent and the
    inner sum uses scaled longs (exact) for the cross-engine hash. Scale:
    per-user partitions, state bounded by the 1-hour window."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    e = ev.filter(F.col("user_id") % 25 == 0).select(
        "user_id",
        "event_id",
        F.expr("ts_ns div 1000").alias("ts_us"),
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias("value_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts_us",
        (F.sum("value_s").over(w).cast("double") / 10000).alias("hour_sum"),
    )


@register(
    "resample_gapfill",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hb,
         CAST(round(value * 10000) AS BIGINT) AS value_s
  FROM events WHERE user_id % 50 = 0
), bounds AS (
  SELECT user_id, MIN(hb) AS lo, MAX(hb) AS hi FROM e GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(lo, hi)) AS hour_bucket FROM bounds
), actual AS (
  SELECT user_id, hb AS hour_bucket, COUNT(*) AS n_events,
         CAST(SUM(value_s) AS DOUBLE) / 10000 AS sum_value
  FROM e GROUP BY user_id, hb
)
SELECT g.user_id, g.hour_bucket,
       coalesce(a.n_events, 0) AS n_events,
       coalesce(a.sum_value, 0.0) AS sum_value
FROM grid g LEFT JOIN actual a
  ON g.user_id = a.user_id AND g.hour_bucket = a.hour_bucket
""",
    survey_ref="W3,J2,F11",
    doc="time-series resample: hourly buckets per user, gap-filled with zeros",
)
def resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample-to-grid with gap filling — the dense-timeline operator
    every time-series engine ships. The grid is generated per key from the
    key's own [min, max] hour range (sequence + explode: a Generate, no
    shuffle beyond the bounds agg) and left-joins the actual per-hour
    aggregates; missing hours surface as explicit zero rows. At 100 TB the
    grid is ~rows_out, never rows_in, and both joins co-partition on
    user_id. Buckets are integer epoch-hours (tz-independent, exact)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    e = ev.filter(F.col("user_id") % 50 == 0).select(
        "user_id",
        F.expr("(ts_ns div 1000) div 3600000000").alias("hb"),
        F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long").alias("value_s"),
    )
    bounds = e.groupBy("user_id").agg(
        F.min("hb").alias("lo"), F.max("hb").alias("hi")
    )
    grid = bounds.select(
        "user_id", F.explode(F.sequence("lo", "hi")).alias("hour_bucket")
    )
    actual = e.groupBy("user_id", F.col("hb").alias("hour_bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("value_s").cast("double") / 10000).alias("sum_value"),
    )
    return grid.join(actual, ["user_id", "hour_bucket"], "left").select(
        "user_id",
        "hour_bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )
