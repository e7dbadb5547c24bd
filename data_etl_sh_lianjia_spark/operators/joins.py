"""Join matrix — SURVEY.md §2.4 J1-J4: inner/left/right/full/semi/anti/cross,
theta (range) join, and an as-of join over event time.

Scale notes: every dimension side is broadcast (no fact shuffle); the theta
join broadcasts the tiny band table through a nested-loop join (the only
physical option for non-equi predicates — keep the broadcast side tiny);
the as-of join is expressed as a window over (user, time) so Spark plans a
single shuffle on the partition key instead of a range cross-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_etl_sh_lianjia_spark.functions.deterministic import dsum, oracle_dsum
from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names=names)


@register(
    "join_left_outer",
    oracle=f"""
SELECT c_custkey, c_nationkey,
       COUNT(o_orderkey) AS n_orders,
       {oracle_dsum('o_totalprice', 'sum_price')}
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_nationkey
""",
    survey_ref="J2,J3",
    doc="LEFT OUTER customer->orders keeping order-less customers (J2 semantics)",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


@register(
    "join_right_outer",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n,
       COUNT(c_custkey) AS n_matched,
       {oracle_dsum('o_totalprice', 'sum_price')}
FROM customer RIGHT JOIN orders ON c_custkey = o_custkey
GROUP BY o_orderstatus
""",
    survey_ref="J3",
    doc="RIGHT OUTER join (all orders kept, customer side nullable)",
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "right")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("c_custkey").alias("n_matched"),
            dsum("o_totalprice", "sum_price"),
        )
    )


@register(
    "join_full_outer",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
SELECT COALESCE(c.nk, s.nk) AS nationkey, n_cust, n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
    survey_ref="J3",
    doc="FULL OUTER join of per-nation customer vs supplier counts",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "supplier")
    c = t["customer"].groupBy(F.col("c_nationkey").alias("c_nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = t["supplier"].groupBy(F.col("s_nationkey").alias("s_nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return c.join(s, F.col("c_nk") == F.col("s_nk"), "full").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"), "n_cust", "n_supp"
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
""",
    survey_ref="J3",
    doc="LEFT SEMI: customers having at least one finished order (EXISTS)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    fin = t["orders"].filter(F.col("o_orderstatus") == "F")
    return (
        t["customer"]
        .join(fin, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    survey_ref="J2,J3",
    doc="LEFT ANTI: customers with zero orders (NOT EXISTS; childless-village analog)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_cross",
    oracle="""
SELECT r_name, s_suppkey, s_acctbal
FROM region CROSS JOIN supplier
""",
    survey_ref="J3",
    doc="CROSS JOIN of two tiny dimensions (5 x 10 rows)",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "region", "supplier")
    return t["region"].crossJoin(t["supplier"]).select("r_name", "s_suppkey", "s_acctbal")


_BANDS = [
    ("low", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("high", 150_000.0, 1e12),
]


@register(
    "join_theta_band",
    oracle=f"""
SELECT band, COUNT(*) AS n, {oracle_dsum('o_totalprice', 'sum_price')}
FROM orders
JOIN (VALUES ('low', 0.0, 50000.0),
             ('mid', 50000.0, 150000.0),
             ('high', 150000.0, 1e12)) AS bands(band, lo, hi)
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
""",
    survey_ref="J3",
    doc="theta (range-predicate) join against a broadcast band table",
)
def join_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (
        t["orders"]
        .join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price"))
    )


@register(
    "join_asof_event",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
)
SELECT event_id, user_id, ts_us, prior_click_us
FROM (
  SELECT event_id, user_id, event_type, ts_us,
         last_value(CASE WHEN event_type = 'click' THEN ts_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_click_us
  FROM e
)
WHERE event_type = 'purchase'
""",
    survey_ref="J4,W2",
    doc="as-of join: latest prior 'click' time for every 'purchase', per user",
)
def join_asof_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join expressed as an ignore-nulls last() window — one shuffle on
    user_id instead of a range cross-join (SURVEY.md §2.4 J4)."""
    ev = _t(spark, sf_dir, "events")["events"].select(
        "user_id", "event_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.last(
        F.when(F.col("event_type") == "click", F.col("ts_us")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("prior_click_us", prior)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts_us", "prior_click_us")
    )


@register(
    "lateral_join_topn",
    oracle="""
SELECT r.r_name, n.n_name, n.n_suppliers
FROM region r,
     LATERAL (
       SELECT n_name, COUNT(s_suppkey) AS n_suppliers
       FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
       WHERE n_regionkey = r.r_regionkey
       GROUP BY n_name
       ORDER BY n_suppliers DESC, n_name
       LIMIT 2
     ) n
""",
    survey_ref="J3,A3,O3,W4",
    doc="correlated LATERAL subquery: per-region top-2 nations by supplier count",
)
def lateral_join_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LATERAL correlated-subquery join (SQL:1999 lateral derived
    table, Spark 3.2+): each outer row drives an ordered-and-limited inner
    query — the declarative form of per-key top-N. Catalyst decorrelates
    it into a join + per-key window rather than re-executing the subquery
    per row (`DecorrelateInnerQuery`), so it scales like window_rank, not
    like a nested loop."""
    from data_etl_sh_lianjia_spark.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT r.r_name, n.n_name, n.n_suppliers
FROM lj_region r,
     LATERAL (
       SELECT n_name, COUNT(s_suppkey) AS n_suppliers
       FROM lj_nation LEFT JOIN lj_supplier ON s_nationkey = n_nationkey
       WHERE n_regionkey = r.r_regionkey
       GROUP BY n_name
       ORDER BY n_suppliers DESC, n_name
       LIMIT 2
     ) n
"""
    )
