"""Advanced TPC-H query shapes — SURVEY.md §2.4 J3 (subquery joins), §2.5
A3/A6, §2.6 W1: correlated min (Q2), dual-dimension-alias join (Q7),
HAVING-vs-global-scalar (Q11), EXISTS/NOT-EXISTS combination (Q21), scalar
subquery + anti join (Q22).

These exercise subquery decorrelation and multi-way join planning beyond the
q1/q3/q5/q18 shapes already registered. Scale notes per query; dimension
sides broadcast, fact-table scans stay shuffle-partitioned on their join
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_etl_sh_lianjia_spark.functions.deterministic import (
    davg,
    dsum,
    oracle_davg,
    oracle_dsum,
)
from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names=names)


# ---------------------------------------------------------------------------
# q2_min_cost_supplier — TPC-H Q2 shape: correlated MIN subquery
# ---------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle="""
SELECT p_partkey, p_name, s_suppkey, s_name, l_extendedprice AS min_price
FROM (SELECT DISTINCT l_partkey, l_suppkey, l_extendedprice FROM lineitem) l
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size <= 3
  AND l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
""",
    survey_ref="J3,A3,W1",
    doc="TPC-H Q2 shape: cheapest shipment per small part via correlated MIN",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's correlated-min is expressed Spark-first as a window MIN over the
    part key followed by an equality filter — one shuffle on l_partkey, no
    self-join (Catalyst would otherwise decorrelate the subquery into a
    join against a grouped lineitem, scanning the fact table twice). The
    part/supplier dimensions broadcast onto the surviving rows."""
    t = _t(spark, sf_dir, "part", "supplier", "lineitem")
    small_parts = t["part"].filter(F.col("p_size") <= 3)
    w = Window.partitionBy("l_partkey")
    li = (
        t["lineitem"]
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .withColumn("min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .dropDuplicates(["l_partkey", "l_suppkey", "l_extendedprice"])
    )
    return (
        li.join(F.broadcast(small_parts), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "min_price")
    )


# ---------------------------------------------------------------------------
# q7_volume_shipping — TPC-H Q7 shape: same dimension joined twice
# ---------------------------------------------------------------------------

_Q7_NATION_A = "NATION_3"
_Q7_NATION_B = "NATION_7"


@register(
    "q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {oracle_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey  = o_custkey
JOIN supplier ON s_suppkey  = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = '{_Q7_NATION_A}' AND n2.n_name = '{_Q7_NATION_B}')
    OR (n1.n_name = '{_Q7_NATION_B}' AND n2.n_name = '{_Q7_NATION_A}'))
GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS BIGINT)
""",
    survey_ref="J1,J3,A3,F8",
    doc="TPC-H Q7 shape: bidirectional nation pair, nation dim joined twice",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same ``nation`` dimension participates twice under different join
    keys (supplier side and customer side) — the self-alias pattern. Both
    alias instances broadcast; the OR-of-pairs predicate lands after both
    joins so Catalyst can still push each equality into its broadcast."""
    t = _t(spark, sf_dir, "nation", "customer", "supplier", "orders", "lineitem")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == _Q7_NATION_A) & (F.col("cust_nation") == _Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == _Q7_NATION_B) & (F.col("cust_nation") == _Q7_NATION_A)
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["orders"]), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# ---------------------------------------------------------------------------
# q11_top_value_suppliers — TPC-H Q11 shape: HAVING vs global scalar subquery
# ---------------------------------------------------------------------------

_Q11_FRACTION = 0.012


@register(
    "q11_top_value_suppliers",
    oracle=f"""
SELECT l_suppkey,
       {oracle_dsum('l_extendedprice * (1 - l_discount)', 'supp_value')}
FROM lineitem
GROUP BY l_suppkey
HAVING {oracle_dsum('l_extendedprice * (1 - l_discount)', 'x').rsplit(' AS ', 1)[0]} > (
    SELECT {oracle_dsum('l_extendedprice * (1 - l_discount)', 'y').rsplit(' AS ', 1)[0]} * {_Q11_FRACTION}
    FROM lineitem
)
""",
    survey_ref="J3,A3,A6",
    doc="TPC-H Q11 shape: per-supplier value above a global-scalar threshold",
)
def q11_top_value_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global threshold is a one-row aggregate broadcast onto the
    per-supplier aggregate (a cross join of a single row — what Catalyst
    rewrites scalar subqueries into). Both sums are scaled-long exact, and
    the threshold multiply is the same IEEE op in both engines, so the >
    comparison is deterministic cross-engine. At 100 TB both aggregations
    are partial+final over the same scan; Spark reuses the shuffle via
    ReuseExchange when the plans match."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(dsum(value, "supp_value"))
    total = li.agg(dsum(value, "total_value"))
    return (
        per_supp.join(F.broadcast(total))
        .filter(F.col("supp_value") > F.col("total_value") * _Q11_FRACTION)
        .select("l_suppkey", "supp_value")
    )


# ---------------------------------------------------------------------------
# q21_waiting_supplier — TPC-H Q21 shape: EXISTS + NOT EXISTS on the fact table
# ---------------------------------------------------------------------------


@register(
    "q21_waiting_supplier",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey  = l1.l_suppkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
    survey_ref="J3,A3,O3",
    doc="TPC-H Q21 shape: sole late supplier on multi-supplier orders (EXISTS + NOT EXISTS)",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi, NOT EXISTS → left-anti, both with a non-equi
    residual (``l_suppkey <>``). The order date rides along from one
    broadcast orders join, so 'late' is evaluated once and the anti side
    reuses the same frame. At scale all three lineitem legs co-partition
    on l_orderkey: one shuffle each, no cartesian work."""
    t = _t(spark, sf_dir, "orders", "supplier", "lineitem")
    orders_f = t["orders"].filter(F.col("o_orderstatus") == "F")
    base = t["lineitem"].join(
        F.broadcast(orders_f.select("o_orderkey", "o_orderdate")),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    late = base.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    others = t["lineitem"].select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    lone_late = (
        late.join(
            others,
            (F.col("ok2") == F.col("l_orderkey")) & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("ok3") == F.col("l_orderkey")) & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        lone_late.join(
            F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q22_idle_customers — TPC-H Q22 shape: scalar-subquery threshold + anti join
# ---------------------------------------------------------------------------


@register(
    "q22_idle_customers",
    oracle=f"""
SELECT c_nationkey, COUNT(*) AS numcust,
       {oracle_dsum('c_acctbal', 'totacctbal')}
FROM customer
WHERE c_acctbal > (
        SELECT {oracle_davg('c_acctbal', 'a').rsplit(' AS ', 1)[0]}
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""",
    survey_ref="J2,J3,A3,A6",
    doc="TPC-H Q22 shape: above-average-balance customers with no orders (anti join)",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar average (exact scaled-long) broadcast as a one-row frame; the
    NOT EXISTS is a left-anti against the orders key set. At scale the anti
    join shuffles on custkey while the scalar threshold stays a broadcast;
    the customer scan happens twice but column-pruned to one column for
    the average."""
    t = _t(spark, sf_dir, "customer", "orders")
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal", "avg_bal"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
    )
