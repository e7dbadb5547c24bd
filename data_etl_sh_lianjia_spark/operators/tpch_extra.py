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


# ---------------------------------------------------------------------------
# q14_promo_revenue — TPC-H Q14 shape: conditional revenue ratio over a join
# ---------------------------------------------------------------------------


@register(
    "q14_promo_revenue",
    oracle="""
SELECT round(
         100.0 * (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN
                    CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)
                  ELSE 0 END) AS DOUBLE) / 1e6)
         / (CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS DOUBLE) / 1e6),
         6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01'
  AND l_shipdate <  TIMESTAMP '1995-10-01'
""",
    survey_ref="J3,A3,A6",
    doc="TPC-H Q14 shape: promo revenue share — conditional aggregate ratio over a fact-dim join",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum ratio over a lineitem×part join (part broadcasts; one
    month of lineitem survives the pushed-down shipdate band). Both sums go
    through scaled longs so the final two IEEE divisions are bit-identical
    cross-engine."""
    t = _t(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1000000 + F.lit(0.5)
    ).cast("long")
    joined = li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            100.0
            * (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
                    "double"
                )
                / 1e6
            )
            / (F.sum(rev).cast("double") / 1e6),
            6,
        ).alias("promo_pct")
    )


# ---------------------------------------------------------------------------
# q16_notin_distinct — TPC-H Q16 shape: NOT IN (null-aware anti join) +
# multi-key count-distinct
# ---------------------------------------------------------------------------


@register(
    "q16_notin_distinct",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 14, 23, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_size
""",
    survey_ref="J3,A4,A6",
    doc="TPC-H Q16 shape: NOT IN subquery (null-aware anti join) + grouped count-distinct",
)
def q16_notin_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``NOT IN (subquery)`` is not a plain anti join: one NULL in the
    subquery empties the result under SQL three-valued logic, so Spark
    plans a *null-aware* anti join — the executed plan shows
    ``BroadcastHashJoin ... LeftAnti, BuildRight, true`` where the trailing
    flag is ``isNullAwareAntiJoin`` (broadcast-only strategy; a plain
    ``left_anti`` DataFrame join would skip the null check). s_suppkey is
    non-null here, so the result equals NOT EXISTS, but the plan shape
    under test is the null-aware one. Count-distinct over the surviving
    join feeds a two-key group."""
    from data_etl_sh_lianjia_spark.session import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lj_lineitem JOIN lj_part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 14, 23, 45)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM lj_supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_size
"""
    )


# ---------------------------------------------------------------------------
# q19_disjunctive_pred — TPC-H Q19 shape: OR-of-ANDs join predicate bands
# ---------------------------------------------------------------------------


@register(
    "q19_disjunctive_pred",
    oracle=f"""
SELECT COUNT(*) AS n, {oracle_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 35)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 50)
""",
    survey_ref="J3,P5,A3",
    doc="TPC-H Q19 shape: disjunctive (OR-of-ANDs) mixed-table predicate over a join",
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OR-of-ANDs predicate mixes columns from both join sides, so no
    single conjunct pushes below the join — the optimizer instead derives
    per-side prunes from the disjunction (CNF extraction: p_brand IN (...)
    AND p_size <= 50 push to the part scan; l_quantity <= 50 to lineitem)
    and evaluates the full disjunction as the join residual."""
    t = _t(spark, sf_dir, "lineitem", "part")
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey")
    )
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(band).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
    )


# ---------------------------------------------------------------------------
# q15_top_supplier_cte — TPC-H Q15 shape: CTE revenue view + global-max match
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier_cte",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {oracle_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1995-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    survey_ref="J3,A3,A6",
    doc="TPC-H Q15 shape: CTE revenue view joined against its own global MAX",
)
def q15_top_supplier_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A named intermediate (CTE) consumed twice — once as the join input,
    once reduced to a global scalar MAX. Spark evaluates the reused subplan
    twice unless it is explicitly shared; the exact scaled-long revenue
    makes the equality comparison safe (doubles compared for equality would
    be engine-dependent)."""
    t = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1995-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        t["supplier"]
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q4_order_priority — TPC-H Q4 shape: EXISTS-only semi join + priority counts
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    survey_ref="J2,J3,A3",
    doc="TPC-H Q4 shape: orders with a late line item, counted by priority",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS with a correlated non-equi residual → one left-semi join:
    lineitem shuffles on l_orderkey once (orders' date window is pushed to
    its scan first), the lateness predicate evaluates inside the join, and
    the surviving orders fold into a 5-group count. No decorrelated
    re-scan of the fact table."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    window = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    has_late = window.join(
        t["lineitem"].select("l_orderkey", "l_shipdate"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return (
        has_late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q18_large_orders — TPC-H Q18 shape: HAVING-filtered IN subquery + top-k
# ---------------------------------------------------------------------------


@register(
    "q18_large_orders",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, SUM(l_quantity) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 240
      )
GROUP BY c_custkey, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    survey_ref="J3,A3,A6,O3",
    doc="TPC-H Q18 shape: large-volume orders (HAVING > 240) joined back, top-20",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IN-subquery is one hash aggregate on l_orderkey (map-side
    partial, HAVING filter on the aggregate) re-joined as a semi filter;
    the qualified-order set is small (sub-percent of orders) but scales
    with SF, so it carries no forced broadcast hint — the optimizer
    broadcasts below autoBroadcastJoinThreshold and shuffles beyond it
    (the semi join co-partitions with lineitem's l_orderkey shuffle
    either way). Quantities are integral doubles, so
    SUM is exact and the HAVING threshold is engine-stable. Top-20 is
    TakeOrderedAndProject on (o_totalprice DESC, o_orderkey)."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("big_qty"))
        .filter(F.col("big_qty") > 240)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    return (
        t["lineitem"]
        .join(big, F.col("big_ok") == F.col("l_orderkey"), "left_semi")
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )
