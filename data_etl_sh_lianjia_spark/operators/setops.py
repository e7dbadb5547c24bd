"""Set operations + the reference's two-branch union — SURVEY.md §2.7 O2/O4/O5.

``union_discriminator`` re-expresses the reference crawler's core output
shape: two callback branches emit the same logical schema with disjoint
optional fields plus a status discriminator (for-sale at
``house_spider/spiders/lianjia.py:121-159`` vs sold at ``lianjia.py:181-218``,
tag column 状态 at ``lianjia.py:155,215``) and are unioned by name with
missing columns null-filled — exactly ``unionByName(allowMissingColumns)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables


@register(
    "union_discriminator",
    oracle="""
SELECT o_orderkey, o_totalprice AS open_price, NULL::DOUBLE AS closed_price,
       'open' AS status
FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey, NULL::DOUBLE AS open_price, o_totalprice AS closed_price,
       'closed' AS status
FROM orders WHERE o_orderstatus = 'F'
""",
    survey_ref="O2",
    doc="two-branch union with disjoint optional columns + discriminator tag",
)
def union_discriminator(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    open_branch = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.col("o_totalprice").alias("open_price"),
        F.lit("open").alias("status"),
    )
    closed_branch = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        F.col("o_totalprice").alias("closed_price"),
        F.lit("closed").alias("status"),
    )
    return open_branch.unionByName(closed_branch, allowMissingColumns=True).select(
        "o_orderkey", "open_price", "closed_price", "status"
    )


@register(
    "intersect_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
    survey_ref="O4",
    doc="INTERSECT (distinct) of customer vs supplier nation keys",
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("customer", "supplier"))
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "except_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
    survey_ref="O4",
    doc="EXCEPT (distinct): nations with customers but no suppliers",
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("customer", "supplier"))
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .subtract(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "dedup_first_per_key",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM lineitem
QUALIFY row_number() OVER (PARTITION BY l_orderkey
                           ORDER BY l_linenumber, l_partkey, l_suppkey) = 1
""",
    survey_ref="O5",
    doc="deterministic dedup: first line per order via row_number (not dropDuplicates)",
)
def dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference relies on request-fingerprint dedup (settings.py:97-101 /
    Scrapy RFPDupeFilter). ``dropDuplicates`` keeps an arbitrary row, which
    can never hash-match an oracle — the engine's dedup is therefore always
    expressed as row_number()=1 over an explicit deterministic order."""
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    # (.., l_partkey, l_suppkey) is; the full key makes the pick deterministic.
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_suppkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    )


@register(
    "except_all_multiset",
    oracle="""
SELECT c_nationkey AS nationkey
FROM customer WHERE c_custkey % 10 = 0
EXCEPT ALL
SELECT s_nationkey FROM supplier
""",
    survey_ref="O4",
    doc="EXCEPT ALL: bag difference preserving multiplicities (customer minus supplier nations)",
)
def except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4's multiset variant: ``exceptAll`` subtracts per-value
    multiplicities (a value appearing 5 times left and 2 right survives 3
    times) — Spark plans it as one aggregate computing count deltas plus a
    generate, a single shuffle; no row-identity needed, so it
    hash-matches as a sorted bag."""
    t = load_tables(spark, sf_dir, names=("customer", "supplier"))
    return (
        t["customer"]
        .filter(F.col("c_custkey") % 10 == 0)
        .select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "intersect_all_multiset",
    oracle="""
SELECT c_nationkey AS nationkey
FROM customer WHERE c_custkey % 10 = 0
INTERSECT ALL
SELECT s_nationkey FROM supplier
""",
    survey_ref="O4",
    doc="INTERSECT ALL: bag intersection with min-multiplicity semantics",
)
def intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("customer", "supplier"))
    return (
        t["customer"]
        .filter(F.col("c_custkey") % 10 == 0)
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersectAll(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )
