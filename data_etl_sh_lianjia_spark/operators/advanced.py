"""Remaining SURVEY.md §2 shapes: paginated-scan expansion (S3), the
label-cell map pivot (P3), correlated scalar subqueries (Catalyst
decorrelation, §4.2), and expression-only TF-IDF (L4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables, reuse_checkpoint


@register(
    "paginated_expansion",
    oracle="""
SELECT o_custkey, n_orders, unnest(generate_series(1, n_pages)) AS page
FROM (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(ceil(COUNT(*) / 10.0) AS BIGINT) AS n_pages
  FROM orders GROUP BY o_custkey
)
""",
    survey_ref="S3,O1,P6,F11,P1",
    doc="paginated-scan expansion: page-count -> sequence -> explode (lianjia.py:113-119)",
)
def paginated_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference reads totalPage from page 1 and enumerates pages
    2..totalPage (`lianjia.py:113-119,173-179`); the engine derives the page
    count and explodes the page range — partition-enumeration as data."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return per_cust.select(
        "o_custkey",
        "n_orders",
        F.explode(
            F.sequence(F.lit(1).cast("bigint"), F.ceil(F.col("n_orders") / 10.0))
        ).alias("page"),
    )


@register(
    "recursive_page_walk",
    oracle="""
WITH RECURSIVE walk(o_custkey, page, total) AS (
  SELECT o_custkey, CAST(1 AS BIGINT), n_pages
  FROM (
    SELECT o_custkey, CAST(ceil(COUNT(*) / 10.0) AS BIGINT) AS n_pages
    FROM orders GROUP BY o_custkey
  )
  UNION ALL
  SELECT o_custkey, page + 1, total FROM walk WHERE page < total
)
SELECT o_custkey, COUNT(*) AS n_pages_walked,
       CAST(MAX(page) AS BIGINT) AS last_page,
       CAST(SUM(page) AS BIGINT) AS page_checksum
FROM walk
GROUP BY o_custkey
""",
    survey_ref="S3,S2,O1,F11",
    doc="recursive-CTE pagination walk: declarative twin of the crawler's self-recursion",
)
def recursive_page_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's pagination is a *self-recursive callback*: page n
    yields the request for page n+1 while ``curPage < totalPage``
    (lianjia.py:53-57,113-119). `paginated_expansion` expresses it as a
    closed-form sequence; this is the faithful declarative twin — a
    RECURSIVE CTE (Spark 4.1 UnionLoop) stepping one page per iteration
    until the bound. Each iteration is a distributed step over all
    cursors at that depth, so the recursion depth is max pages per
    parent, not total pages — the same frontier-parallel shape as
    `sources/frontier.py`'s crawl loop. Identical SQL runs on DuckDB as
    the oracle."""
    from data_etl_sh_lianjia_spark.session import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
WITH RECURSIVE walk(o_custkey, page, total) AS (
  SELECT o_custkey, CAST(1 AS BIGINT), n_pages
  FROM (
    SELECT o_custkey, CAST(ceil(COUNT(*) / 10.0) AS BIGINT) AS n_pages
    FROM lj_orders GROUP BY o_custkey
  )
  UNION ALL
  SELECT o_custkey, page + 1, total FROM walk WHERE page < total
)
SELECT o_custkey, COUNT(*) AS n_pages_walked,
       CAST(MAX(page) AS BIGINT) AS last_page,
       CAST(SUM(page) AS BIGINT) AS page_checksum
FROM walk
GROUP BY o_custkey
""")


@register(
    "map_pivot_labels",
    oracle="""
WITH kv AS (
  SELECT o_orderstatus,
         map_from_entries(list_sort(list(ROW(o_orderpriority, cnt)))) AS prio_map
  FROM (
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY o_orderstatus, o_orderpriority
  )
  GROUP BY o_orderstatus
)
SELECT o_orderstatus,
       element_at(prio_map, '1-URGENT')[1] AS urgent,
       element_at(prio_map, '5-LOW')[1] AS low
FROM kv
""",
    survey_ref="P3,A7,F13",
    doc="label-cell pivot: key->value map + element_at (the XPath li[span=label] pattern)",
)
def map_pivot_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference selects the value cell whose label cell equals a constant
    (`lianjia.py:131-153`); relationally that is map_from_entries over
    (label, value) pairs + element_at lookups."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    kv = counts.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderpriority", "cnt")))
        ).alias("prio_map")
    )
    return kv.select(
        "o_orderstatus",
        F.element_at("prio_map", "1-URGENT").alias("urgent"),
        F.element_at("prio_map", "5-LOW").alias("low"),
    )


@register(
    "correlated_scalar_subquery",
    oracle="""
SELECT c_custkey, c_mktsegment,
       (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order,
       (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
FROM customer
WHERE c_custkey % 53 = 0
""",
    survey_ref="J3,A3 (Catalyst RewriteCorrelatedScalarSubquery)",
    doc="correlated scalar subqueries — decorrelated by Catalyst into joins",
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("customer", "orders"), register=True)
    t["customer"].createOrReplaceTempView("customer_csq")
    t["orders"].createOrReplaceTempView("orders_csq")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               (SELECT MAX(o_totalprice) FROM orders_csq WHERE o_custkey = c_custkey)
                 AS max_order,
               (SELECT COUNT(*) FROM orders_csq WHERE o_custkey = c_custkey)
                 AS n_orders
        FROM customer_csq
        WHERE c_custkey % 53 = 0
        """
    )


@register(
    "tfidf_top_terms",
    oracle="""
WITH tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE doc_id % 19 = 0
  )
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY tok
), n AS (
  SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf
), scored AS (
  SELECT tf.doc_id, tf.tok,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (tok) CROSS JOIN n
)
SELECT doc_id, tok, tfidf
FROM scored
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) <= 3
""",
    survey_ref="L4,A3,A4,W4",
    doc="expression-only TF-IDF, top-3 terms per document (exact, no MLlib)",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"].filter(
        F.col("doc_id") % 19 == 0
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # tf feeds three consumers (df, n_docs, the score join): materialize it
    # once per invocation instead of re-running explode+aggregate per
    # consumer (guide §1.2/§3.3 — plan-subtree reuse, no cross-run state;
    # durability sized to source bytes, see reuse_checkpoint).
    tf = reuse_checkpoint(tf, spark, sf_dir, "documents")
    df = tf.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = tf.select(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
