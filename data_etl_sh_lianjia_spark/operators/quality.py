"""Data-quality audit operators — SURVEY.md §2.4 J2/J3, §2.9 L6.

Reference parity: the crawler's only integrity mechanism is structural —
every house row is emitted *under* its village with the FK stamped
(lianjia.py:94-99,130,191), and rows whose village page failed still carry
the FK (J2, SURVEY §2.4). A warehouse ingesting those feeds needs the
checks the crawler cannot do: referential integrity over the declared FK
edges and fuzzy duplicate detection over the denormalized name column
(小区 at lianjia.py:129,190 duplicates village.name by value — typo'd
variants split the join).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names=names)


# FK edges of the star schema: (edge label, child, child key, parent, parent key)
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
)


@register(
    "fk_integrity_audit",
    oracle="""
SELECT 'lineitem.l_orderkey->orders' AS edge,
       (SELECT COUNT(*) FROM lineitem) AS n_child,
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders p WHERE p.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'lineitem.l_partkey->part',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem.l_suppkey->supplier',
       (SELECT COUNT(*) FROM lineitem),
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM supplier p WHERE p.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'orders.o_custkey->customer',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders l WHERE NOT EXISTS
          (SELECT 1 FROM customer p WHERE p.c_custkey = l.o_custkey))
UNION ALL
SELECT 'customer.c_nationkey->nation',
       (SELECT COUNT(*) FROM customer),
       (SELECT COUNT(*) FROM customer l WHERE NOT EXISTS
          (SELECT 1 FROM nation p WHERE p.n_nationkey = l.c_nationkey))
UNION ALL
SELECT 'supplier.s_nationkey->nation',
       (SELECT COUNT(*) FROM supplier),
       (SELECT COUNT(*) FROM supplier l WHERE NOT EXISTS
          (SELECT 1 FROM nation p WHERE p.n_nationkey = l.s_nationkey))
""",
    survey_ref="J2,J3,A3",
    doc="referential-integrity audit: orphan counts over every declared FK edge",
)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan detection per FK edge (the dbt-style relationship test, run as
    one query): for each child→parent edge, count child rows whose key has
    no parent — a LEFT ANTI join, the same operator that finds childless
    villages in the reference model (J2). Scale: each anti join broadcasts
    the parent KEY COLUMN only (dims) or shuffle-partitions both sides on
    the key (fact→fact); counts are partial-aggregated, so the audit runs
    in one pass per edge with no row materialization."""
    tables = _t(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "customer", "nation"
    )
    audits = []
    for edge, child, ckey, parent, pkey in _FK_EDGES:
        c = tables[child]
        p = tables[parent].select(pkey)
        orphans = c.join(p, F.col(ckey) == F.col(pkey), "left_anti")
        audits.append(
            c.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            ).select(F.lit(edge).alias("edge"), "n_child", "n_orphans")
        )
    return reduce(DataFrame.unionByName, audits)


@register(
    "fuzzy_match_levenshtein",
    oracle="""
WITH names AS (SELECT DISTINCT p_name FROM part),
a AS (SELECT p_name AS name_a, length(p_name) AS la FROM names),
bx AS (SELECT p_name AS name_b, length(p_name) + off.o AS bucket
       FROM names, (SELECT unnest([-2,-1,0,1,2]) AS o) off)
SELECT name_a, name_b,
       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
FROM a JOIN bx ON la = bucket AND name_a < name_b
WHERE levenshtein(name_a, name_b) <= 2
""",
    survey_ref="J3,L2,F2",
    doc="fuzzy duplicate detection: distinct-name pairs within levenshtein distance 2",
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance blocking for the denormalized-name problem (the
    reference stamps the village name by value onto every house row —
    近-miss variants split joins). Both engines implement classic
    Levenshtein, so the distance is integer-exact. Scale shape: a
    levenshtein distance ≤ 2 forces |len(a) − len(b)| ≤ 2, so one side
    explodes into its 5 admissible length buckets and the pair space is
    an EQUI-join on length (hash-joinable, shuffle-partitionable by
    bucket) instead of an all-pairs nested loop — lossless blocking that
    collapses ~n²/2 candidate pairs to same-length-band pairs only. At
    corpus scale the dedup_* family's LSH buckets remain the coarser
    first-stage path; this is the verify-stage kernel."""
    part = _t(spark, sf_dir, "part")["part"]
    names = part.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"), F.length("p_name").alias("la"))
    bx = names.select(
        F.col("p_name").alias("name_b"),
        F.explode(
            F.array(*[F.length("p_name") + F.lit(o) for o in range(-2, 3)])
        ).alias("bucket"),
    )
    return (
        a.join(
            F.broadcast(bx),
            (F.col("la") == F.col("bucket")) & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .filter(F.col("dist") <= 2)
        .select("name_a", "name_b", "dist")
    )
