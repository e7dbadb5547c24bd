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


# ---------------------------------------------------------------------------
# Declarative data-quality expectations (SURVEY.md §2.9 L6 [derived]) — the
# CHECK-constraint / expectation-suite surface a training-data pipeline runs
# at ingest (Delta constraints, Great Expectations, dbt tests). Semantics
# follow SQL CHECK: a rule only FAILS a row when it evaluates FALSE — NULL
# passes (unknown is not a violation); pair a domain rule with an explicit
# IS NOT NULL rule to reject nulls. All row-local rules evaluate in ONE
# scan (a struct of flags, never one pass per rule — at 100 TB the rule
# count must not multiply the I/O).
# ---------------------------------------------------------------------------

def expectations_flags(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """``df`` plus one boolean ``ok_<rule>`` column per rule (TRUE/NULL =
    pass, FALSE = violation) — the single-scan building block the report
    and the quarantine split share."""
    out = df
    for rule_name, expr in rules.items():
        out = out.withColumn(f"ok_{rule_name}", F.expr(expr))
    return out


def expectations_report(df: DataFrame, rules: dict[str, str]) -> DataFrame:
    """Per-rule violation report in ONE scan: (rule, n_rows, n_violations,
    n_unknown). A row violates when the rule is FALSE; NULL counts as
    unknown (SQL CHECK semantics). No rules -> empty report (matching
    _bad_flag's documented nothing-is-bad empty-suite behavior), never an
    invalid ``stack(0,)`` expression."""
    if not rules:
        return df.sparkSession.createDataFrame(
            [], "rule string, n_rows bigint, n_violations bigint, n_unknown bigint"
        )
    flagged = expectations_flags(df, rules)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for rule_name in rules:
        c = F.col(f"ok_{rule_name}")
        aggs.append(
            F.sum(F.when(~F.coalesce(c, F.lit(True)), 1).otherwise(0)).alias(
                f"viol_{rule_name}"
            )
        )
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(
                f"unk_{rule_name}"
            )
        )
    wide = flagged.agg(*aggs)
    stacked = wide.selectExpr(
        "n_rows",
        "stack({n}, {args}) AS (rule, n_violations, n_unknown)".format(
            n=len(rules),
            args=", ".join(
                f"'{r}', viol_{r}, unk_{r}" for r in rules
            ),
        ),
    )
    return stacked.select("rule", "n_rows", "n_violations", "n_unknown")


def _bad_flag(rules: dict[str, str]):
    """The combined violation flag over expectations_flags columns: TRUE
    when ANY rule evaluates FALSE (NULL passes — SQL CHECK). The single
    definition both the quarantine split and the per-status report use, so
    the two surfaces can never diverge on the semantics. No rules →
    nothing is bad (F.lit(False) initializer, not a reduce() crash)."""
    return reduce(
        lambda a, b: a | b,
        [
            ~F.coalesce(F.col(f"ok_{r}"), F.lit(True))
            for r in rules
        ],
        F.lit(False),
    )


def split_quarantine(
    df: DataFrame, rules: dict[str, str]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) partition of ``df``: a row quarantines when ANY
    rule evaluates FALSE (NULL passes — SQL CHECK). The two sides are a
    partition by construction: the same combined flag, negated once."""
    flagged = expectations_flags(df, rules)
    bad = _bad_flag(rules)
    keep = [c for c in df.columns]
    return (
        flagged.filter(~bad).select(*keep),
        flagged.filter(bad).select(*keep),
    )


# Spark/DuckDB rule-expression pairs: identical strings wherever the SQL
# dialects agree; RLIKE vs regexp_matches spelled per engine.
_ORDER_RULES_SPARK = {
    "orderkey_not_null": "o_orderkey IS NOT NULL",
    "totalprice_positive": "o_totalprice > 0",
    "status_domain": "o_orderstatus IN ('F', 'O', 'P')",
    "priority_format": "o_orderpriority RLIKE '^[1-5]-'",
}
_ORDER_RULES_DUCK = {
    **_ORDER_RULES_SPARK,
    "priority_format": "regexp_matches(o_orderpriority, '^[1-5]-')",
}


def _duck_report_sql(rules: dict[str, str]) -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{r}' AS rule, COUNT(*) AS n_rows,\n"
        f"       CAST(SUM(CASE WHEN NOT COALESCE(({expr}), TRUE) THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,\n"
        f"       CAST(SUM(CASE WHEN ({expr}) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown\n"
        f"FROM orders"
        for r, expr in rules.items()
    )
    return arms


@register(
    "expectations_report_orders",
    oracle=f"""
{_duck_report_sql(_ORDER_RULES_DUCK)}
UNION ALL
SELECT 'orderkey_unique', COUNT(*),
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(0 AS BIGINT)
FROM (SELECT o_orderkey, COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)
""",
    survey_ref="L6,A3,A6",
    doc="declarative expectation suite: per-rule violation report in one scan",
)
def expectations_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK-constraint expectation suite over orders: four row-local rules
    evaluated in a single scan (struct-of-flags — the plan carries ONE
    parquet Scan for all four) plus a uniqueness expectation (one hash
    aggregate over the key). [derived] — the reference crawler has no
    validation layer; this is the ingest gate a 100 TB pipeline runs."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    report = expectations_report(orders, _ORDER_RULES_SPARK)
    uniq = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(
            F.lit("orderkey_unique").alias("rule"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias(
                "n_violations"
            ),
            F.lit(0).cast("long").alias("n_unknown"),
        )
    )
    return report.unionByName(uniq)


@register(
    "quarantine_orders",
    oracle="""
WITH flagged AS (
  SELECT *,
         (NOT COALESCE(o_orderkey IS NOT NULL, TRUE))
      OR (NOT COALESCE(o_totalprice > 0, TRUE))
      OR (NOT COALESCE(o_orderstatus IN ('F', 'O', 'P'), TRUE))
      OR (NOT COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'), TRUE))
         AS bad
  FROM orders
)
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN NOT bad THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined
FROM flagged
GROUP BY o_orderstatus
""",
    survey_ref="L6,A3",
    doc="expectation-gated quarantine split: valid/quarantined per status",
)
def quarantine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine split under the same rule suite: rows failing ANY rule
    route to the quarantine side (the bad-shard path a training pipeline
    keeps for triage), everything else is the clean feed. Both sides come
    from one flagged scan; the result counts each per status so the oracle
    can prove the split is an exact partition."""
    orders = _t(spark, sf_dir, "orders")["orders"]
    flagged = expectations_flags(orders, _ORDER_RULES_SPARK)
    bad = _bad_flag(_ORDER_RULES_SPARK)
    return flagged.groupBy("o_orderstatus").agg(
        F.sum(F.when(~bad, 1).otherwise(0)).alias("n_valid"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("n_quarantined"),
    )
