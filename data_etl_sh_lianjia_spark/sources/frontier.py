"""Iterative crawl-frontier dataflow — SURVEY.md §2.1 S2/S3, §4.3.

The reference's core control flow is an 8-callback fan-out DAG with
pagination self-loops (`lianjia.py:29-218`): each callback receives a page
and yields child requests; Scrapy's fingerprint dedup bounds the frontier
(`settings.py:97-101`). Cycles can't live inside one Catalyst plan, so the
engine runs the canonical iterative-batch shape:

    frontier₀ = seeds
    repeat: children = Σ expanderₜ(frontier)          (the callbacks)
            children -= seen        (left_anti — the RFPDupeFilter)
            seen ∪= children; frontier = children
    until frontier empty

Each iteration is one Catalyst-planned job; ``localCheckpoint`` truncates
lineage so plan size stays O(1) across iterations (at 100 TB: reliable
``checkpoint`` to HDFS instead, and persist ``seen`` — it is joined every
round).

``crawl_reachability`` instantiates the loop over the star schema's FK
hierarchy (region→nation→customer→orders) — a bounded DAG whose closed form
is three joins, giving an exact SQL oracle for the loop's semantics.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables

#: An expander maps the current frontier (node_type, node_id) to child nodes
#: — the spider-callback analogue (`parse_district_links` etc.).
Expander = Callable[[DataFrame], DataFrame]

_FRONTIER_COLS = ("node_type", "node_id")


def crawl(
    seeds: DataFrame,
    expanders: dict[str, Expander],
    max_iters: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """BFS over a link graph with frontier dedup. ``seeds`` and the result
    carry (node_type, node_id, depth).

    Per-iteration shape (guide §2.4): the frontier is checkpointed, so one
    tiny aggregation yields its per-type row counts — expanders whose
    sub-frontier is EMPTY are skipped outright (a typed-DAG level otherwise
    pays a full join against every expander's table just to produce zero
    rows), and the loop terminates as soon as no expander applies (no
    trailing all-empty round of joins). The counts double as the emptiness
    check, replacing the old per-iteration ``isEmpty()`` action. (A
    broadcast hint on the frontier side was tried and measured SLOWER —
    per-iteration broadcast builds cost more than the small shuffles they
    replace at every tested scale — so join strategy stays with Catalyst.)"""
    if checkpoint:
        seeds = seeds.localCheckpoint(eager=True)
    seen = seeds
    frontier = seeds
    fcounts = {
        r["node_type"]: r["count"]
        for r in frontier.groupBy("node_type").count().collect()
    }
    for depth in range(1, max_iters + 1):
        parts = []
        for ntype, expand in expanders.items():
            if not fcounts.get(ntype):
                continue
            sub = frontier.filter(F.col("node_type") == ntype)
            parts.append(expand(sub).select(*_FRONTIER_COLS))
        if not parts:
            break
        children = parts[0]
        for p in parts[1:]:
            children = children.unionByName(p)
        children = (
            children.distinct()
            .join(seen.select(*_FRONTIER_COLS), list(_FRONTIER_COLS), "left_anti")
            .withColumn("depth", F.lit(depth))
        )
        if checkpoint:
            children = children.localCheckpoint(eager=True)
        fcounts = {
            r["node_type"]: r["count"]
            for r in children.groupBy("node_type").count().collect()
        }
        if not fcounts:
            break
        seen = seen.unionByName(children)
        frontier = children
    return seen


@register(
    "crawl_reachability",
    oracle="""
SELECT 'region' AS node_type, CAST(r_regionkey AS VARCHAR) AS node_id, 0 AS depth
FROM region WHERE r_name = 'ASIA'
UNION ALL
SELECT 'nation', CAST(n_nationkey AS VARCHAR), 1
FROM nation JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
UNION ALL
SELECT 'customer', CAST(c_custkey AS VARCHAR), 2
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
UNION ALL
SELECT 'orders', CAST(o_orderkey AS VARCHAR), 3
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
""",
    survey_ref="S2,S3,O5,J1",
    doc="iterative frontier crawl over the FK hierarchy == closed-form 3-join reachability",
)
def crawl_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("region", "nation", "customer", "orders"))

    def expand_region(frontier: DataFrame) -> DataFrame:
        return frontier.join(
            t["nation"], frontier["node_id"] == t["nation"]["n_regionkey"].cast("string")
        ).select(
            F.lit("nation").alias("node_type"),
            F.col("n_nationkey").cast("string").alias("node_id"),
        )

    def expand_nation(frontier: DataFrame) -> DataFrame:
        return frontier.join(
            t["customer"],
            frontier["node_id"] == t["customer"]["c_nationkey"].cast("string"),
        ).select(
            F.lit("customer").alias("node_type"),
            F.col("c_custkey").cast("string").alias("node_id"),
        )

    def expand_customer(frontier: DataFrame) -> DataFrame:
        return frontier.join(
            t["orders"], frontier["node_id"] == t["orders"]["o_custkey"].cast("string")
        ).select(
            F.lit("orders").alias("node_type"),
            F.col("o_orderkey").cast("string").alias("node_id"),
        )

    seeds = (
        t["region"]
        .filter(F.col("r_name") == "ASIA")
        .select(
            F.lit("region").alias("node_type"),
            F.col("r_regionkey").cast("string").alias("node_id"),
            F.lit(0).alias("depth"),
        )
    )
    return crawl(
        seeds,
        {
            "region": expand_region,
            "nation": expand_nation,
            "customer": expand_customer,
        },
    )
