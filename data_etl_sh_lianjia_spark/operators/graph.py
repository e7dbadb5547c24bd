"""Iterative graph dataflow — PageRank over the nation-level trade graph.

SURVEY.md §2.1 S2 / §4.3: the reference's crawl frontier is an iterative
dataflow with cycles, which one Spark plan cannot express — the engine runs
a driver-side loop over DataFrames instead (same pattern as
``sources/frontier.py::crawl``). This operator applies that pattern to a
numeric fixed-point computation: 3 power-iteration steps of PageRank
(damping 0.85) over the customer-nation → supplier-nation trade graph
derived from lineitem ⋈ orders ⋈ customer ⋈ supplier.

Cross-engine determinism: per-edge contributions are scaled to integer
picorank units (``floor(x * 1e12 + 0.5)``) before the per-destination SUM,
so the only order-dependent reduction is an exact BIGINT sum — the same
scaled-long trick as ``functions.deterministic`` — and every double op
around it is the identical IEEE expression in both engines. The DuckDB
oracle unrolls the same three iterations as chained CTEs.

Scale: the edge aggregation is the only fact-table work (one shuffle);
the iteration itself runs on the *aggregated* graph (|nations|² edges max).
For billion-edge graphs the loop stays the same but each iteration joins
edge partitions against the rank vector — checkpoint every few iterations
to truncate lineage, and salt/re-partition on high-out-degree hubs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables

_DAMPING = 0.85
_ITERS = 3
_SCALE = 1e12


def _contrib_expr(pr: Column, w: Column, outw: Column) -> Column:
    """floor(pr * 0.85 * w / outw * 1e12 + 0.5) — identical text in the oracle."""
    return F.floor(pr * _DAMPING * w / outw * F.lit(_SCALE) + F.lit(0.5)).cast("long")


def _oracle_iteration(i: int) -> str:
    prev = f"p{i - 1}"
    return f"""
c{i} AS (
  SELECT e.dst,
         SUM(CAST(floor(p.pr * 0.85 * e.w / ow.outw * 1e12 + 0.5) AS BIGINT)) AS s
  FROM {prev} p JOIN e ON p.node = e.src JOIN ow ON ow.src = e.src
  GROUP BY e.dst
),
p{i} AS (
  SELECT n.node, n.n_name,
         CAST(0.15 AS DOUBLE) / n.cnt + COALESCE(c{i}.s, 0) / 1e12 AS pr
  FROM n LEFT JOIN c{i} ON c{i}.dst = n.node
)"""


_PAGERANK_ORACLE = f"""
WITH e AS (
  SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey  = o_custkey
  JOIN supplier ON s_suppkey  = l_suppkey
  GROUP BY 1, 2
),
ow AS (SELECT src, SUM(w) AS outw FROM e GROUP BY src),
n AS (
  SELECT n_nationkey AS node, n_name,
         (SELECT COUNT(*) FROM nation) AS cnt
  FROM nation
),
p0 AS (SELECT node, n_name, CAST(1.0 AS DOUBLE) / cnt AS pr FROM n),
{','.join(_oracle_iteration(i) for i in range(1, _ITERS + 1))}
SELECT node AS n_nationkey, n_name, pr AS pagerank FROM p{_ITERS}
"""


@register(
    "pagerank_nation_trade",
    oracle=_PAGERANK_ORACLE,
    survey_ref="S2,J1,J3,A3",
    doc="3-iteration PageRank over the nation trade graph (iterative driver loop, exact oracle)",
)
def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, names=("nation", "customer", "supplier", "orders", "lineitem"))
    edges = (
        t["lineitem"]
        .join(F.broadcast(t["orders"]), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        # the aggregated graph is tiny relative to the fact scan that built
        # it: persist so the 3 iterations below don't re-run the fact join
        .persist()
    )
    outw = (
        edges.groupBy("src")
        .agg(F.sum("w").alias("outw"))
        # fresh name: outw derives from edges, so joining it back by the
        # shared `src` attribute would resolve both sides to the same
        # column id (a trivially-true predicate)
        .withColumnRenamed("src", "outw_src")
    )
    nodes = t["nation"].select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    n_count = nodes.count()

    pr = nodes.withColumn("pr", F.lit(1.0 / n_count))
    for _ in range(_ITERS):
        contrib = (
            pr.join(edges, F.col("node") == F.col("src"))
            .join(outw, F.col("outw_src") == F.col("src"))
            .select(
                F.col("dst"),
                _contrib_expr(F.col("pr"), F.col("w"), F.col("outw")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(contrib, F.col("dst") == F.col("node"), "left").select(
            "node",
            "n_name",
            (
                F.lit(0.15 / n_count)
                + F.coalesce(F.col("s"), F.lit(0)) / F.lit(_SCALE)
            ).alias("pr"),
        )
    return pr.select(
        F.col("node").alias("n_nationkey"), "n_name", F.col("pr").alias("pagerank")
    )


# ---------------------------------------------------------------------------
# triangle_count — near-dup graph density audit (SURVEY §2.9 L2 / §2.4 J3)
# ---------------------------------------------------------------------------


def _triangle_oracle() -> str:
    from data_etl_sh_lianjia_spark.operators.dedup import _DUCK_NGRAM_EDGES

    # pairs always carry doc_a < doc_b, so the degree tiebreak reduces to
    # "<=" (equal degrees orient by the ids' existing order)
    return f"""
WITH pairs AS ({_DUCK_NGRAM_EDGES}),
deg AS (
  SELECT s, COUNT(*) AS d
  FROM (SELECT doc_a AS s FROM pairs UNION ALL SELECT doc_b AS s FROM pairs)
  GROUP BY s
),
e AS (
  SELECT CASE WHEN du.d <= dv.d THEN p.doc_a ELSE p.doc_b END AS u,
         CASE WHEN du.d <= dv.d THEN p.doc_b ELSE p.doc_a END AS v
  FROM pairs p
  JOIN deg du ON du.s = p.doc_a
  JOIN deg dv ON dv.s = p.doc_b
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e1.u = e2.u AND e1.v <> e2.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""


@register(
    "triangle_count",
    oracle=_triangle_oracle(),
    survey_ref="L2,J3,A3",
    doc="degree-oriented triangle count over the near-dup pair graph (cluster-density audit)",
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the n-gram near-dup graph — the density
    audit of duplicate clusters (many triangles = tight clique-like dup
    groups; few = chain-like borderline pairs). The DISTRIBUTED triangle
    recipe: orient every edge from the lower-(degree, id) endpoint to the
    higher, which turns the graph into a DAG whose max out-degree is
    O(sqrt(edges)) — the wedge join (e1 ⋈ e2 on the shared apex) can then
    never blow up on a hub vertex, and each triangle is counted exactly
    once at its unique smallest apex. Both engines run the identical
    orientation + two-join plan; all counts are exact BIGINTs."""
    from data_etl_sh_lianjia_spark.operators.dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    deg = (
        pairs.selectExpr("doc_a AS s")
        .unionByName(pairs.selectExpr("doc_b AS s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient: degree tables are tiny relative to the pair set — broadcast
    da = F.broadcast(deg.selectExpr("s AS sa", "d AS da"))
    db = F.broadcast(deg.selectExpr("s AS sb", "d AS db"))
    oriented = (
        pairs.join(da, F.col("doc_a") == F.col("sa"))
        .join(db, F.col("doc_b") == F.col("sb"))
        .select(
            F.when(F.col("da") <= F.col("db"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("u"),
            F.when(F.col("da") <= F.col("db"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("v"),
        )
    )
    e1 = oriented.selectExpr("u AS u1", "v AS v1")
    e2 = oriented.selectExpr("u AS u2", "v AS v2")
    e3 = oriented.selectExpr("u AS u3", "v AS v3")
    wedges = e1.join(e2, (F.col("u1") == F.col("u2")) & (F.col("v1") != F.col("v2")))
    tri = wedges.join(
        e3, (F.col("u3") == F.col("v1")) & (F.col("v3") == F.col("v2"))
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_vertices = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"))
    n_edges = oriented.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return n_vertices.crossJoin(n_edges).crossJoin(tri)
