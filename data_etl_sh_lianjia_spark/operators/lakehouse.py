"""Lakehouse / pipeline-maintenance operators: deterministic sampling,
histograms, heavy hitters, MERGE-style upsert, and SCD-2 history rebuild.

None of these exist in the reference (a single-pass crawler has no notion of
table maintenance); they are **[derived]** capabilities a 100 TB training-data
pipeline needs on top of SURVEY.md §2:

- *Deterministic sampling* replaces ``TABLESAMPLE``/``df.sample`` (both
  engine-seeded, not reproducible cross-engine) with an md5-prefix threshold
  on a stable row key — the same rows are selected by any engine, any
  partitioning, any cluster size. That property is what makes sampled
  pipelines auditable at scale.
- *MERGE upsert* is the batch analog of ``MERGE INTO`` (Delta/Iceberg): a
  full-outer join classifying rows into insert/update/keep. Expressed
  relationally, Catalyst plans it as a single shuffle on the join key.
- *SCD-2 history* rebuilds validity intervals from an append-only log with
  one window pass (lead over event date) — no per-row driver logic.

All five register oracle-hashed declared queries; scale notes in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_etl_sh_lianjia_spark.functions.deterministic import dsum, oracle_dsum
from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables


def md5_bucket(*key_cols: Column | str) -> Column:
    """First-two-hex-chars md5 bucket of a composite key: 256 deterministic,
    engine-independent buckets. ``substr(md5(concat_ws('|', keys)), 1, 2)``
    produces identical lowercase hex in Spark and DuckDB, so a threshold on
    it is a reproducible Bernoulli sample (p = threshold/256) that needs no
    RNG, no seed plumbing, and no coordination across 1000 executors."""
    cols = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in key_cols]
    return F.substring(F.md5(F.concat_ws("|", *cols)), 1, 2)


def merge_upsert(
    base: DataFrame, updates: DataFrame, key: str, payload: list[str]
) -> DataFrame:
    """MERGE INTO analog: full-outer join ``base`` with ``updates`` on
    ``key``; rows present in both take the update payload (action
    ``update``), update-only rows are inserts, base-only rows are kept.
    Output = merged table + an ``action`` audit column. One shuffle on the
    key (sort-merge or broadcast per Catalyst/AQE); at 100 TB, bucket both
    sides on the key to make this shuffle-free (SCALE.md §joins)."""
    b = base.alias("b")
    u = updates.alias("u")
    joined = b.join(u, F.col(f"b.{key}") == F.col(f"u.{key}"), "full_outer")
    action = (
        F.when(F.col(f"b.{key}").isNull(), F.lit("insert"))
        .when(F.col(f"u.{key}").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
    )
    merged = [F.coalesce(F.col(f"u.{key}"), F.col(f"b.{key}")).alias(key)]
    merged += [
        F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c) for c in payload
    ]
    return joined.select(*merged, action.alias("action"))


@register(
    "deterministic_sample",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_sampled,
       """
    + oracle_dsum("l_quantity", "sum_qty", scale=2)
    + """
FROM lineitem
WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '20'
GROUP BY l_returnflag
""",
    survey_ref="O5,A3",
    doc="deterministic md5-threshold Bernoulli sample (~12.5%), engine- and partitioning-independent",
    tags=("sampling",),
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible sample: md5(key) prefix < '20' selects ~32/256 of rows —
    the same rows on any engine/cluster, unlike seeded ``df.sample``. The
    predicate is a plain scan filter (no shuffle before the agg)."""
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    sampled = li.filter(md5_bucket("l_orderkey", "l_linenumber") < "20")
    return sampled.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        dsum("l_quantity", "sum_qty", scale=2),
    )


@register(
    "stratified_sample",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n_sampled
FROM (
  SELECT o_orderstatus,
         substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS bkt
  FROM orders
)
WHERE bkt < CASE o_orderstatus WHEN 'F' THEN '10' WHEN 'O' THEN '20' ELSE '80' END
GROUP BY o_orderstatus
""",
    survey_ref="O5,A3,A6",
    doc="stratified deterministic sample: per-stratum md5 thresholds (rare strata kept at higher rates)",
    tags=("sampling",),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling rates via a CASE threshold on the md5 bucket —
    downsample dominant classes, keep rare ones (class rebalancing for
    training data). Still a pure scan filter: no shuffle, no RNG."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    threshold = (
        F.when(F.col("o_orderstatus") == "F", "10")
        .when(F.col("o_orderstatus") == "O", "20")
        .otherwise("80")
    )
    return (
        orders.filter(md5_bucket("o_orderkey") < threshold)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@register(
    "histogram_value",
    oracle="""
WITH stats AS (
  SELECT MIN(value) AS lo, MAX(value) AS hi FROM events
)
SELECT LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20.0)) AS INT), 19) AS bucket,
       COUNT(*) AS n,
       round(MIN(value), 6) AS bucket_min,
       round(MAX(value), 6) AS bucket_max
FROM events, stats
GROUP BY 1
""",
    survey_ref="A8,A3,F13",
    doc="20-bucket equi-width histogram over events.value (two-pass min/max + floor bucketing)",
    tags=("analytics",),
)
def histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: global min/max (tiny agg, broadcast back via
    cross join) then floor-bucketing. Both passes are scan+partial-agg —
    the classic two-pass histogram that scales linearly; IEEE double ops
    are bit-identical cross-engine so the bucket ids hash-match."""
    events = load_tables(spark, sf_dir, names=("events",))["events"]
    stats = events.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    step = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    return (
        events.crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / step).cast("int"),
                F.lit(19),
            ).alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("bucket_min"),
            F.round(F.max("value"), 6).alias("bucket_max"),
        )
    )


@register(
    "heavy_hitters_tokens",
    oracle="""
SELECT token, n, rnk
FROM (
  SELECT token, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
  FROM (
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
  )
)
WHERE rnk <= 20
""",
    survey_ref="L4,A3,W4",
    doc="exact heavy hitters: top-20 corpus tokens by frequency with deterministic tie-break",
    tags=("text",),
)
def heavy_hitters_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-token mining: explode tokens, count, top-20. The
    explode+count is map-side-combined by Spark (partial agg before the
    shuffle); the final top-k runs on the already-tiny grouped result.
    At 100 TB swap the tail for count-min sketch; the exact top keeps the
    oracle property here."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("token", "n", "rnk")
    )


@register(
    "merge_upsert_customers",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 3 <> 0
), updates AS (
  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT action, COUNT(*) AS n_rows,
       """
    + oracle_dsum("c_acctbal", "sum_acctbal", scale=2)
    + """
FROM (
  SELECT COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
         COALESCE(u.c_acctbal, b.c_acctbal) AS c_acctbal,
         CASE WHEN b.c_custkey IS NULL THEN 'insert'
              WHEN u.c_custkey IS NULL THEN 'keep'
              ELSE 'update' END AS action
  FROM base b FULL OUTER JOIN updates u ON b.c_custkey = u.c_custkey
)
GROUP BY action
""",
    survey_ref="J3,A3",
    doc="MERGE INTO analog: full-outer-join upsert classifying insert/update/keep, audited by action",
    tags=("lakehouse",),
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a customer dimension with a batch of updates via
    :func:`merge_upsert` (full-outer join = single key shuffle), then audit
    the merge by action. The library operator returns the merged table; the
    declared query aggregates it so the oracle stays compact."""
    cust = load_tables(spark, sf_dir, names=("customer",))["customer"]
    base = cust.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    updates = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        "c_mktsegment",
    )
    merged = merge_upsert(base, updates, "c_custkey", ["c_acctbal", "c_mktsegment"])
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("c_acctbal", "sum_acctbal", scale=2),
    )


@register(
    "scd2_order_history",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
       LEAD(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS valid_to,
       CASE WHEN LEAD(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) IS NULL THEN 1 ELSE 0 END AS is_current
FROM orders
WHERE o_custkey % 50 = 0
""",
    survey_ref="W2,J2",
    doc="SCD-2 validity intervals rebuilt from an append-only log via one lead() window pass",
    tags=("lakehouse",),
)
def scd2_order_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 rebuild: each order's validity runs
    until the customer's next order (lead over event date); the last row is
    current. One window pass, partitioned by the natural key — at scale the
    shuffle is on o_custkey and skew-safe (AQE)."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.filter(F.col("o_custkey") % 50 == 0).select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "hierarchical_rollup_reuse",
    oracle="""
SELECT user_id,
       CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS DOUBLE) / 10000
           AS sum_value
FROM events
WHERE user_id % 25 = 0
GROUP BY user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT)
""",
    survey_ref="A3,A5,W3,T1",
    doc="continuous-aggregate pattern: daily rollup reaggregated from an hourly rollup, exact",
)
def hierarchical_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable/materialized-rollup identity: a daily aggregate
    computed FROM the hourly rollup (re-aggregation of partials) must equal
    aggregating the raw events directly — which is what the oracle does.
    This is the maintenance pattern for continuous aggregates at 100 TB:
    the raw table is touched once per refresh interval, every coarser
    granularity reaggregates the next-finer rollup (COUNTs and scaled-long
    SUMs are decomposable; AVG derives from SUM/COUNT — never store it).
    Epoch-integer buckets keep the hierarchy exact and tz-independent."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    hourly = (
        ev.filter(F.col("user_id") % 25 == 0)
        .groupBy(
            "user_id",
            F.expr("(ts_ns div 1000) div 3600000000").alias("hour_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
            ).alias("sum_scaled"),
        )
    )
    return (
        hourly.groupBy(
            "user_id", (F.col("hour_bucket") / 24).cast("bigint").alias("day_bucket")
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum("sum_scaled").cast("double") / 10000).alias("sum_value"),
        )
    )


@register(
    "compact_small_files",
    oracle=f"""
SELECT o_orderstatus, COUNT(*) AS n,
       {oracle_dsum('o_totalprice', 'sum_price', scale=2)}
FROM orders
WHERE o_orderkey % 3 = 0
GROUP BY o_orderstatus
""",
    survey_ref="S9,S11",
    doc="small-file compaction: many-file table rewritten to few files, content-identical",
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table-maintenance pass every long-lived ingest pipeline needs:
    a slice written as 64 tiny files (streaming/incremental ingest shape)
    is compacted with a single ``repartition(4)`` rewrite; aggregating the
    compacted copy must equal querying the source directly (the oracle).
    At 100 TB compaction targets a size per file (~128 MB-1 GB), runs per
    partition, and is the difference between a scan planning 10^6 splits
    and 10^3."""
    import shutil
    import tempfile

    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    src = orders.filter(F.col("o_orderkey") % 3 == 0)
    small_dir = tempfile.mkdtemp(prefix="spark-graft-small-")
    compact_dir = tempfile.mkdtemp(prefix="spark-graft-compact-")
    try:
        src.repartition(64).write.mode("overwrite").parquet(small_dir)
        small = spark.read.parquet(small_dir)
        small.repartition(4).write.mode("overwrite").parquet(compact_dir)
        compacted = spark.read.parquet(compact_dir)
        result = compacted.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price", scale=2)
        )
        # materialize the (tiny) summary so the scratch dirs can be removed
        # instead of leaking one pair per invocation
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        shutil.rmtree(small_dir, ignore_errors=True)
        shutil.rmtree(compact_dir, ignore_errors=True)


@register(
    "observed_pipeline_metrics",
    oracle=f"""
SELECT 'lineitem_scan' AS stage,
       COUNT(*) AS n_rows,
       {oracle_dsum('l_extendedprice', 'sum_price')},
       CAST(SUM(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_high_discount
FROM lineitem
WHERE l_returnflag = 'R'
""",
    survey_ref="S7,A3,A6",
    doc="df.observe pipeline metrics: named accumulators collected off the main action",
)
def observed_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability (the admission-control/monitoring surface,
    SURVEY §2.1 S7): ``df.observe`` attaches named metric expressions to a
    plan node — they ride the main action as accumulators, so row counts /
    sums / data-quality tallies cost no second scan. This is how a 100 TB
    job reports per-stage health (rows kept, bytes, null ratios) without
    rerunning aggregates. The observed values themselves are returned as
    the result and oracle-checked against a direct aggregate."""
    from pyspark.sql import Observation

    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    obs = Observation("lineitem_scan")
    observed = li.filter(F.col("l_returnflag") == "R").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice", "sum_price"),
        F.sum(F.when(F.col("l_discount") > 0.08, 1).otherwise(0))
        .cast("bigint")
        .alias("n_high_discount"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the main action
    m = obs.get
    return spark.createDataFrame(
        [("lineitem_scan", m["n_rows"], m["sum_price"], m["n_high_discount"])],
        "stage string, n_rows bigint, sum_price double, n_high_discount bigint",
    )


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — multi-dimensional ingest layout
# ---------------------------------------------------------------------------


def _spark_morton(xcol: str, ycol: str, bits: int = 16) -> "F.Column":
    """Bit-interleaved Morton code of two integer columns (JVM-side shift/or
    expression tree — 2*bits terms, all inside whole-stage codegen)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(F.col(xcol), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(F.col(ycol), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _duck_morton(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "zorder_cluster",
    oracle=f"""
WITH z AS (
  SELECT l_partkey, l_suppkey,
         {_duck_morton('l_partkey', 'l_suppkey')} AS zval
  FROM lineitem
)
SELECT zval // 16777216 AS z_bucket,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
       MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
FROM z
GROUP BY z_bucket
""",
    survey_ref="S11,P5,A3",
    doc="Z-order (Morton) clustering key + per-bucket min/max locality stats",
)
def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional clustering for ingest layout: interleaving the bits
    of two filter columns gives a single sort key whose contiguous ranges
    are small rectangles in (partkey, suppkey) space — files/row groups
    written in z-order carry tight min/max on BOTH columns, so 2-D range
    predicates prune the scan (the reason Delta/Iceberg OPTIMIZE ZORDER
    exists; this engine's range-cluster ingest generalizes to it for
    multi-predicate tables). The query materializes the z-value (pure
    shift/or codegen, no UDF) and the per-bucket min/max spans that a
    pruning-effectiveness audit would read."""
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    z = li.select(
        "l_partkey", "l_suppkey", _spark_morton("l_partkey", "l_suppkey").alias("zval")
    )
    return (
        z.groupBy((F.col("zval") / F.lit(16777216)).cast("long").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("min_part"),
            F.max("l_partkey").alias("max_part"),
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
        )
    )
