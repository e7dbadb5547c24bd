"""Product-analytics + skew-handling operator pack.

SURVEY.md §2 refs: W5/J4-adjacent funnel & cohort analytics over ``events``
(the reference's dataflow is a funnel itself: district→bizcircle→village→house,
`lianjia.py:29-99` — these queries are the analytics-engine generalization),
A3/A8 deterministic regression aggregates, J3 skew-mitigated joins, A3
two-phase (salted) aggregation, T1's batch twin with a value oracle, and
L5 embedding quantization.

Scale notes (100 TB posture):
- The salted join / two-phase agg are the *manual* skew mitigations for when
  AQE's runtime skew splitting isn't available (streaming state, stable plans);
  results are provably identical to the unsalted plans, which is what the
  DuckDB oracle checks.
- Funnel/cohort shuffle once on ``user_id`` and reduce to tiny outputs —
  the per-user state is bounded (3 timestamps / first-week), no window over
  the whole history is materialized.
- Regression uses exact scaled-long sums (see ``functions/deterministic``):
  partial aggregation is map-side combinable, and the final slope/intercept
  arithmetic happens on 6 scalars per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.functions.deterministic import dsum, oracle_dsum
from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables

WEEK_US = 7 * 86_400 * 1_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts_ns div 1000").alias("ts_us"),
        "value",
    )


@register(
    "funnel_conversion",
    oracle="""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
v AS (SELECT user_id, MIN(ts_us) AS vt FROM e WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts_us) AS ct
      FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts_us > v.vt GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts_us) AS pt
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts_us > c.ct GROUP BY 1)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_full_funnel,
       CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
         / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS conversion
""",
    survey_ref="W5,J4",
    doc="ordered 3-stage funnel (view -> click -> purchase) with strict event-time ordering",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each stage requires a strictly-later event than the user's first
    event of the previous stage.

    ONE shuffle total (guide §2.4: operations keyed the same way share one
    exchange): all three stage thresholds are per-user scalars, so they
    chain as unbounded windows over the same user_id partitioning — vt =
    first view, ct = first click after vt, pt = first purchase after ct —
    followed by a per-user collapse and one singleton rollup. The previous
    per-stage groupBy/join form planned 12 exchanges and recomputed the
    event scan once per stage per count leg (50 Exchange nodes after AQE).
    A user with no view has vt NULL, which NULLs the ct/pt comparisons
    too — exactly the oracle's inner-join semantics."""
    from pyspark.sql.window import Window

    e = (
        _events_us(spark, sf_dir)
        .filter(F.col("event_type").isin("view", "click", "purchase"))
        .select("user_id", "event_type", "ts_us")
    )
    w = Window.partitionBy("user_id")
    e = e.withColumn(
        "vt",
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
    )
    e = e.withColumn(
        "ct",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts_us") > F.col("vt")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    e = e.withColumn(
        "pt",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts_us") > F.col("ct")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    per_user = e.groupBy("user_id").agg(
        F.min("vt").alias("vt"),
        F.min("ct").alias("ct"),
        F.min("pt").alias("pt"),
    )
    return per_user.agg(
        F.count("vt").alias("n_view"),
        F.count("ct").alias("n_view_click"),
        F.count("pt").alias("n_full_funnel"),
    ).withColumn(
        "conversion",
        F.col("n_full_funnel").cast("double") / F.col("n_view").cast("double"),
    )


@register(
    "cohort_retention",
    oracle=f"""
WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week_idx FROM events),
coh AS (SELECT user_id, MIN(week_idx) AS cohort_week FROM e GROUP BY 1)
SELECT coh.cohort_week, e.week_idx - coh.cohort_week AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM e JOIN coh ON e.user_id = coh.user_id
GROUP BY 1, 2
""",
    survey_ref="W5,A4",
    doc="weekly cohort retention: users active at week-offset k from their first-seen week",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohorts are absolute 7-day epoch buckets (integer arithmetic — no
    calendar/timezone divergence between engines). The distinct
    (user, week) projection collapses the fact table before the self-join,
    so the join input is |users|x|weeks|, not |events|."""
    e = (
        _events_us(spark, sf_dir)
        .select("user_id", (F.col("ts_us") / F.lit(WEEK_US)).cast("long").alias("week_idx"))
        .distinct()
    )
    coh = e.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    return (
        e.join(coh, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def _sl(c: Column, scale: int) -> Column:
    """Scaled-long term: floor(x*10^s + 0.5) as BIGINT (see deterministic.py)."""
    return F.floor(c * F.lit(float(10 ** scale)) + F.lit(0.5)).cast("long")


@register(
    "regression_stats",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(floor(l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sx,
         CAST(SUM(CAST(floor(l_extendedprice * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sy,
         CAST(SUM(CAST(floor(l_quantity * l_quantity * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sxx,
         CAST(SUM(CAST(floor(l_extendedprice * l_extendedprice + 0.5) AS BIGINT)) AS DOUBLE) AS syy,
         CAST(SUM(CAST(floor(l_quantity * l_extendedprice + 0.5) AS BIGINT)) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n), 6) AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
""",
    survey_ref="A8,A3",
    doc="per-group OLS slope/intercept/R^2 from exact scaled-long moment sums",
)
def regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear regression of extendedprice on quantity per returnflag.

    The five moment sums are order-independent scaled-long sums (the only
    shuffle-order hazard); the slope/intercept/R^2 arithmetic is then a
    fixed IEEE expression tree over per-group scalars, bit-identical across
    engines. The product/square terms use scale 0/4 so per-row terms stay
    far below 2^63 at any realistic SF (partial sums combine map-side)."""
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum(_sl(x, 4)).cast("double") / F.lit(10000.0)).alias("sx"),
        (F.sum(_sl(y, 4)).cast("double") / F.lit(10000.0)).alias("sy"),
        (F.sum(_sl(x * x, 4)).cast("double") / F.lit(10000.0)).alias("sxx"),
        F.sum(_sl(y * y, 0)).cast("double").alias("syy"),
        F.sum(_sl(x * y, 0)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.round(slope, 6).alias("slope"),
        F.round(sy / n - slope * (sx / n), 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


@register(
    "misc_agg_suite",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderstatus = 'F') AS any_finished,
       min_by(o_custkey, o_orderkey) AS first_custkey,
       max_by(o_custkey, o_orderkey) AS last_custkey
FROM orders
GROUP BY o_orderpriority
""",
    survey_ref="A3,A6",
    doc="count_if / bool_and / bool_or / min_by / max_by aggregate family",
)
def misc_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by are deterministic here because the ordering argument
    (o_orderkey) is unique — the determinism contract for arg-extrema."""
    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.min_by("o_custkey", "o_orderkey").alias("first_custkey"),
        F.max_by("o_custkey", "o_orderkey").alias("last_custkey"),
    )


@register(
    "join_skew_salted",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n,
       {oracle_dsum('l_extendedprice', 'sum_price')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
    survey_ref="J3,J1",
    doc="explicitly salted fact-to-fact equi-join (16-way key split), result == unsalted join",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual skew mitigation: the probe side gets a deterministic salt
    (xxhash64 of the key, mod 16) and the build side is replicated 16x, so
    one hot key spreads over 16 shuffle partitions. The oracle is the plain
    join — salting must not change semantics. At 100 TB prefer AQE's
    runtime skew split for batch; this pattern remains necessary for
    streaming state and stable-plan deployments."""
    n_salt = 16
    t = load_tables(spark, sf_dir, names=("lineitem", "orders"))
    li = t["lineitem"].select("l_orderkey", "l_extendedprice").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(n_salt)).cast("int")
    )
    orders = (
        t["orders"]
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    )
    return (
        li.join(
            orders,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li["salt"] == orders["salt"]),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "sum_price"))
    )


@register(
    "agg_skew_two_phase",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n,
       {oracle_dsum('l_extendedprice', 'sum_price')}
FROM lineitem
GROUP BY l_returnflag
""",
    survey_ref="A3",
    doc="explicit two-phase (salted) aggregation over 3 heavily-skewed group keys",
)
def agg_skew_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three group keys over the whole fact table is the worst-case reducer
    skew: phase 1 aggregates on (key, salt32) — 96 evenly-sized partial
    groups — phase 2 merges partials per key. Scaled-long partials re-sum
    exactly, so the result is identical to the direct aggregation (the
    oracle). Spark's own partial aggregation does this implicitly; the
    explicit form is the template for sketches whose partials are objects
    (HLL, histograms) where map-side combine must be hand-arranged."""
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    partial = (
        li.select("l_returnflag", "l_orderkey", "l_extendedprice")
        .withColumn("salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(32)).cast("int"))
        .groupBy("l_returnflag", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(_sl(F.col("l_extendedprice"), 4)).alias("psum"),
        )
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        (F.sum("psum").cast("double") / F.lit(10000.0)).alias("sum_price"),
    )


@register(
    "events_tumbling_batch",
    oracle=f"""
SELECT epoch_us(time_bucket(INTERVAL '15 minutes', ts)) AS win_start_us,
       event_type,
       COUNT(*) AS n,
       {oracle_dsum('value', 'sum_value')}
FROM events
GROUP BY 1, 2
""",
    survey_ref="T1,T7",
    doc="batch twin of the tumbling-window stream agg (15-min windows), value-oracled",
)
def events_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.window() in a batch plan — the T7 batch-equivalence contract made
    oracle-checkable: Spark's epoch-aligned 15-minute windows coincide with
    DuckDB's time_bucket (2000-01-01 origin is a multiple of 900 s). ``ts``
    is TIMESTAMP_NTZ, so the window start is converted to epoch micros by
    diffing against the NTZ epoch — never via cast('timestamp'), which would
    reinterpret the wall-clock value in the session timezone."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', win.start)"
            ).alias("win_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "embedding_quantize",
    oracle="""
WITH q AS (
  SELECT vec_id, label,
         list_aggregate(list_transform(embedding, x -> abs(x)), 'max') AS m,
         embedding
  FROM embeddings
)
SELECT vec_id, label,
       CAST(list_aggregate(
         list_transform(embedding, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT)),
         'sum') AS BIGINT) AS q_sum,
       CAST(list_aggregate(
         list_transform(embedding, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT)),
         'min') AS BIGINT) AS q_min,
       CAST(list_aggregate(
         list_transform(embedding, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT)),
         'max') AS BIGINT) AS q_max
FROM q
WHERE m > 0
""",
    survey_ref="L5,F13",
    doc="int8 symmetric embedding quantization (per-vector absmax scale), summarized per vector",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization q = round(x * 127 / absmax) — the
    standard storage/ANN compression step (4x smaller than float32, SIMD
    dot products). All element math is expression-level (codegen, no UDF);
    floor(t + 0.5) keeps rounding IEEE-identical across engines. The
    per-vector summary (sum/min/max of q) keeps the oracle payload small
    while pinning every element's value through the exact integer sum."""
    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    m = F.array_max(F.transform("embedding", lambda x: F.abs(x)))
    with_m = emb.select("vec_id", "label", "embedding", m.alias("m")).filter(
        F.col("m") > 0
    )
    q = F.transform(
        "embedding",
        lambda x: F.floor(x * F.lit(127.0) / F.col("m") + F.lit(0.5)).cast("long"),
    )
    return with_m.select(
        "vec_id",
        "label",
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
    )


# ---------------------------------------------------------------------------
# T1-adjacent — hypertable-style gap-filled hourly rollup with LOCF
# ---------------------------------------------------------------------------

_HR_US = 3_600_000_000  # one hour in microseconds


@register(
    "gapfill_locf",
    oracle=f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) // {_HR_US} AS hr, value FROM events
), agg AS (
  SELECT event_type, hr, COUNT(*) AS n, {oracle_dsum('value', 'sum_value')}
  FROM e GROUP BY event_type, hr
), bounds AS (
  SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM e
), grid AS (
  SELECT t.event_type, g.hr
  FROM (SELECT DISTINCT event_type FROM e) t
  CROSS JOIN (SELECT unnest(range(h0, h1 + 1)) AS hr FROM bounds) g
), j AS (
  SELECT g.event_type, g.hr, COALESCE(a.n, 0) AS n, a.sum_value
  FROM grid g LEFT JOIN agg a ON g.event_type = a.event_type AND g.hr = a.hr
)
SELECT event_type, hr, n, sum_value,
       last_value(sum_value IGNORE NULLS)
         OVER (PARTITION BY event_type ORDER BY hr) AS locf_value
FROM j
""",
    survey_ref="T1,A3,W3,O1",
    doc="gap-filled hourly rollup: dense time grid + LOCF interpolation",
)
def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable rollup pattern (continuous-aggregate +
    ``time_bucket_gapfill`` + last-observation-carried-forward): hourly
    per-type sums on a DENSE hour grid — empty buckets exist with n=0 and
    a NULL raw sum, and ``locf_value`` carries the last observed sum
    forward, which is what dashboards and downstream models consume.

    Scale shape: the rollup is one partial-agg'd shuffle keyed (type, hour)
    — cardinality = types x hours, bounded by time, not data. The grid is
    generated (sequence + explode: O(types x hours) rows, never a scan),
    the join against the rollup is grid-sized, and LOCF is one window per
    type over the grid. At 100 TB the rollup side is the only data-sized
    stage, and it reduces before its shuffle. Hour index = epoch-micros
    div 3600e6 (integer, tz-independent in both engines).
    """
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    e = ev.select(
        "event_type", F.expr(f"(ts_ns div 1000) div {_HR_US}").alias("hr"), "value"
    )
    agg = e.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "sum_value")
    )
    # Bounds and the type dimension derive from the ROLLUP, not the raw
    # events — identical values (every type/hr in e survives the group-by).
    # The rollup is materialized once (localCheckpoint, types x hours rows
    # — bounded by time, not data): without it Catalyst pushes each
    # branch's projection past the group-by and plans THREE scans of the
    # fact table (types branch reads event_type, bounds branch reads ts,
    # rollup reads all three columns); with it the fact table is scanned
    # exactly once (plan-pinned in tests/test_scale_patterns.py).
    agg = agg.localCheckpoint(eager=True)
    bounds = agg.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = (
        agg.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1)")).alias("hr"),
        )
    )
    j = grid.join(agg, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce("n", F.lit(0)).alias("n"),
        "sum_value",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("hr")
    return j.withColumn(
        "locf_value", F.last("sum_value", ignorenulls=True).over(w)
    )


# ---------------------------------------------------------------------------
# W2/W3 — exponentially weighted moving average (time-decayed user state)
# ---------------------------------------------------------------------------


@register(
    "ewma_user_value",
    oracle="""
WITH ranked AS (
  SELECT user_id, value,
         row_number() OVER w AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), terms AS (
  SELECT user_id, n,
         CAST(floor(value * (CASE WHEN i = 1 THEN pow(0.8, n - 1)
                                  ELSE 0.2 * pow(0.8, n - i) END)
                    * 1e9 + 0.5) AS BIGINT) AS t
  FROM ranked
)
SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events,
       round(CAST(SUM(t) AS DOUBLE) / 1e9, 4) AS ewma_value
FROM terms GROUP BY user_id
""",
    survey_ref="W2,W3,A3",
    doc="per-user EWMA (alpha=0.2) of event values via closed-form decay weights, exact scaled-long sum",
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recursive EWMA s_i = a*v_i + (1-a)*s_{i-1} in CLOSED FORM so it
    runs as one windowed pass instead of a sequential fold: the final
    state equals sum_i w_i * v_i with w_i = a*(1-a)^(n-i) (and the first
    observation carrying (1-a)^(n-1)) — per-row weights come from
    row_number + partition count, so the whole operator is a window pass
    plus a groupBy, embarrassingly parallel across users at 100 TB.
    Determinism: each term quantizes to integer nano-units with the
    identical floor(x*1e9+0.5) expression in both engines (never Python
    round — half-even vs half-up), the sum is an exact BIGINT reduction,
    and only the final display value re-rounds."""
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wp = Window.partitionBy("user_id")
    ranked = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    weight = F.when(
        F.col("i") == 1, F.pow(F.lit(0.8), F.col("n") - 1)
    ).otherwise(F.lit(0.2) * F.pow(F.lit(0.8), F.col("n") - F.col("i")))
    terms = ranked.select(
        "user_id",
        "n",
        F.floor(F.col("value") * weight * F.lit(1e9) + F.lit(0.5))
        .cast("bigint")
        .alias("t"),
    )
    return terms.groupBy("user_id").agg(
        F.max("n").cast("bigint").alias("n_events"),
        F.round(F.sum("t").cast("double") / F.lit(1e9), 4).alias("ewma_value"),
    )


# ---------------------------------------------------------------------------
# A8/L6 — robust outlier detection (median absolute deviation)
# ---------------------------------------------------------------------------


@register(
    "mad_outlier_stats",
    oracle="""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, round(m.med, 6) AS med6,
         round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad6
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type, m.med
)
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) FILTER (WHERE abs(e.value - m.med6) > 5 * m.mad6)
            AS BIGINT) AS n_outliers,
       m.med6 AS median_value, m.mad6 AS mad_value
FROM events e JOIN mad m USING (event_type)
GROUP BY e.event_type, m.med6, m.mad6
""",
    survey_ref="A8,L6",
    doc="median-absolute-deviation outlier stats per event type (robust quality filter)",
)
def mad_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier statistics — the quality-filter primitive that
    survives heavy-tailed data where mean/stddev thresholds break: per
    group, median, MAD = median(|v - median|), and the count of values
    beyond 5 MADs. Two aggregation passes over the group key (median,
    then MAD against the broadcast medians) and a final flagged count —
    no sort of the full data, no window over the corpus. Cross-engine
    determinism: the exact interpolated percentile is rounded to 6dp
    BEFORE the threshold comparison, so both engines compare identical
    grid values (the raw interpolation can differ in the last ulp)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)),
                6,
            ).alias("mad6")
        )
        .select(
            "event_type", F.round("med", 6).alias("med6"), "mad6"
        )
    )
    flagged = ev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type", "med6", "mad6").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med6"))
                > F.lit(5) * F.col("mad6"),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
    ).select(
        "event_type", "n", "n_outliers",
        F.col("med6").alias("median_value"),
        F.col("mad6").alias("mad_value"),
    )


@register(
    "events_sliding_distinct_users",
    oracle="""
WITH t AS (
  SELECT epoch_us(time_bucket(INTERVAL '15 minutes', ts)) AS b, user_id
  FROM events
), m AS (
  SELECT b AS ws, user_id FROM t
  UNION ALL
  SELECT b - 900000000, user_id FROM t
)
SELECT ws AS win_start_us,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM m
GROUP BY ws
""",
    survey_ref="T1,A4,T7",
    doc="sliding-window (30m width / 15m slide) exact distinct users — "
        "batch twin of the sliding stream agg",
)
def events_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT user_id) per sliding window — the time-series
    engagement surface (WAU/DAU at event grain). Spark's
    ``window(ts, '30 minutes', '15 minutes')`` replicates each event into
    its two overlapping epoch-aligned windows; the oracle materializes the
    same two membership rows per event explicitly (bucket and
    bucket - 15 min), so a hash match pins the window-assignment semantics,
    not just the counts. At scale the expansion is exactly width/slide
    rows per event (bounded), and the distinct shuffles on (window,
    user) — the same two-phase shape as any COUNT(DISTINCT)."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    return (
        ev.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("win"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.expr(
                "timestampdiff(MICROSECOND,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00', win.start)"
            ).alias("win_start_us"),
            "n_users",
            "n_events",
        )
    )
