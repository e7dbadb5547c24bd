"""Scalar-function surface — SURVEY.md §2.3 F4/F6/F8/F10/F11/F13: math,
string, date, array and map families exercised as oracle-matched queries
(the per-function library lives in functions/text.py; these queries prove
cross-engine semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables


@register(
    "math_suite",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey,
       round(l_extendedprice, 1) AS r1,
       abs(l_discount - 0.05) AS absdev,
       CAST(floor(l_quantity) AS BIGINT) AS fl,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ce,
       round(power(l_discount + 1, 2), 6) AS pw,
       round(ln(l_extendedprice + 1), 6) AS lg,
       round(sqrt(l_quantity), 6) AS sq,
       CAST(l_quantity AS BIGINT) % 7 AS md
FROM lineitem
WHERE l_orderkey % 997 = 0
""",
    survey_ref="F10,F11,F13",
    doc="math family: round/abs/floor/ceil/power/ln/sqrt/mod (IEEE-identical cross-engine)",
)
def math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    return li.filter(F.col("l_orderkey") % 997 == 0).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        F.round("l_extendedprice", 1).alias("r1"),
        F.abs(F.col("l_discount") - 0.05).alias("absdev"),
        F.floor("l_quantity").alias("fl"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("ce"),
        F.round(F.pow(F.col("l_discount") + 1, 2), 6).alias("pw"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("lg"),
        F.round(F.sqrt("l_quantity"), 6).alias("sq"),
        (F.col("l_quantity").cast("bigint") % 7).alias("md"),
    )


@register(
    "string_suite",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS up,
       lower(c_mktsegment) AS lo,
       substring(c_name, 1, 8) AS sub,
       concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS cat,
       replace(c_name, 'Customer', 'C') AS rep,
       CAST(length(c_name) AS BIGINT) AS len,
       trim(c_name) AS tr,
       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS pad,
       split_part(c_name, '#', 2) AS part2,
       position('#' IN c_name) AS hashpos
FROM customer
WHERE c_custkey % 31 = 0
""",
    survey_ref="F1,F4,F5,F6",
    doc="string family: case/substr/concat/replace/pad/split_part/position",
)
def string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, names=("customer",))["customer"]
    return c.filter(F.col("c_custkey") % 31 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.concat(
            F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")
        ).alias("cat"),
        F.regexp_replace("c_name", "Customer", "C").alias("rep"),
        F.length("c_name").cast("bigint").alias("len"),
        F.trim("c_name").alias("tr"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("pad"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("part2"),
        F.locate("#", F.col("c_name")).cast("bigint").alias("hashpos"),
    )


@register(
    "date_suite",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       EXTRACT(year FROM o_orderdate) AS yr,
       EXTRACT(month FROM o_orderdate) AS mo,
       EXTRACT(dow FROM o_orderdate) AS dow,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS plus90,
       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
FROM orders
WHERE o_orderkey % 101 = 0
""",
    survey_ref="F8,F9,F13",
    doc="date family: extract/trunc/add/diff (DuckDB dow == Spark dayofweek-1)",
)
def date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, names=("orders",))["orders"]
    return o.filter(F.col("o_orderkey") % 101 == 0).select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("plus90"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).cast("bigint").alias("days_since"),
    )


@register(
    "array_map_suite",
    oracle="""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
  WHERE vec_id % 50 = 0
)
SELECT vec_id,
       len(v) AS dim,
       round(v[1], 6) AS first_el,
       round(list_max(v), 6) AS mx,
       round(list_min(v), 6) AS mn,
       len(list_filter(v, x -> x > 0)) AS n_pos,
       round(list_sum(list_transform(v, x -> abs(x))), 4) AS l1_norm,
       list_contains(['a', 'b'], 'b') AS has_b,
       element_at(map {'k1': label, 'k2': label * 2}, 'k2')[1] AS m2
FROM e
""",
    survey_ref="F7,F13",
    doc="array/map family: size/element_at/min/max/filter/transform/aggregate/map literal",
)
def array_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"].filter(
        F.col("vec_id") % 50 == 0
    )
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at(v, 1), 6).alias("first_el"),
        F.round(F.array_max(v), 6).alias("mx"),
        F.round(F.array_min(v), 6).alias("mn"),
        F.size(F.filter(v, lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(v, lambda x: F.abs(x)), F.lit(0.0), lambda a, x: a + x
            ),
            4,
        ).alias("l1_norm"),
        F.array_contains(F.array(F.lit("a"), F.lit("b")), "b").alias("has_b"),
        F.element_at(
            F.create_map(
                F.lit("k1"), F.col("label"), F.lit("k2"), F.col("label") * 2
            ),
            F.lit("k2"),
        ).alias("m2"),
    )


@register(
    "marker_substring",
    oracle="""
SELECT c_custkey,
       substr(payload,
              strpos(payload, 'resblockPosition:') + 17,
              strpos(payload, ';resblockName') - strpos(payload, 'resblockPosition:') - 17
       ) AS coord,
       regexp_extract(payload, 'resblockPosition:([^;]*)', 1) AS coord_re,
       CAST(string_split(regexp_extract(payload, 'resblockPosition:([^;]*)', 1), ',')[1] AS BIGINT) AS lon,
       CAST(string_split(regexp_extract(payload, 'resblockPosition:([^;]*)', 1), ',')[2] AS BIGINT) AS lat
FROM (
    SELECT c_custkey,
           'var q=1;resblockPosition:' || CAST(c_nationkey AS VARCHAR) || ','
               || CAST(c_custkey AS VARCHAR) || ';resblockName:"x";' AS payload
    FROM customer
)
""",
    survey_ref="F3,F2,F4,P7",
    doc="marker-window substring extraction (locate+substr) == regex variant",
)
def marker_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: the reference slices embedded JS by marker offsets —
    ``html[find('resblockPosition:') : find('resblockName')-1]``
    (lianjia.py:67-71) — then regexes the coordinate pair. Implemented
    both ways (locate+substr window, and one regexp_extract) over a
    payload built from table columns, proving they agree; lon/lat parse
    back to BIGINT. Everything is whole-stage-codegen'd string ops — no
    UDF."""
    cust = load_tables(spark, sf_dir, names=("customer",))["customer"]
    payload = F.concat(
        F.lit("var q=1;resblockPosition:"),
        F.col("c_nationkey").cast("string"),
        F.lit(","),
        F.col("c_custkey").cast("string"),
        F.lit(';resblockName:"x";'),
    )
    df = cust.select("c_custkey", payload.alias("payload"))
    start = F.locate("resblockPosition:", F.col("payload")) + F.lit(17)
    end = F.locate(";resblockName", F.col("payload"))
    coord = F.col("payload").substr(start, end - start)
    coord_re = F.regexp_extract("payload", "resblockPosition:([^;]*)", 1)
    return df.select(
        "c_custkey",
        coord.alias("coord"),
        coord_re.alias("coord_re"),
        F.split(coord_re, ",").getItem(0).cast("bigint").alias("lon"),
        F.split(coord_re, ",").getItem(1).cast("bigint").alias("lat"),
    )


@register(
    "null_handling_suite",
    oracle="""
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULTED') AS seg_coalesced,
       ifnull(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg_ifnull,
       CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
            THEN 'has' ELSE 'none' END AS seg_nvl2,
       (c_mktsegment IS NOT DISTINCT FROM 'BUILDING') AS is_building_nullsafe,
       isnan(CASE WHEN c_acctbal < 0 THEN 'NaN'::DOUBLE ELSE c_acctbal END)
           AS negative_bal_nan
FROM customer
WHERE c_custkey % 10 = 0
""",
    survey_ref="P7,F13",
    doc="null family: nullif/coalesce/ifnull/nvl2/null-safe-eq/isnan (P7 default semantics)",
)
def null_handling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 generalized: the reference swallows extraction misses into NULLs
    or presets (lianjia.py:64-73); this is the whole SQL NULL-handling
    family with cross-engine-identical semantics. NaN is produced
    conditionally (not parsed) because NaN literals round-trip differently
    through JSON."""
    cust = load_tables(spark, sf_dir, names=("customer",))["customer"]
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("DEFAULTED")).alias("seg_coalesced"),
        F.ifnull(seg_null, F.lit("N/A")).alias("seg_ifnull"),
        F.nvl2(seg_null, F.lit("has"), F.lit("none")).alias("seg_nvl2"),
        F.col("c_mktsegment").eqNullSafe(F.lit("BUILDING")).alias(
            "is_building_nullsafe"
        ),
        F.isnan(
            F.when(F.col("c_acctbal") < 0, F.lit(float("nan"))).otherwise(
                F.col("c_acctbal")
            )
        ).alias("negative_bal_nan"),
    )


@register(
    "posexplode_tokens",
    oracle="""
SELECT doc_id,
       generate_subscripts(string_split(text, ' ')[1:5], 1) - 1 AS pos,
       unnest(string_split(text, ' ')[1:5]) AS token
FROM documents
WHERE doc_id % 25 = 0
""",
    survey_ref="P1,F13",
    doc="positional lateral expansion: posexplode of the first 5 tokens per doc",
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1's multi-valued projection with ordinal positions — the native
    (JVM, codegen'd Generate) counterpart of the Python-UDTF variant
    (udtf_tokenize). At scale Generate expands inline per input row: no
    shuffle, no Python boundary."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return (
        docs.filter(F.col("doc_id") % 25 == 0)
        .select(
            "doc_id",
            F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias("pos", "token"),
        )
    )


@register(
    "variant_json_suite",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       COUNT(json_extract_string(props, '$.missing')) AS n_missing_present
FROM events
GROUP BY event_type
""",
    survey_ref="F7,A3",
    doc="VARIANT semi-structured path: parse_json -> variant_get typed extraction + agg",
)
def variant_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT as the semi-structured fast path: ``parse_json`` once
    into a variant column (binary-encoded, shreddable at the scan at scale),
    then typed ``variant_get``/``try_variant_get`` extraction — instead of
    re-parsing the JSON string per field as ``get_json_object`` does. The
    DuckDB oracle reads the same fields through its JSON extension."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    parsed = ev.select("event_type", F.parse_json("props").alias("v"))
    return parsed.select(
        "event_type",
        F.expr("try_variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("try_variant_get(v, '$.missing', 'string')").alias("m"),
    ).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("m").alias("n_missing_present"),
    )


@register(
    "json_construct_roundtrip",
    oracle="""
SELECT event_id,
       to_json(struct_pack(t := event_type, k := TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) * 2)) AS j,
       TRY_CAST(json_extract_string(to_json(struct_pack(t := event_type, k := TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) * 2)), '$.k') AS BIGINT) AS k2
FROM events
WHERE event_id % 97 = 0
""",
    survey_ref="F7,F4",
    doc="JSON construction round-trip: named_struct -> to_json -> re-extract, byte-identical cross-engine",
)
def json_construct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construct-side JSON (the reference's feed-export analog, README.md:7):
    build a struct, serialize with ``to_json``, and re-extract. Both engines
    emit the same compact ``{"t":...,"k":...}`` form, so the serialized
    string itself is oracle-hashed, not just the reparsed value."""
    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    k2 = F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)") * 2
    # ignoreNullFields=false: emit "k":null like the DuckDB oracle does, so
    # byte-identity does not silently depend on every row having a numeric
    # $.k (it does in the fixed testdata; null props would diverge).
    j = F.to_json(
        F.struct(F.col("event_type").alias("t"), k2.alias("k")),
        {"ignoreNullFields": "false"},
    )
    return (
        ev.filter(F.col("event_id") % 97 == 0)
        .select(
            "event_id",
            j.alias("j"),
            F.expr(
                "try_cast(get_json_object("
                "to_json(named_struct('t', event_type,"
                " 'k', try_cast(get_json_object(props, '$.k') AS BIGINT) * 2),"
                " map('ignoreNullFields', 'false')),"
                " '$.k') AS BIGINT)"
            ).alias("k2"),
        )
    )


@register(
    "explode_outer_digits",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(str_split(text, ' '), x -> regexp_full_match(x, '[0-9]+')) AS nums
  FROM documents
  WHERE doc_id % 7 = 0
)
SELECT doc_id,
       unnest(CASE WHEN nums IS NULL OR len(nums) = 0 THEN [NULL] ELSE nums END)
           AS num_token
FROM toks
""",
    survey_ref="P1,P7,F13",
    doc="explode_outer: lateral expansion preserving rows whose array is empty (NULL row)",
)
def explode_outer_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving lateral expansion (P1 + the P7 default-on-miss rule):
    digit-only tokens per document are often an empty array, and
    ``explode_outer`` keeps those documents as a NULL row where plain
    ``explode`` would drop them — the same absent-means-null convention the
    reference's feed export forces on consumers (SURVEY §1.3)."""
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    nums = F.filter(F.split("text", " "), lambda x: x.rlike("^[0-9]+$"))
    return (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", F.explode_outer(nums).alias("num_token"))
    )
