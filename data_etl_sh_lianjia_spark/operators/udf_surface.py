"""UDF / UDAF / UDTF surface — SURVEY.md §2.10.

The reference's extension points are per-record Python hooks: spider
callbacks (`lianjia.py:26-218`), the item pipeline (`pipelines.py:10`), and
middlewares (`middlewares.py:72-101`). The engine exposes the full Spark
ladder, fastest first:

1. built-in Column expressions (everything else in this repo) — JVM codegen;
2. ``pandas_udf`` — vectorized over Arrow batches (~10-100× row-UDFs);
3. ``applyInPandas`` — grouped-map (UDAF-shaped);
4. Python UDTF — table function (one row in, many out);
5. ``spark.udf.register`` row-at-a-time Python — the slow path, kept for
   parity with the reference's per-item hooks; never used in hot paths.

All UDF closures are self-contained (cloudpickle by value) and the package
is shipped to workers (session.ensure_package_shipped).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import ensure_package_shipped, load_tables


@register(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
WHERE l_orderkey % 499 = 0
""",
    survey_ref="UDF(pandas)",
    doc="vectorized pandas_udf (Series->Series) net-price; IEEE-identical to SQL",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_package_shipped(spark)
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]

    @F.pandas_udf(T.DoubleType())
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)  # same IEEE ops as the SQL expression

    return li.filter(F.col("l_orderkey") % 499 == 0).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "udf_grouped_demean",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey, l_returnflag,
       round(l_quantity - AVG(l_quantity) OVER (PARTITION BY l_returnflag), 6)
         AS qty_demeaned
FROM lineitem
WHERE l_orderkey % 499 = 0
""",
    survey_ref="UDF(applyInPandas),A3",
    doc="grouped-map applyInPandas per-group demean == window AVG oracle",
)
def udf_grouped_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_package_shipped(spark)
    li = (
        load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
        .filter(F.col("l_orderkey") % 499 == 0)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_returnflag", "l_quantity")
    )

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_quantity"].to_numpy()
        out = pdf[["l_orderkey", "l_linenumber", "l_partkey", "l_returnflag"]].copy()
        out["qty_demeaned"] = (x - x.sum() / len(x)).round(6)
        return out

    return li.groupBy("l_returnflag").applyInPandas(
        demean,
        "l_orderkey long, l_linenumber int, l_partkey long, "
        "l_returnflag string, qty_demeaned double",
    )


@register(
    "udtf_tokenize",
    oracle="""
SELECT doc_id, i AS pos, toks[i] AS tok
FROM (
  SELECT doc_id, string_split(text, ' ') AS toks,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS i
  FROM documents
  WHERE doc_id % 97 = 0
)
""",
    survey_ref="UDF(udtf),P1",
    doc="Python UDTF: one doc row in -> (pos, token) rows out (lateral join)",
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_package_shipped(spark)
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    docs.filter(F.col("doc_id") % 97 == 0).createOrReplaceTempView("docs_for_udtf")

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, tok string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.tok
        FROM docs_for_udtf, LATERAL tokenize_udtf(text) AS t
        """
    )


@register(
    "udf_row_registered",
    oracle="""
SELECT c_custkey,
       lower(substring(c_mktsegment, 1, 2)) || CAST(length(c_mktsegment) AS VARCHAR)
         AS seg_code
FROM customer
WHERE c_custkey % 101 = 0
""",
    survey_ref="UDF(row)",
    doc="row-at-a-time registered Python UDF via spark.udf.register + SQL (the documented slow path)",
)
def udf_row_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_package_shipped(spark)
    cust = load_tables(spark, sf_dir, names=("customer",))["customer"]
    cust.filter(F.col("c_custkey") % 101 == 0).createOrReplaceTempView("cust_for_udf")

    def seg_code(seg: str) -> str:
        return None if seg is None else seg[:2].lower() + str(len(seg))

    spark.udf.register("seg_code_udf", seg_code, T.StringType())
    return spark.sql(
        "SELECT c_custkey, seg_code_udf(c_mktsegment) AS seg_code FROM cust_for_udf"
    )


@register(
    "udf_arrow_norms",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                          x -> x * x))), 4) AS l2_norm
FROM embeddings
WHERE vec_id % 4 = 0
""",
    survey_ref="UDF(arrow),L5",
    doc="mapInArrow over embedding batches: L2 norms straight off Arrow buffers",
)
def udf_arrow_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-copy rung of the UDF ladder: ``mapInArrow`` hands the Python
    worker raw ``pyarrow.RecordBatch``es — no pandas materialization, no
    per-row objects. The list column's values buffer is viewed as one flat
    numpy array and reshaped via its offsets; float32 inputs are widened to
    float64 before squaring exactly like the oracle's CAST(... AS DOUBLE[]),
    so the rounded norms hash-match."""
    import numpy as np
    import pyarrow as pa

    ensure_package_shipped(spark)
    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]

    def fn(batches):
        for batch in batches:
            ids = batch.column(0)
            col = batch.column(1)
            arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
            offsets = arr.offsets.to_numpy(zero_copy_only=False)
            flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
            sq = np.add.reduceat(flat * flat, offsets[:-1])
            dims = np.diff(offsets).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(dims, type=pa.int64()),
                    pa.array(np.round(np.sqrt(sq), 4), type=pa.float64()),
                ],
                names=["vec_id", "dim", "l2_norm"],
            )

    return (
        emb.filter(F.col("vec_id") % 4 == 0)
        .select("vec_id", "embedding")
        .mapInArrow(fn, "vec_id long, dim long, l2_norm double")
    )
