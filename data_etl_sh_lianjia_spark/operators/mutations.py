"""Managed-table mutation surface — predicate (row-level) DELETE.

[derived] The reference (reference/house_spider/spiders/lianjia.py) is an
append-only crawler with no delete analogue; a 100 TB training-data
pipeline additionally needs lakehouse-grade row removal (GDPR /
right-to-be-forgotten, bad-shard excision). The engine implements it as
:func:`data_etl_sh_lianjia_spark.session.delete_where`: O(affected files +
projection sizes) — unaffected part files hardlink into the new
generation, SUM-mergeable projections absorb the removed rows as NEGATIVE
deltas, ordered/vector artifacts rebuild, the bucketed fact copies rewrite
only affected bucket files.

The two declared queries below make the delete path driver-verifiable:
each scratch-copies a table, ingests it, deletes by predicate, and returns
an aggregate the DuckDB oracle reproduces with ``WHERE NOT(predicate)`` —
``delete_where_q1_projection`` additionally serves its aggregate from the
NEGATIVE-MERGED coarse rollup (the q1 projection family), so a driver
hash-match proves the negative merge bit-identical, not just the table
rewrite.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from data_etl_sh_lianjia_spark.functions.deterministic import (
    dsum,
    oracle_dsum,
)
from data_etl_sh_lianjia_spark.plans.registry import register


def _scratch_copy(sf_dir: str, table: str) -> str:
    """Fresh scratch sf-dir containing a copy of one landed table (file or
    directory form). Callers delete it (and its managed copy) when done."""
    scratch = tempfile.mkdtemp(prefix="spark-graft-delmut-")
    src = os.path.join(sf_dir, f"{table}.parquet")
    dst = os.path.join(scratch, f"{table}.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy(src, dst)
    return scratch


def _drop_scratch(spark: SparkSession, scratch: str) -> None:
    """Remove the scratch sf-dir AND its managed ingest copy (the scratch
    path is unique per invocation, so a leftover managed dir would leak
    one copy per call)."""
    redirect = getattr(spark, "_lianjia_ingest_map", None) or {}
    out_dir = redirect.pop(os.path.normpath(scratch), None)
    if out_dir:
        shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(scratch, ignore_errors=True)


@register(
    "delete_where_orders",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice', 'sum_total', scale=2)}
FROM orders
WHERE o_orderstatus IS NULL OR o_orderstatus <> 'F'
GROUP BY o_orderpriority
""",
    survey_ref="S9,A3",
    doc="predicate DELETE on the managed orders copy; post-delete aggregate",
    tags=("mutation",),
)
def delete_where_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE FROM orders WHERE o_orderstatus = 'F' on a scratch managed
    copy, then aggregate the post-delete table — the oracle runs the
    complementary filter over the untouched source, so a hash match proves
    the rewrite removed exactly the matched rows (NULL-predicate rows
    survive, per SQL DELETE semantics)."""
    import pyarrow.compute as pc
    from pyspark.sql import functions as F

    from data_etl_sh_lianjia_spark.session import delete_where

    scratch = _scratch_copy(sf_dir, "orders")
    try:
        delete_where(spark, scratch, "orders", pc.field("o_orderstatus") == "F")
        out_dir = spark._lianjia_ingest_map[os.path.normpath(scratch)]
        post = spark.read.parquet(os.path.join(out_dir, "orders.parquet"))
        result = post.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_total", scale=2),
        )
        rows = result.collect()  # tiny summary; lets the scratch dir drop
        return spark.createDataFrame(rows, result.schema)
    finally:
        _drop_scratch(spark, scratch)


@register(
    "delete_where_q1_projection",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {oracle_dsum('l_quantity', 'sum_qty')},
       {oracle_dsum('l_extendedprice', 'sum_base_price')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  AND (l_quantity IS NULL OR l_quantity < 45)
GROUP BY l_returnflag, l_linestatus
""",
    survey_ref="A3,P5",
    doc="predicate DELETE negative-merges the q1 rollup; aggregate served from it",
    tags=("mutation",),
)
def delete_where_q1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE FROM lineitem WHERE l_quantity >= 45 on a scratch managed
    copy, then run the q1-family aggregate SERVED FROM THE NEGATIVE-MERGED
    COARSE ROLLUP (session._AGG_PROJECTIONS lineitem "q1cut") — the oracle
    recomputes over the source with the complementary filter, so a hash
    match proves the negative merge is bit-identical to a from-scratch
    rebuild, not merely that the table rewrite worked. Falls back to the
    full scan over the post-delete managed copy if the projection is
    unexpectedly unavailable (same values either way)."""
    import pyarrow.compute as pc

    from data_etl_sh_lianjia_spark.session import (
        aggproj_coarse_view,
        delete_where,
    )

    scratch = _scratch_copy(sf_dir, "lineitem")
    try:
        delete_where(spark, scratch, "lineitem", pc.field("l_quantity") >= 45)
        ap2 = aggproj_coarse_view(spark, scratch, "lineitem")
        if ap2 is not None:
            result = spark.sql(f"""
SELECT l_returnflag, l_linestatus,
       CAST(s_qty AS DOUBLE) / 10000.0D AS sum_qty,
       CAST(s_price AS DOUBLE) / 10000.0D AS sum_base_price,
       cnt AS count_order
FROM {ap2}
""")
        else:
            from data_etl_sh_lianjia_spark.functions.deterministic import (
                spark_dsum,
            )

            out_dir = spark._lianjia_ingest_map[os.path.normpath(scratch)]
            spark.read.parquet(
                os.path.join(out_dir, "lineitem.parquet")
            ).createOrReplaceTempView("_delmut_lineitem")
            result = spark.sql(f"""
SELECT l_returnflag, l_linestatus,
       {spark_dsum('l_quantity', 'sum_qty')},
       {spark_dsum('l_extendedprice', 'sum_base_price')},
       COUNT(*) AS count_order
FROM _delmut_lineitem
WHERE l_shipdate <= TIMESTAMP_NTZ '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
        rows = result.collect()
        return spark.createDataFrame(rows, result.schema)
    finally:
        _drop_scratch(spark, scratch)
