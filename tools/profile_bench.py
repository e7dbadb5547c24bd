"""One-session A/B profiler for the bench headline queries.

Measures, interleaved in a single warm session:
- the per-query floor (select 1, tiny table scan) via toPandas,
- q1 variants (view SQL, prebuilt plan re-execute, cached table),
- distinct_count variants (Expand plan vs two-agg-join vs pre-agg).

Prints one JSON line per measurement set.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.session import get_spark, ingest_tables, register_views

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "9"))


def timed(fn, runs=RUNS):
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts) * 1000, 1), round(min(ts) * 1000, 1)


def main():
    spark = get_spark(
        app_name="profile",
        shuffle_partitions=int(os.environ.get("SHUF", "8")),
        extra_conf={
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
        },
    )
    ingest_tables(spark, SF_DIR)
    register_views(spark, SF_DIR)

    from data_etl_sh_lianjia_spark.operators.relational import (  # noqa: F401
        _Q1_CUTOFF,
    )
    from data_etl_sh_lianjia_spark.functions.deterministic import spark_dsum, spark_davg

    q1_sql = f"""
SELECT l_returnflag, l_linestatus,
       {spark_dsum('l_quantity', 'sum_qty')},
       {spark_dsum('l_extendedprice', 'sum_base_price')},
       {spark_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {spark_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge', scale=6)},
       {spark_davg('l_quantity', 'avg_qty')},
       {spark_davg('l_extendedprice', 'avg_price')},
       {spark_davg('l_discount', 'avg_disc', scale=6)},
       COUNT(*) AS count_order
FROM lj_lineitem
WHERE l_shipdate <= TIMESTAMP_NTZ '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""
    dc_sql = """
SELECT COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS n_rows
FROM lj_lineitem
"""
    dc_join_sql = """
SELECT p.distinct_parts, s.distinct_supps, c.n_rows
FROM (SELECT COUNT(DISTINCT l_partkey) AS distinct_parts FROM lj_lineitem) p
CROSS JOIN (SELECT COUNT(DISTINCT l_suppkey) AS distinct_supps FROM lj_lineitem) s
CROSS JOIN (SELECT COUNT(*) AS n_rows FROM lj_lineitem) c
"""
    dc_union_sql = """
SELECT
  CAST(MAX(CASE WHEN which = 0 THEN n END) AS BIGINT) AS distinct_parts,
  CAST(MAX(CASE WHEN which = 1 THEN n END) AS BIGINT) AS distinct_supps,
  CAST(MAX(CASE WHEN which = 2 THEN n END) AS BIGINT) AS n_rows
FROM (
  SELECT 0 AS which, COUNT(*) AS n FROM (SELECT l_partkey FROM lj_lineitem GROUP BY l_partkey)
  UNION ALL
  SELECT 1, COUNT(*) FROM (SELECT l_suppkey FROM lj_lineitem GROUP BY l_suppkey)
  UNION ALL
  SELECT 2, COUNT(*) FROM lj_lineitem
)
"""

    # warmups
    for _ in range(4):
        spark.sql("SELECT 1 AS x").toPandas()
        spark.sql(q1_sql).toPandas()
        spark.sql(dc_sql).toPandas()
        spark.sql(dc_join_sql).toPandas()
        spark.sql(dc_union_sql).toPandas()
        spark.sql("SELECT COUNT(*) AS n FROM lj_region").toPandas()

    out = {}
    out["floor_select1"] = timed(lambda: spark.sql("SELECT 1 AS x").toPandas())
    out["floor_region_count"] = timed(
        lambda: spark.sql("SELECT COUNT(*) AS n FROM lj_region").toPandas()
    )
    # q1: full rebuild each time (bench protocol)
    out["q1_view_sql"] = timed(lambda: spark.sql(q1_sql).toPandas())
    # q1: prebuilt DataFrame, re-execute only (isolates execution from planning)
    q1_df = spark.sql(q1_sql)
    out["q1_reexec"] = timed(lambda: q1_df.toPandas())
    # q1: count only the scan+filter (no agg)
    out["q1_scan_only"] = timed(
        lambda: spark.sql(
            f"SELECT COUNT(*) AS n FROM lj_lineitem WHERE l_shipdate <= TIMESTAMP_NTZ '{_Q1_CUTOFF}'"
        ).toPandas()
    )
    out["dc_expand"] = timed(lambda: spark.sql(dc_sql).toPandas())
    out["dc_join"] = timed(lambda: spark.sql(dc_join_sql).toPandas())
    out["dc_union"] = timed(lambda: spark.sql(dc_union_sql).toPandas())
    dc_df = spark.sql(dc_sql)
    out["dc_expand_reexec"] = timed(lambda: dc_df.toPandas())
    dcu_df = spark.sql(dc_union_sql)
    out["dc_union_reexec"] = timed(lambda: dcu_df.toPandas())

    # collect vs toPandas on q1 (tiny result)
    out["q1_collect"] = timed(lambda: spark.sql(q1_sql).collect())

    print(json.dumps(out))


if __name__ == "__main__":
    main()
