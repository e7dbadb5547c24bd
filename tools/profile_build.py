"""Break down the fresh-build cost: parse/analyze (spark.sql) vs optimize+
plan+execute (toPandas), tracker phases, and sensitivity to relation size."""

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


def main():
    spark = get_spark(
        app_name="profile2",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
        },
    )
    ingest_tables(spark, SF_DIR)
    register_views(spark, SF_DIR)

    dc_sql = """
SELECT COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS n_rows
FROM lj_lineitem
"""
    simple_li = "SELECT COUNT(*) AS n FROM lj_lineitem"
    simple_reg = "SELECT COUNT(*) AS n FROM lj_region"

    for _ in range(5):
        spark.sql(dc_sql).toPandas()
        spark.sql(simple_li).toPandas()
        spark.sql(simple_reg).toPandas()

    def split_timed(sql, runs=RUNS):
        t_sql, t_act, phases_ms = [], [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = spark.sql(sql)
            t1 = time.perf_counter()
            df.toPandas()
            t2 = time.perf_counter()
            t_sql.append(t1 - t0)
            t_act.append(t2 - t1)
            try:
                ph = df._jdf.queryExecution().tracker().phases()
                it = ph.iterator()
                d = {}
                while it.hasNext():
                    e = it.next()
                    s = e._2()
                    d[e._1()] = s.endTimeMs() - s.startTimeMs()
                phases_ms.append(d)
            except Exception:
                pass
        med = lambda xs: round(statistics.median(xs) * 1000, 1)
        out = {"sql": med(t_sql), "action": med(t_act)}
        if phases_ms:
            keys = set().union(*phases_ms)
            out["phases"] = {
                k: round(statistics.median([p.get(k, 0) for p in phases_ms]), 1)
                for k in keys
            }
        return out

    out = {}
    out["dc"] = split_timed(dc_sql)
    out["count_lineitem"] = split_timed(simple_li)
    out["count_region"] = split_timed(simple_reg)
    out["select1"] = split_timed("SELECT 1 AS x")

    # Does reading via spark.table (no view) differ?
    out["count_li_table"] = split_timed("SELECT COUNT(*) AS n FROM lj_lineitem WHERE l_partkey > 0")

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
