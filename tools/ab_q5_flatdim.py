"""A/B: q5 flat 5-broadcast form vs a session-materialized flattened
supplier-geography dim (supplier JOIN nation JOIN region, cached once).

The r3 A/B showed per-QUERY pre-merging of nation x region loses (the merge
join runs as serialized sub-jobs inside every broadcast build). This probes
the engine-level variant: materialize the snowflake path ONCE per session
(cacheTable), so each q5 run pays 2 broadcast builds instead of 5.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.plans.registry import all_queries
from data_etl_sh_lianjia_spark.session import get_spark, ingest_tables, register_views

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 15

Q5_FLAT = """
SELECT /*+ BROADCAST(c), BROADCAST(s) */
       n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28, 4))) AS DOUBLE) AS revenue
FROM lj_lineitem l
JOIN lj_orders o   ON l_orderkey = o_orderkey
JOIN lj_customer c ON c_custkey  = o_custkey
JOIN lj_supplier_geo s ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
GROUP BY n_name
"""


def main() -> None:
    spark = get_spark(
        app_name="ab-q5",
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
    spark.sql(
        """
        SELECT s.*, n.n_name, n.n_regionkey, r.r_name
        FROM lj_supplier s
        JOIN lj_nation n ON s_nationkey = n_nationkey
        JOIN lj_region r ON n_regionkey = r_regionkey
        """
    ).createOrReplaceTempView("lj_supplier_geo")
    spark.catalog.cacheTable("lj_supplier_geo")
    spark.table("lj_supplier_geo").count()

    q5 = all_queries()["q5_join5"]
    variants = {
        "flat5": lambda: q5.spark_fn(spark, SF_DIR),
        "geo2": lambda: spark.sql(Q5_FLAT),
    }
    # value check
    import pandas as pd  # noqa: F401
    a = variants["flat5"]().toPandas().sort_values("n_name").reset_index(drop=True)
    b = variants["geo2"]().toPandas().sort_values("n_name").reset_index(drop=True)
    assert a.equals(b[a.columns]), (a, b)
    print("values match")
    for _ in range(4):
        for fn in variants.values():
            fn().toArrow()
    t = {n: [] for n in variants}
    for _ in range(ROUNDS):
        for n, fn in variants.items():
            t0 = time.perf_counter()
            fn().toArrow()
            t[n].append(time.perf_counter() - t0)
    for n, ts in t.items():
        print(f"{n:8s} median={statistics.median(ts)*1000:7.1f}ms  "
              f"best={min(ts)*1000:7.1f}ms")


if __name__ == "__main__":
    main()
