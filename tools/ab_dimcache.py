"""A/B: dimension buffer-pool cacheTable vs plain parquet-broadcast joins.

Interleaved within one process (host throttles in phases), bench-identical
session config. Usage: python tools/ab_dimcache.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.plans.registry import all_queries
from data_etl_sh_lianjia_spark.session import (
    DIM_TABLES,
    get_spark,
    ingest_tables,
    register_views,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["q1_scan_agg", "q3_join3", "q5_join5", "cosine_topk", "window_rank"]
ROUNDS = 15


def set_cache(spark, on: bool) -> None:
    cached = getattr(spark, "_lianjia_cached_views", set())
    for name in DIM_TABLES:
        view = f"lj_{name}"
        try:
            if on and view not in cached:
                spark.catalog.cacheTable(view)
                spark.table(view).count()
                cached.add(view)
            elif not on and view in cached:
                spark.catalog.uncacheTable(view)
                cached.discard(view)
        except Exception as exc:
            print(f"cache toggle {view}: {exc}", file=sys.stderr)
    spark._lianjia_cached_views = cached


def main() -> None:
    spark = get_spark(
        app_name="ab-dimcache",
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
    qs = {n: dq for n, dq in all_queries().items() if n in QUERIES}
    # warm both shapes
    for on in (True, False, True, False):
        set_cache(spark, on)
        for dq in qs.values():
            dq.spark_fn(spark, SF_DIR).toArrow()
    t = {n: {True: [], False: []} for n in QUERIES}
    for r in range(ROUNDS):
        for on in (True, False):
            set_cache(spark, on)
            for n, dq in sorted(qs.items()):
                t0 = time.perf_counter()
                dq.spark_fn(spark, SF_DIR).toArrow()
                t[n][on].append(time.perf_counter() - t0)
    for n in QUERIES:
        on_ms = statistics.median(t[n][True]) * 1000
        off_ms = statistics.median(t[n][False]) * 1000
        print(f"{n:16s} cached={on_ms:7.1f}ms  plain={off_ms:7.1f}ms  "
              f"ratio={on_ms / off_ms:.2f}")


if __name__ == "__main__":
    main()
