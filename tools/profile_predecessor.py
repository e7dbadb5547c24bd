"""Measure q1's wall time as a function of which query ran before it."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.session import get_spark, ingest_tables
from data_etl_sh_lianjia_spark.plans.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET = sys.argv[1] if len(sys.argv) > 1 else "q1_scan_agg"

spark = get_spark(
    app_name="profile_pred",
    shuffle_partitions=8,
    extra_conf={
        "spark.sql.constraintPropagation.enabled": "false",
        "spark.sql.adaptive.enabled": "false",
        "spark.locality.wait": "0",
        "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
    },
)
ingest_tables(spark, SF_DIR)
Q = all_queries()
bench = {n: dq for n, dq in Q.items() if dq.bench}
tgt = Q[TARGET]

for _ in range(3):
    for dq in bench.values():
        dq.spark_fn(spark, SF_DIR).toPandas()

RUNS = 7
t_by_pred: dict[str, list[float]] = {n: [] for n in bench}
t_by_pred["<self>"] = []
for r in range(RUNS):
    for pname, pdq in sorted(bench.items()):
        if pname == TARGET:
            continue
        pdq.spark_fn(spark, SF_DIR).toPandas()
        t0 = time.perf_counter()
        tgt.spark_fn(spark, SF_DIR).toPandas()
        t_by_pred[pname].append(time.perf_counter() - t0)
    # self-predecessor baseline
    tgt.spark_fn(spark, SF_DIR).toPandas()
    t0 = time.perf_counter()
    tgt.spark_fn(spark, SF_DIR).toPandas()
    t_by_pred["<self>"].append(time.perf_counter() - t0)

for n in sorted(t_by_pred, key=lambda n: statistics.median(t_by_pred[n]) if t_by_pred[n] else 0):
    ts = t_by_pred[n]
    if ts:
        print(f"{TARGET} after {n:22s} med={statistics.median(ts)*1000:7.1f} "
              f"min={min(ts)*1000:7.1f} max={max(ts)*1000:8.1f}")
