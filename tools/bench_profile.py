"""Decompose bench-query wall time: DataFrame build (py4j + analysis),
Catalyst phases, first execution, and steady-state re-execution of the
SAME DataFrame object (pure run-time, no planning).

Usage: python tools/bench_profile.py [names...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.plans.registry import all_queries
from data_etl_sh_lianjia_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(
        app_name="bench-profile",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE", "8")),
        extra_conf={
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
        },
    )
    qs = {n: dq for n, dq in all_queries().items() if dq.bench}
    if names:
        qs = {n: qs[n] for n in names}

    # warmup
    for _ in range(3):
        for dq in qs.values():
            dq.spark_fn(spark, SF_DIR).collect()

    print(f"{'query':24s} {'build':>7s} {'plan':>7s} {'exec1':>7s} {'reexec':>7s} {'total':>7s}")
    for name, dq in sorted(qs.items()):
        builds, plans, exec1s, reexecs = [], [], [], []
        for _ in range(7):
            t0 = time.perf_counter()
            df = dq.spark_fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.toPandas()
            t2 = time.perf_counter()
            try:
                phases = df._jdf.queryExecution().tracker().phases()
                it, ms = phases.iterator(), 0
                while it.hasNext():
                    summ = it.next()._2()
                    ms += summ.endTimeMs() - summ.startTimeMs()
                plans.append(ms / 1000.0)
            except Exception:
                plans.append(float("nan"))
            t3 = time.perf_counter()
            df.toPandas()
            t4 = time.perf_counter()
            builds.append(t1 - t0)
            exec1s.append(t2 - t1)
            reexecs.append(t4 - t3)
        med = lambda xs: statistics.median(xs)
        print(
            f"{name:24s} {med(builds):7.3f} {med(plans):7.3f} {med(exec1s):7.3f}"
            f" {med(reexecs):7.3f} {med(builds) + med(exec1s):7.3f}"
        )


if __name__ == "__main__":
    main()
