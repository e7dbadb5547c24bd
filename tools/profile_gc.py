"""Histogram 150 back-to-back q1 runs with GC logging to correlate stalls."""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.session import get_spark, ingest_tables
from data_etl_sh_lianjia_spark.plans.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GCLOG = "/tmp/spark-graft-gc.log"

spark = get_spark(
    app_name="profile_gc",
    shuffle_partitions=8,
    extra_conf={
        "spark.sql.constraintPropagation.enabled": "false",
        "spark.sql.adaptive.enabled": "false",
        "spark.locality.wait": "0",
        "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
        "spark.driver.extraJavaOptions": f"-Xlog:gc*:file={GCLOG}:time,uptime",
    },
)
ingest_tables(spark, SF_DIR)
Q = all_queries()
dq = Q[sys.argv[1] if len(sys.argv) > 1 else "q1_scan_agg"]

for _ in range(5):
    dq.spark_fn(spark, SF_DIR).toPandas()

ts = []
for i in range(150):
    t0 = time.perf_counter()
    dq.spark_fn(spark, SF_DIR).toPandas()
    ts.append(time.perf_counter() - t0)

ms = sorted(t * 1000 for t in ts)
print("p10/p25/p50/p75/p90/p99/max:",
      " ".join(f"{ms[int(len(ms)*p)]:.0f}" for p in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)),
      f"{ms[-1]:.0f}")
print("mean:", f"{statistics.mean(ms):.0f}", "n>2x_p10:",
      sum(1 for m in ms if m > 2 * ms[int(len(ms)*0.1)]))

# GC pause summary
import re
pauses = []
if os.path.exists(GCLOG):
    for line in open(GCLOG):
        m = re.search(r"Pause (\w+).*?(\d+\.\d+)ms", line)
        if m:
            pauses.append((m.group(1), float(m.group(2))))
big = [p for p in pauses if p[1] > 10]
print(f"GC pauses: {len(pauses)} total, {len(big)} >10ms, "
      f"sum>10ms={sum(p[1] for p in big):.0f}ms",
      "worst:", sorted((p[1] for p in pauses), reverse=True)[:5])
