"""Prototype: co-bucketed lineitem/orders -> shuffle-free q3 (VERDICT r5 #1).

Builds bucketed copies of the two facts at sf0.1, re-registers them as
external bucketed tables (the per-session serving path), runs the q3 shape,
and prints plan properties + timings vs the current shuffled-hash plan.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.session import get_spark, load_tables, register_views
from data_etl_sh_lianjia_spark.plans.registry import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NB = int(os.environ.get("NB", "32"))

spark = get_spark()
spark.conf.set("spark.sql.shuffle.partitions", "32")

t = load_tables(spark, SF_DIR, names=("orders", "lineitem"))

base = "/tmp/proto-bucketed"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)

t0 = time.time()
for name, col in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
    path = f"{base}/{name}"
    tmp_name = f"_proto_{name}"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
    (
        t[name]
        .repartition(NB, F.col(col))
        .write.bucketBy(NB, col)
        .sortBy(col)
        .option("path", path)
        .saveAsTable(tmp_name)
    )
    spark.sql(f"DROP TABLE {tmp_name}")
print(f"build: {time.time() - t0:.2f}s")

# per-session re-registration over the existing files (no rewrite)
for name, col in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
    path = f"{base}/{name}"
    ddl = spark.read.parquet(path)._jdf.schema().toDDL()
    spark.sql(f"DROP TABLE IF EXISTS bkt_{name}")
    spark.sql(
        f"CREATE TABLE bkt_{name} ({ddl}) USING PARQUET"
        f" CLUSTERED BY ({col}) SORTED BY ({col}) INTO {NB} BUCKETS"
        f" LOCATION '{path}'"
    )
    n_files = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    print(f"bkt_{name}: {n_files} files / {NB} buckets")

register_views(spark, SF_DIR)

Q3_BKT = """
SELECT /*+ BROADCAST(c), MERGE(l, o) */ l_orderkey,
       CAST(CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000
           + 0.5) AS BIGINT)) AS DECIMAL(38,6)) / 10000 AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE) AS orderdate,
       o_orderpriority
FROM bkt_lineitem l
JOIN bkt_orders o   ON l_orderkey = o_orderkey
JOIN lj_customer c ON c_custkey = o_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP_NTZ '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP_NTZ '1996-03-15 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

df = spark.sql(Q3_BKT)
plan = df._jdf.queryExecution().executedPlan().toString()
print("Exchange count:", plan.count("Exchange"))
print("BroadcastExchange count:", plan.count("BroadcastExchange"))
print("Sort count:", plan.count("Sort "))
print("SortMergeJoin:", "SortMergeJoin" in plan)
rows_b = df.collect()

q3 = all_queries()["q3_join3"].spark_fn
rows_cur = q3(spark, SF_DIR).collect()
assert [tuple(r) for r in rows_b] == [tuple(r) for r in rows_cur], "MISMATCH"
print("results match current q3")

for label, run in (
    ("bucketed", lambda: spark.sql(Q3_BKT).collect()),
    ("current", lambda: q3(spark, SF_DIR).collect()),
):
    times = []
    for _ in range(15):
        s = time.time()
        run()
        times.append(time.time() - s)
    times.sort()
    print(f"{label}: median {times[7]*1000:.1f} ms best {times[0]*1000:.1f} ms")

print(plan[:3000])
