"""Scaling-curve measurement: headline-query wall time vs data scale.

Purpose: back the 100 TB design claim with a measured curve — if a query's
cost were dominated by per-query fixed overhead (task launch, py4j, Arrow
serve), its wall time would be flat in data size; if the plan scaled
badly (quadratic pair explosion, driver collects), it would grow faster
than the data. The healthy signature on this 32-core box is strongly
sub-linear growth from sf0.01 to sf0.1 (floor-dominated) turning into
~linear growth from sf0.1 to the 10x replica (compute-dominated, scan
parallelism saturating the cores).

The 10x point replicates the sf0.1 tables with per-key-domain offsets
(10 disjoint copies of the database — FK joins, group cardinalities and
selectivities all scale the way TPC-H SF does). Perf measurement only;
correctness at this scale is covered by the sf0.1 registry sweep.

Usage: python tools/scale_curve.py [out.json]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from data_etl_sh_lianjia_spark.session import (
    TABLES,
    get_spark,
    ingest_tables,
    table_path,
)
from data_etl_sh_lianjia_spark.plans.registry import all_queries

BASE = "/root/testdata/sf0.1"
X10_DIR = "/tmp/spark-graft-scale/sf1.0x"
REPLICAS = 10

# key domains: columns that must shift together so the replica is a
# disjoint, FK-consistent copy of the database
KEY_DOMAINS = {
    "regionkey": [("region", "r_regionkey"), ("nation", "n_regionkey")],
    "nationkey": [
        ("nation", "n_nationkey"),
        ("customer", "c_nationkey"),
        ("supplier", "s_nationkey"),
    ],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}


def build_x10() -> None:
    if os.path.exists(os.path.join(X10_DIR, "_SUCCESS")):
        return
    os.makedirs(X10_DIR, exist_ok=True)
    shift_cols = {}  # (table, col) -> domain offset unit
    for cols in KEY_DOMAINS.values():
        unit = 0
        for t, c in cols:
            tab = pq.read_table(table_path(BASE, t), columns=[c])
            unit = max(unit, pc.max(tab[c]).as_py() + 1)
        for t, c in cols:
            shift_cols[(t, c)] = unit
    for t in TABLES:
        tab = pq.read_table(table_path(BASE, t))
        chunks = []
        for r in range(REPLICAS):
            cols = []
            for name in tab.column_names:
                col = tab[name]
                unit = shift_cols.get((t, name))
                if unit and r:
                    col = pc.add(col, pa.scalar(r * unit, type=col.type))
                cols.append(col)
            chunks.append(pa.table(dict(zip(tab.column_names, cols))))
        out = pa.concat_tables(chunks)
        pq.write_table(out, os.path.join(X10_DIR, f"{t}.parquet"))
    open(os.path.join(X10_DIR, "_SUCCESS"), "w").close()


def main() -> None:
    build_x10()
    spark = get_spark(
        app_name="scale_curve",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
        },
    )
    scales = {
        "sf0.01": "/root/testdata/sf0.01",
        "sf0.1": "/root/testdata/sf0.1",
        "sf1.0x": X10_DIR,
    }
    bench = {n: dq for n, dq in all_queries().items() if dq.bench}
    runs = int(os.environ.get("SCALE_CURVE_RUNS", "7"))
    for d in scales.values():
        ingest_tables(spark, d)
    # warm every (query, scale) once
    for d in scales.values():
        for dq in bench.values():
            dq.spark_fn(spark, d).toPandas()
    samples = {(n, s): [] for n in bench for s in scales}
    for _ in range(runs):
        for n, dq in sorted(bench.items()):
            for s, d in scales.items():
                t0 = time.perf_counter()
                dq.spark_fn(spark, d).toPandas()
                samples[(n, s)].append(time.perf_counter() - t0)
    result = {
        n: {s: round(statistics.median(samples[(n, s)]) * 1000, 1) for s in scales}
        for n in sorted(bench)
    }
    # Same-host DuckDB reference at every scale (the BASELINE.md engine,
    # re-executing each bench query's own oracle SQL): at sf0.1 Spark's
    # fixed per-query driver cost dominates the ratio; the 10x point shows
    # the ratio the fixed floor was hiding once both engines are
    # compute-bound. DuckDB reads the raw landed files — its scan
    # parallelizes over row groups natively, so it needs no re-layout.
    duck = {}
    for s, d in scales.items():
        con = duckdb.connect()
        for t in TABLES:
            p = table_path(d, t)
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        for n, dq in sorted(bench.items()):
            if not dq.oracle:
                continue
            con.execute(dq.oracle).fetchall()  # warm
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(dq.oracle).fetchall()
                ts.append(time.perf_counter() - t0)
            duck.setdefault(n, {})[s] = round(statistics.median(ts) * 1000, 1)
        con.close()
    out = {
        "scales": list(scales),
        "runs": runs,
        "median_ms": result,
        "duckdb_median_ms": duck,
    }
    print(json.dumps(out, indent=1))
    if len(sys.argv) > 1:
        json.dump(out, open(sys.argv[1], "w"), indent=1)


if __name__ == "__main__":
    main()
