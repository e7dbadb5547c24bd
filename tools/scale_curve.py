"""Scaling-curve measurement: headline-query wall time vs data scale.

Purpose: back the 100 TB design claim with a measured curve — if a query's
cost were dominated by per-query fixed overhead (task launch, py4j, Arrow
serve), its wall time would be flat in data size; if the plan scaled
badly (quadratic pair explosion, driver collects), it would grow faster
than the data. The healthy signature on this 32-core box is strongly
sub-linear growth from sf0.01 to sf0.1 (floor-dominated) turning into
~linear growth from sf0.1 to the 10x replica (compute-dominated, scan
parallelism saturating the cores).

The Nx points replicate the sf0.1 tables with per-key-domain offsets
(N disjoint copies of the database — FK joins, group cardinalities and
selectivities all scale the way TPC-H SF does). Perf measurement only;
correctness at this scale is covered by the sf0.1 registry sweep.

Usage: python tools/scale_curve.py [out.json]
  SCALE_CURVE_RUNS=N   samples per (query, scale); default 7
  SCALE_CURVE_X100=1   add a 100x point (lineitem 60M rows, ~11 GB; the
                       quadratic-oracle queries are skipped on the DuckDB
                       side there — an all-pairs join over 200k vectors
                       runs for hours in the reference engine)
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
SCALE_ROOT = "/tmp/spark-graft-scale"

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

# DuckDB-side sampling overrides, recorded EXPLICITLY in the output (a
# missing point must read as "measured infeasible", never as a silent gap):
# - "single": measured, but only once per scale — the query is tens of
#   seconds there (repetition_stats' O(distinct x words) list lambdas cost
#   ~43 s/run at 100x), so repeated sampling would take tens of minutes
#   without changing the conclusion. Recorded in duckdb_median_ms with the
#   scale listed under duckdb_single_run.
# - any other string: skipped entirely, with the reason recorded under
#   duckdb_skipped (quadratic all-pairs oracles measured 26 s at 10x ->
#   ~72 min/run extrapolated at 100x).
_QUADRATIC = "quadratic all-pairs oracle: 26 s at 10x, ~72 min/run at 100x"
_DUCK_SKIP_AT = {
    "cosine_topk": {"sf10x": _QUADRATIC},
    "ann_brute_topk": {"sf10x": _QUADRATIC},
    "repetition_stats": {"sf10x": "single"},
    # ~190 s/run in DuckDB at 100x (the replicated corpus makes every
    # duplicated doc pair across replicas; both engines pay the same
    # blow-up — the engine crosses over to 0.5x there)
    "dedup_repeated_passages": {"sf10x": "single"},
}

# LLM-pipeline operators, measured as their OWN curve (SCALE_CURVE_LLM=1
# -> this set replaces the bench headline set). Separate run on purpose:
# repetition_stats / unigram_surprisal at the 100x point are tens of
# seconds per sample and evict the page cache between rotation samples,
# which contaminates the sub-second headline queries with cold-read times
# (measured: ann_brute_topk 37 s median inside a mixed rotation vs 1.1 s
# warm standalone). One rotation = one cache regime; two files, two
# honest protocols.
LLM_QUERIES = (
    "text_stats",
    "repetition_stats",
    "unigram_surprisal",
    "dedup_exact",
    "dedup_repeated_passages",
    "quality_filter",
)


def _shift_units() -> dict[tuple[str, str], int]:
    shift_cols: dict[tuple[str, str], int] = {}
    for cols in KEY_DOMAINS.values():
        unit = 0
        for t, c in cols:
            tab = pq.read_table(table_path(BASE, t), columns=[c])
            unit = max(unit, pc.max(tab[c]).as_py() + 1)
        for t, c in cols:
            shift_cols[(t, c)] = unit
    return shift_cols


def build_replica(out_dir: str, replicas: int) -> None:
    """N FK-consistent disjoint copies of sf0.1. Tables that exceed one
    replica-chunk per file are written as a directory of per-replica part
    files (bounded memory: one shifted copy in flight at a time; Spark and
    DuckDB both read the directory)."""
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return
    os.makedirs(out_dir, exist_ok=True)
    shift_cols = _shift_units()
    for t in TABLES:
        tab = pq.read_table(table_path(BASE, t))
        dst = os.path.join(out_dir, f"{t}.parquet")
        as_dir = tab.num_rows * replicas > 2_000_000
        if as_dir:
            os.makedirs(dst, exist_ok=True)
        chunks = []
        for r in range(replicas):
            cols = []
            for name in tab.column_names:
                col = tab[name]
                unit = shift_cols.get((t, name))
                if unit and r:
                    col = pc.add(col, pa.scalar(r * unit, type=col.type))
                cols.append(col)
            rep = pa.table(dict(zip(tab.column_names, cols)))
            if as_dir:
                pq.write_table(rep, os.path.join(dst, f"part-{r:05d}.parquet"))
            else:
                chunks.append(rep)
        if not as_dir:
            pq.write_table(pa.concat_tables(chunks), dst)
    open(os.path.join(out_dir, "_SUCCESS"), "w").close()


def main() -> None:
    scales = {
        "sf0.01": "/root/testdata/sf0.01",
        "sf0.1": "/root/testdata/sf0.1",
        "sf1.0x": os.path.join(SCALE_ROOT, "sf1.0x"),
    }
    build_replica(scales["sf1.0x"], 10)
    if os.environ.get("SCALE_CURVE_X100"):
        scales["sf10x"] = os.path.join(SCALE_ROOT, "sf10x")
        build_replica(scales["sf10x"], 100)
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
    qs = all_queries()
    if os.environ.get("SCALE_CURVE_LLM"):
        bench = {n: qs[n] for n in LLM_QUERIES}
    else:
        bench = {n: dq for n, dq in qs.items() if dq.bench}
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
    duck_single = {}
    duck_skipped = {}
    for s, d in scales.items():
        con = duckdb.connect()
        for t in TABLES:
            p = table_path(d, t)
            if os.path.isdir(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                )
            elif os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        for n, dq in sorted(bench.items()):
            if not dq.oracle:
                continue
            mode = _DUCK_SKIP_AT.get(n, {}).get(s)
            if mode not in (None, "single"):
                duck.setdefault(n, {})[s] = None
                duck_skipped.setdefault(n, {})[s] = mode
                continue
            if mode == "single":
                t0 = time.perf_counter()
                con.execute(dq.oracle).fetchall()
                duck.setdefault(n, {})[s] = round(
                    (time.perf_counter() - t0) * 1000, 1
                )
                duck_single.setdefault(n, []).append(s)
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
        "duckdb_single_run": duck_single,
        "duckdb_skipped": duck_skipped,
    }
    print(json.dumps(out, indent=1))
    if len(sys.argv) > 1:
        json.dump(out, open(sys.argv[1], "w"), indent=1)


if __name__ == "__main__":
    main()
