"""A/B profile: q1 raw-vs-ingested interleaved in ONE session, plus the
split-distinct rewrite vs the Expand-based multi-distinct form.

VERDICT r2 flagged a q1 regression between rounds measured in different
sessions — this host throttles in multi-minute phases, so only interleaved
same-session samples are comparable. Two regimes per variant:
- exec-only: plan built once, `.toPandas()` timed (isolates layout/plan);
- fresh-build: plan rebuilt per run over memoized views (bench protocol).
Usage: python tools/profile_q1_ab.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.plans.registry import all_queries
from data_etl_sh_lianjia_spark.session import get_spark, ingest_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("RUNS", "15"))

EXPAND_SQL = """
SELECT COUNT(DISTINCT l_partkey) AS distinct_parts,
       COUNT(DISTINCT l_suppkey) AS distinct_supps,
       COUNT(*) AS n_rows
FROM lj_lineitem
"""


def main() -> None:
    spark = get_spark(
        app_name="profile-q1-ab",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
        },
    )
    q = all_queries()

    # Build the raw-layout q1 plan while no ingest redirect exists, then
    # ingest and build the managed-layout plans — each DataFrame pins its
    # own file listing, so both coexist in one session.
    q1_raw_df = q["q1_scan_agg"].spark_fn(spark, SF_DIR)
    ingest_tables(spark, SF_DIR)
    q1_ing_df = q["q1_scan_agg"].spark_fn(spark, SF_DIR)
    split_df = q["distinct_count"].spark_fn(spark, SF_DIR)
    expand_df = spark.sql(EXPAND_SQL)

    exec_variants = {
        "exec q1_raw": q1_raw_df,
        "exec q1_ingested": q1_ing_df,
        "exec distinct_split": split_df,
        "exec distinct_expand": expand_df,
    }
    # fresh-build variants run over warm memoized views (bench protocol)
    fresh_variants = {
        "fresh q1_ingested": lambda: q["q1_scan_agg"].spark_fn(spark, SF_DIR),
        "fresh distinct_split": lambda: q["distinct_count"].spark_fn(spark, SF_DIR),
        "fresh distinct_expand": lambda: spark.sql(EXPAND_SQL),
    }
    for df in exec_variants.values():
        df.toPandas()
        df.toPandas()
    for fn in fresh_variants.values():
        fn().toPandas()
    samples: dict[str, list[float]] = {}
    for _ in range(RUNS):
        for n, df in exec_variants.items():
            t0 = time.perf_counter()
            df.toPandas()
            samples.setdefault(n, []).append(time.perf_counter() - t0)
        for n, fn in fresh_variants.items():
            t0 = time.perf_counter()
            fn().toPandas()
            samples.setdefault(n, []).append(time.perf_counter() - t0)
    for n, ts in samples.items():
        print(
            f"{n:22s} median={statistics.median(ts)*1000:7.1f} ms  "
            f"min={min(ts)*1000:7.1f} ms  max={max(ts)*1000:7.1f} ms"
        )


if __name__ == "__main__":
    main()
