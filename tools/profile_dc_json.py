"""A/B plan-shape profiling for the two weakest bench queries.

distinct_count variants: split cross-join (current), Expand multi-distinct,
single-branch, bare count(*).  json_events variants: get_json_object
(current), from_json schema, variant_get, no-JSON control.  All run
interleaved in ONE warm bench-config session so host-phase noise hits every
variant equally (the cross-session comparisons in r1/r2 were unreliable).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.session import get_spark, ingest_tables, load_tables

RUNS = int(os.environ.get("RUNS", "15"))


def main() -> None:
    spark = get_spark(
        app_name="profile_dc_json",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.constraintPropagation.enabled": "false",
            "spark.sql.adaptive.enabled": "false",
            "spark.locality.wait": "0",
            "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
        },
    )
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ingest_tables(spark, sf)
    t = load_tables(spark, sf, names=("lineitem", "events"))
    t["lineitem"].createOrReplaceTempView("li")
    t["events"].createOrReplaceTempView("ev")

    dsum = (
        "CAST(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS DOUBLE)"
        " AS sum_value"
    )
    variants = {
        "dc_split": """
            SELECT p.distinct_parts, s.distinct_supps, s.n_rows
            FROM (SELECT COUNT(DISTINCT l_partkey) AS distinct_parts FROM li) p
            CROSS JOIN (SELECT COUNT(DISTINCT l_suppkey) AS distinct_supps,
                               COUNT(*) AS n_rows FROM li) s
        """,
        "dc_expand": """
            SELECT COUNT(DISTINCT l_partkey) AS distinct_parts,
                   COUNT(DISTINCT l_suppkey) AS distinct_supps,
                   COUNT(*) AS n_rows
            FROM li
        """,
        "dc_one_branch": "SELECT COUNT(DISTINCT l_partkey) AS d FROM li",
        "dc_count_only": "SELECT COUNT(*) AS n FROM li",
        "je_get_json": f"""
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(TRY_CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   {dsum}
            FROM ev GROUP BY event_type
        """,
        "je_from_json": f"""
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(from_json(props, 'k BIGINT').k) AS BIGINT) AS sum_k,
                   {dsum}
            FROM ev GROUP BY event_type
        """,
        "je_variant": f"""
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(variant_get(parse_json(props), '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   {dsum}
            FROM ev GROUP BY event_type
        """,
        "je_no_json": f"""
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(length(props)) AS BIGINT) AS sum_k,
                   {dsum}
            FROM ev GROUP BY event_type
        """,
        "je_no_dsum": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(TRY_CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
            FROM ev GROUP BY event_type
        """,
        "floor_select1": "SELECT 1 AS one",
    }

    for _ in range(3):
        for sql in variants.values():
            spark.sql(sql).toPandas()

    samples: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(RUNS):
        for name, sql in sorted(variants.items()):
            t0 = time.perf_counter()
            spark.sql(sql).toPandas()
            samples[name].append(time.perf_counter() - t0)

    for name in sorted(variants):
        s = samples[name]
        print(
            f"{name:16s} median={statistics.median(s)*1000:7.1f}ms "
            f"best={min(s)*1000:7.1f}ms"
        )


if __name__ == "__main__":
    main()
