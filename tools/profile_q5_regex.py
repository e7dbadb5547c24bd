"""A/B plan-shape profiling for q5_join5 and string_regex (bench config).

Interleaved in one warm session (same rationale as profile_dc_json.py).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.session import get_spark, ingest_tables, load_tables

RUNS = int(os.environ.get("RUNS", "15"))

DSUM = (
    "CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))"
    " AS DECIMAL(38,6)) AS DOUBLE) AS revenue"
)

variants = {
    # current registered form
    "q5_current": f"""
SELECT /*+ BROADCAST(c), BROADCAST(s), BROADCAST(n), BROADCAST(r) */
       n_name, {DSUM}
FROM li l
JOIN ord o ON l_orderkey = o_orderkey
JOIN cust c ON c_custkey  = o_custkey
JOIN supp s ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nat n  ON s_nationkey = n_nationkey
JOIN reg r  ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
GROUP BY n_name
""",
    # ASIA pushed into dim CTEs so customer/supplier broadcasts shrink 5x
    # and non-ASIA orders drop before touching lineitem
    "q5_asia_dims": f"""
WITH asia_n AS (
  SELECT /*+ BROADCAST(r) */ n_nationkey, n_name
  FROM nat JOIN reg r ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
ac AS (
  SELECT /*+ BROADCAST(asia_n) */ c_custkey, c_nationkey
  FROM cust JOIN asia_n ON c_nationkey = n_nationkey
),
asup AS (
  SELECT /*+ BROADCAST(asia_n) */ s_suppkey, s_nationkey, n_name
  FROM supp JOIN asia_n ON s_nationkey = n_nationkey
)
SELECT /*+ BROADCAST(ac), BROADCAST(asup) */ n_name, {DSUM}
FROM li l
JOIN ord o ON l_orderkey = o_orderkey
JOIN ac   ON c_custkey  = o_custkey
JOIN asup ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP_NTZ '1998-01-01 00:00:00'
GROUP BY n_name
""",
    "sr_current": """
SELECT doc_id, lang, source, n_chars
FROM docs
WHERE text RLIKE '(join|merge) (scan|sort)'
  AND lang IN ('en', 'zh', 'de')
""",
    # cheap predicates first: IN-list, then substring guard, regex last
    "sr_guarded": """
SELECT doc_id, lang, source, n_chars
FROM docs
WHERE lang IN ('en', 'zh', 'de')
  AND (instr(text, 'join ') > 0 OR instr(text, 'merge ') > 0)
  AND text RLIKE '(join|merge) (scan|sort)'
""",
    "sr_lang_first": """
SELECT doc_id, lang, source, n_chars
FROM docs
WHERE lang IN ('en', 'zh', 'de')
  AND text RLIKE '(join|merge) (scan|sort)'
""",
    "sr_no_regex": """
SELECT doc_id, lang, source, n_chars
FROM docs
WHERE lang IN ('en', 'zh', 'de')
""",
}


def main() -> None:
    spark = get_spark(
        app_name="profile_q5_regex",
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
    t = load_tables(
        spark, sf,
        names=("lineitem", "orders", "customer", "supplier", "nation", "region", "documents"),
    )
    for name, view in [
        ("lineitem", "li"), ("orders", "ord"), ("customer", "cust"),
        ("supplier", "supp"), ("nation", "nat"), ("region", "reg"),
        ("documents", "docs"),
    ]:
        t[name].createOrReplaceTempView(view)

    # value parity across variants first
    import pandas as pd

    base_q5 = spark.sql(variants["q5_current"]).toPandas().sort_values("n_name").reset_index(drop=True)
    alt_q5 = spark.sql(variants["q5_asia_dims"]).toPandas().sort_values("n_name").reset_index(drop=True)
    assert base_q5.equals(alt_q5), "q5 variant mismatch"
    base_sr = spark.sql(variants["sr_current"]).toPandas().sort_values("doc_id").reset_index(drop=True)
    for v in ("sr_guarded", "sr_lang_first"):
        alt = spark.sql(variants[v]).toPandas().sort_values("doc_id").reset_index(drop=True)
        assert base_sr.equals(alt), f"{v} mismatch"
    print(f"parity OK (q5 rows={len(base_q5)}, sr rows={len(base_sr)})")

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
            f"{name:14s} median={statistics.median(s)*1000:7.1f}ms "
            f"best={min(s)*1000:7.1f}ms"
        )


if __name__ == "__main__":
    main()
