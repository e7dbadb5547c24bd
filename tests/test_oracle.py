"""Differential oracle harness (SURVEY.md §5.1) — the driver-gate proxy.

Runs every declared query twice (PySpark vs DuckDB) on the same parquet
inputs and requires strictly identical canonicalized results. Queries without
an oracle string get a rows-returned smoke check here; their semantic checks
live in dedicated test modules.
"""

from __future__ import annotations

import pytest

from data_etl_sh_lianjia_spark.canon import compare_results, family_mismatches
from data_etl_sh_lianjia_spark.plans.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, oracle_con, sf_dir):
    dq = QUERIES[name]
    sdf = dq.spark_fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if dq.oracle is None:
        assert isinstance(spark_rows, list)  # smoke: runs and collects
        return

    # Driver-faithful TYPE gate: the driver canonicalizes through pandas,
    # where a DuckDB HUGEINT/DECIMAL column (e.g. an uncast SUM) becomes
    # float64 and hash-mismatches a Spark bigint even when every value is
    # equal. fetchall()-based value comparison cannot see that (int == float
    # in Python), so reject family drift structurally before comparing.
    rel = oracle_con.sql(dq.oracle)
    fam_bad = family_mismatches(sdf.schema, rel.columns, rel.types)
    assert not fam_bad, (
        f"{name}: driver-red column type families (col, spark, duck): "
        f"{fam_bad} — cast the oracle (CAST(... AS BIGINT/DOUBLE)) or the "
        f"Spark side so the driver's pandas canon types both engines alike"
    )

    cur = oracle_con.execute(dq.oracle)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    res = compare_results(spark_rows, spark_cols, duck_rows, duck_cols)
    assert res.ok, (
        f"{name}: {res.reason}\n"
        f"spark rows={res.n_left} duck rows={res.n_right}\n"
        f"sample diffs (spark, duck): {res.sample_diff}"
    )
