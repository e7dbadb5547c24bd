"""Regression gate for the DuckDB-HUGEINT oracle-authoring pitfall.

Round-7 postmortem: ``expectations_report_orders`` / ``quarantine_orders``
shipped oracles with bare ``SUM(CASE ...)`` — DuckDB types that HUGEINT,
pandas renders it float64, and the round driver hash-mismatched both queries
even though every value was equal. The repo's own sweep stayed green because
``fetchall()`` surfaces HUGEINT as a Python int (and ``int == float``).
These tests pin the structural fix: the oracle sweep's type-family gate
(canon.family_mismatches) must REJECT exactly that oracle shape, so the
class of bug cannot ship again.
"""

from __future__ import annotations

from pyspark.sql import types as T

from data_etl_sh_lianjia_spark.canon import (
    duck_family,
    family_mismatches,
    spark_family,
)

_LONG_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


def _families(con, sql: str):
    rel = con.sql(sql)
    return rel.columns, rel.types


def test_uncast_sum_oracle_is_rejected(oracle_con):
    """The exact pre-fix quality.py shape: bare SUM(CASE...) over orders.
    DuckDB types it HUGEINT -> pandas float64 -> guaranteed driver red
    against Spark's bigint; the family gate must flag it."""
    cols, types = _families(
        oracle_con,
        "SELECT SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n FROM orders",
    )
    assert duck_family(types[0]) == "float"  # pandas floats HUGEINT
    bad = family_mismatches(_LONG_SCHEMA, cols, types)
    assert bad == [("n", "int", "float")], bad


def test_cast_sum_oracle_is_accepted(oracle_con):
    """The repaired shape — CAST(SUM(...) AS BIGINT) — matches Spark's long."""
    cols, types = _families(
        oracle_con,
        "SELECT CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n FROM orders",
    )
    assert duck_family(types[0]) == "int"
    assert family_mismatches(_LONG_SCHEMA, cols, types) == []


def test_double_oracle_vs_spark_long_is_rejected(oracle_con):
    """Same class, other spelling: a DOUBLE oracle column against a Spark
    bigint is also a driver hash mismatch ('f:0' vs '0')."""
    cols, types = _families(oracle_con, "SELECT CAST(0 AS DOUBLE) AS n")
    assert family_mismatches(_LONG_SCHEMA, cols, types) == [("n", "int", "float")]


def test_decimal_oracle_is_float_family(oracle_con):
    """DuckDB DECIMAL reaches pandas as float64 — it must pair with a Spark
    double (float family), never a Spark long or a Spark decimal."""
    cols, types = _families(oracle_con, "SELECT CAST(1.5 AS DECIMAL(10,2)) AS n")
    assert duck_family(types[0]) == "float"
    dbl = T.StructType([T.StructField("n", T.DoubleType())])
    assert family_mismatches(dbl, cols, types) == []
    assert family_mismatches(_LONG_SCHEMA, cols, types) == [("n", "int", "float")]


def test_spark_decimal_output_always_rejected(oracle_con):
    """A Spark DECIMAL output column collects as decimal.Decimal whose
    scale-padded str repr never equals a pandas float repr — flag it against
    ANY numeric oracle family so queries cast to double/long instead."""
    dec = T.StructType([T.StructField("n", T.DecimalType(30, 4))])
    cols, types = _families(oracle_con, "SELECT CAST(1.5 AS DOUBLE) AS n")
    assert family_mismatches(dec, cols, types) == [("n", "dec", "float")]


def test_string_vs_int_not_flagged(oracle_con):
    """'other' families stay out of scope: the driver's str canon can equate
    a string '0' with an int 0, so only int/float/bool drift is structural."""
    s = T.StructType([T.StructField("n", T.StringType())])
    cols, types = _families(oracle_con, "SELECT 0 AS n")
    assert family_mismatches(s, cols, types) == []


def test_pre_r8_quality_oracle_shape_rejected(oracle_con, spark, sf_dir):
    """End-to-end pin on the actual round-7 failure: register the PRE-fix
    quarantine oracle (bare SUMs) against the real Spark query's schema and
    assert the gate rejects it, then assert the SHIPPED oracle passes."""
    from data_etl_sh_lianjia_spark.plans.registry import all_queries

    dq = all_queries()["quarantine_orders"]
    sdf = dq.spark_fn(spark, sf_dir)

    pre_fix = """
WITH flagged AS (
  SELECT *, (NOT COALESCE(o_totalprice > 0, TRUE)) AS bad FROM orders
)
SELECT o_orderstatus,
       SUM(CASE WHEN NOT bad THEN 1 ELSE 0 END) AS n_valid,
       SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS n_quarantined
FROM flagged GROUP BY o_orderstatus
"""
    cols, types = _families(oracle_con, pre_fix)
    bad = family_mismatches(sdf.schema, cols, types)
    assert {b[0] for b in bad} == {"n_valid", "n_quarantined"}, bad

    cols, types = _families(oracle_con, dq.oracle)
    assert family_mismatches(sdf.schema, cols, types) == []


def test_spark_family_classification():
    assert spark_family(T.LongType()) == "int"
    assert spark_family(T.IntegerType()) == "int"
    assert spark_family(T.DoubleType()) == "float"
    assert spark_family(T.FloatType()) == "float"
    assert spark_family(T.BooleanType()) == "bool"
    assert spark_family(T.DecimalType(10, 2)) == "dec"
    assert spark_family(T.StringType()) == "other"
    assert spark_family(T.ArrayType(T.LongType())) == "other"
