"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's declared-query registry
(``data_etl_sh_lianjia_spark.plans.registry``): every operator implemented
from SURVEY.md §2 registers exactly one (spark_fn, oracle_sql) pair there,
and this module exposes them to the driver's verify harness.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_etl_sh_lianjia_spark.plans.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    q = all_queries()["q1_scan_agg"]
    return q.spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: dq.spark_fn for name, dq in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; approximate/non-SQL operators are omitted
    (driver records the weaker rows-only check for those)."""
    return {
        name: dq.oracle for name, dq in all_queries().items() if dq.oracle is not None
    }
