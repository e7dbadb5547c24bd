"""PySpark-native analytics engine with the data-processing capabilities of
the reference crawler ``build2last/data.etl.sh.lianjia`` (a Scrapy ETL
pipeline, see SURVEY.md), re-expressed Spark-first and extended with the
relational / streaming / LLM-data-pipeline operator surface from SURVEY.md §2.

Architecture (SURVEY.md §3.4):

- ``session``    — SparkSession bootstrap + testdata catalog registration.
- ``functions``  — scalar expression library (string/date/JSON/array/vector),
                   including the reference's domain-string normalizers (F1-F13).
- ``operators``  — declared relational/window/dedup/similarity/text operators,
                   each registered in ``plans.registry`` with a DuckDB oracle.
- ``sources``    — readers/sinks (parquet/json/csv; permissive modes) and the
                   Lianjia domain ingest pipeline (reference parity).
- ``plans``      — the declared-query registry: one (spark_fn, oracle_sql)
                   pair per operator; the driver contract reads from here.
- ``streaming``  — Structured Streaming operators over ``events`` with
                   batch-parity semantics (SURVEY.md §2.8).

Everything is built on public Apache Spark APIs; the engine declares logical
plans via DataFrame/SQL and lets Catalyst/AQE choose physical strategies.
"""

from data_etl_sh_lianjia_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
