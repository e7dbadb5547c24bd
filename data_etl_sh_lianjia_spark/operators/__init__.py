"""Operator modules; importing this package registers every declared query."""

import data_etl_sh_lianjia_spark.operators.advanced  # noqa: F401
import data_etl_sh_lianjia_spark.operators.aggregates  # noqa: F401
import data_etl_sh_lianjia_spark.operators.analytics  # noqa: F401
import data_etl_sh_lianjia_spark.operators.dedup  # noqa: F401
import data_etl_sh_lianjia_spark.operators.functions_suite  # noqa: F401
import data_etl_sh_lianjia_spark.operators.graph  # noqa: F401
import data_etl_sh_lianjia_spark.operators.multimodal  # noqa: F401
import data_etl_sh_lianjia_spark.operators.joins  # noqa: F401
import data_etl_sh_lianjia_spark.operators.lakehouse  # noqa: F401
import data_etl_sh_lianjia_spark.operators.quality  # noqa: F401
import data_etl_sh_lianjia_spark.operators.relational  # noqa: F401
import data_etl_sh_lianjia_spark.operators.setops  # noqa: F401
import data_etl_sh_lianjia_spark.operators.similarity  # noqa: F401
import data_etl_sh_lianjia_spark.operators.text_analysis  # noqa: F401
import data_etl_sh_lianjia_spark.operators.tpch_extra  # noqa: F401
import data_etl_sh_lianjia_spark.operators.tpch_extra2  # noqa: F401
import data_etl_sh_lianjia_spark.operators.udf_surface  # noqa: F401
import data_etl_sh_lianjia_spark.operators.windows  # noqa: F401
import data_etl_sh_lianjia_spark.operators.training_pipeline  # noqa: F401
