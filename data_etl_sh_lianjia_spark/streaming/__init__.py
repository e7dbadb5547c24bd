import data_etl_sh_lianjia_spark.streaming.events  # noqa: F401
