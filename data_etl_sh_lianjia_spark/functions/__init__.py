from data_etl_sh_lianjia_spark.functions.deterministic import davg, dsum

__all__ = ["davg", "dsum"]
