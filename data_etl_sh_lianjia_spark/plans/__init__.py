from data_etl_sh_lianjia_spark.plans.registry import (
    DeclaredQuery,
    all_queries,
    get_query,
    register,
)

__all__ = ["DeclaredQuery", "all_queries", "get_query", "register"]
