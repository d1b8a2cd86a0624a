from ecommerce_dbt_medallion_spark.oracle.medallion import oracle_sql_medallion, assemble

__all__ = ["oracle_sql_medallion", "assemble"]
