from ecommerce_dbt_medallion_spark.oracle.medallion import (
    assemble,
    assemble_many,
    oracle_sql_medallion,
)

__all__ = ["oracle_sql_medallion", "assemble", "assemble_many"]
