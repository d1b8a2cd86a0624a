from ecommerce_dbt_medallion_spark.quality.checks import (
    CHECKS,
    dq_generic_tests,
    dq_singular_tests,
    oracle_dq_generic_sql,
    oracle_dq_singular_sql,
)

__all__ = [
    "CHECKS",
    "dq_generic_tests",
    "dq_singular_tests",
    "oracle_dq_generic_sql",
    "oracle_dq_singular_sql",
]
