from ecommerce_dbt_medallion_spark.sources.registry import load_table
from ecommerce_dbt_medallion_spark.sources.mapping import (
    raw_customers,
    raw_orders,
    raw_payments,
)

__all__ = ["load_table", "raw_customers", "raw_orders", "raw_payments"]
