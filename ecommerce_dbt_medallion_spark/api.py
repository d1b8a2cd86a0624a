"""Public inventory: queries() and oracle_sql() assembled from the model
modules. ``__spark_entry__.py`` re-exports these for the driver.

Money columns are decimal(18,2) inside the engine (exact arithmetic) and
cast to double at the API boundary so Spark and DuckDB result schemas
match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.models import bronze, silver, gold
from ecommerce_dbt_medallion_spark.oracle import oracle_sql_medallion

QueryFn = Callable[[SparkSession, str], DataFrame]


def _money_to_double(fn: QueryFn, cols: list[str]) -> QueryFn:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = fn(spark, sf_dir)
        for c in cols:
            df = df.withColumn(c, F.col(c).cast("double"))
        return df

    return wrapped


def queries() -> dict[str, QueryFn]:
    return {
        "bronze_customers": bronze.bronze_customers,
        "bronze_orders": _money_to_double(bronze.bronze_orders, ["order_amount"]),
        "bronze_payments": _money_to_double(bronze.bronze_payments, ["payment_amount"]),
        "silver_customers": silver.silver_customers,
        "silver_orders": _money_to_double(silver.silver_orders, ["order_amount"]),
        "silver_payments": _money_to_double(silver.silver_payments, ["payment_amount"]),
        "gold_customer_summary": gold.gold_customer_summary,
        "gold_order_metrics": gold.gold_order_metrics,
        "gold_revenue_analysis": gold.gold_revenue_analysis,
    }


def oracle_sql() -> dict[str, str]:
    return dict(oracle_sql_medallion())
