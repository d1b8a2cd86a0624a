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
from ecommerce_dbt_medallion_spark.models import events as ev
from ecommerce_dbt_medallion_spark.oracle import assemble, oracle_sql_medallion
from ecommerce_dbt_medallion_spark.quality import checks as dq

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
        "dq_generic_tests": dq.dq_generic_tests,
        "dq_singular_tests": dq.dq_singular_tests,
        "event_daily_stats": ev.event_daily_stats,
        "event_sessionization": ev.event_sessionization,
    }


def oracle_sql() -> dict[str, str]:
    out = dict(oracle_sql_medallion())
    out["dq_generic_tests"] = dq.oracle_dq_generic_sql()
    out["dq_singular_tests"] = dq.oracle_dq_singular_sql()
    out["event_daily_stats"] = assemble("event_daily_stats")
    out["event_sessionization"] = assemble("event_sessionization")
    return out
