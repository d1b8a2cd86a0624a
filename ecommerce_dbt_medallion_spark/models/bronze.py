"""Bronze layer — minimal-transformation ingestion (reference parity).

Re-implements, Spark-first:
- models/bronze/bronze_customers.sql (rename + audit columns)
- models/bronze/bronze_orders.sql    (rename, preserve raw ``_loaded_at``)
- models/bronze/bronze_payments.sql  (rename + audit columns)

The reference stamps ``current_timestamp()`` as ``_loaded_at``; this engine
uses the deterministic ``BATCH_TS`` (see config.py). Bronze stays a pure
narrow projection — at scale it fuses into the parquet scan with zero
shuffle, and Catalyst prunes unused bronze columns out of downstream plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.config import BATCH_TS
from ecommerce_dbt_medallion_spark.sources import mapping


def _batch_ts() -> F.Column:
    return F.lit(BATCH_TS).cast("timestamp")


def bronze_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: models/bronze/bronze_customers.sql:20-37."""
    return mapping.raw_customers(spark, sf_dir).select(
        F.col("id").alias("customer_id"),
        "first_name",
        "last_name",
        "email",
        "created_at",
        _batch_ts().alias("_loaded_at"),
        F.lit("bronze_customers").alias("_source_model"),
    )


def bronze_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: models/bronze/bronze_orders.sql:21-39."""
    return mapping.raw_orders(spark, sf_dir).select(
        F.col("id").alias("order_id"),
        F.col("user_id").alias("customer_id"),
        "order_date",
        F.col("status").alias("order_status"),
        F.col("amount").alias("order_amount"),
        "_loaded_at",
        F.lit("bronze_orders").alias("_source_model"),
    )


def bronze_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: models/bronze/bronze_payments.sql:22-40."""
    return mapping.raw_payments(spark, sf_dir).select(
        F.col("id").alias("payment_id"),
        "order_id",
        "payment_method",
        F.col("amount").alias("payment_amount"),
        "payment_date",
        _batch_ts().alias("_loaded_at"),
        F.lit("bronze_payments").alias("_source_model"),
    )
