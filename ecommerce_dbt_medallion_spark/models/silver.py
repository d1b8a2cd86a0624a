"""Silver layer — cleaned, conformed entities (reference parity).

Re-implements, Spark-first:
- models/silver/silver_customers.sql (surrogate keys, initcap/trim names,
  lowercase email, ``%@%.%`` validity filter, DQ flag)
- models/silver/silver_orders.sql    (join to customers, status
  normalization, business flags, date parts, amount>0 filter)
- models/silver/silver_payments.sql  (join to orders, payment-method
  normalization, success flags, size buckets)

Determinism deltas from the reference (documented in SURVEY.md §3):
``current_timestamp()`` → BATCH_TS. Surrogate keys follow
dbt_utils.generate_surrogate_key semantics for a single non-null key:
md5(cast(key as string)).

Scale notes: amounts are decimal(18,2) internally so every downstream sum
is exact (and engine-independent); the orders⋈customers and
payments⋈orders joins are key-partitioned shuffle joins — both sides grow
with data volume, so they are NOT broadcast; AQE balances skew at runtime.
All expressions are built-in Columns → whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.config import BATCH_TS
from ecommerce_dbt_medallion_spark.models.bronze import (
    bronze_customers,
    bronze_orders,
    bronze_payments,
)

# Status families — models/silver/silver_orders.sql:42-51.
COMPLETED_STATUSES = ["completed", "complete", "success", "delivered"]
PENDING_STATUSES = ["pending", "processing", "in_progress"]
CANCELLED_STATUSES = ["cancelled", "canceled", "failed", "returned"]

# Payment-method families — models/silver/silver_payments.sql:36-49.
CREDIT_CARD_METHODS = ["credit_card", "credit card", "cc", "visa", "mastercard", "amex"]
BANK_TRANSFER_METHODS = ["bank_transfer", "bank transfer", "wire", "ach", "direct_debit"]
PAYPAL_METHODS = ["paypal", "pp"]
CASH_METHODS = ["cash", "cash on delivery", "cod"]
DIGITAL_WALLET_METHODS = ["apple_pay", "google_pay", "digital_wallet"]


def surrogate_key(col: str | Column) -> Column:
    """dbt_utils.generate_surrogate_key(['k']) ≡ md5(cast(k as varchar))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def _updated_at() -> Column:
    return F.lit(BATCH_TS).cast("timestamp")


def silver_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: models/silver/silver_customers.sql:19-66."""
    return silver_customers_df(bronze_customers(spark, sf_dir))


def silver_customers_df(b: DataFrame) -> DataFrame:
    """Pure transformation: bronze_customers → silver_customers."""
    valid = (
        F.col("email").isNotNull()
        & F.col("first_name").isNotNull()
        & F.col("last_name").isNotNull()
        & F.col("email").like("%@%.%")
    )
    first = F.initcap(F.trim(F.col("first_name")))
    last = F.initcap(F.trim(F.col("last_name")))
    dq = (
        F.when(F.col("first_name").isNull(), 1)
        .when(F.col("last_name").isNull(), 1)
        .when(F.col("email").isNull(), 1)
        .when(~F.col("email").like("%@%.%"), 1)
        .otherwise(0)
        .cast("long")
    )
    return b.where(valid).select(
        surrogate_key("customer_id").alias("customer_key"),
        "customer_id",
        first.alias("first_name"),
        last.alias("last_name"),
        F.concat(first, F.lit(" "), last).alias("full_name"),
        F.lower(F.trim(F.col("email"))).alias("email"),
        "created_at",
        "_loaded_at",
        _updated_at().alias("_updated_at"),
        dq.alias("_has_data_quality_issues"),
    )


def standardize_order_status(raw: Column) -> Column:
    """models/silver/silver_orders.sql:42-51 status CASE."""
    low = F.lower(raw)
    return (
        F.when(low.isin(COMPLETED_STATUSES), "completed")
        .when(low.isin(PENDING_STATUSES), "pending")
        .when(low.isin(CANCELLED_STATUSES), "cancelled")
        .otherwise("unknown")
    )


def silver_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: models/silver/silver_orders.sql:19-103.

    Inner join to silver_customers (drops orders of invalid customers),
    amount>0 and non-null date filters, standardized status + flags,
    date-part derivations.
    """
    return silver_orders_df(
        bronze_orders(spark, sf_dir), silver_customers(spark, sf_dir)
    )


def silver_orders_df(o: DataFrame, sc: DataFrame) -> DataFrame:
    """Pure transformation: (bronze_orders, silver_customers) → silver_orders."""
    c = sc.select("customer_id", "customer_key")
    low = F.lower(F.col("order_status"))
    joined = (
        o.where((F.col("order_amount") > 0) & F.col("order_date").isNotNull())
        .join(c, "customer_id", "inner")
    )
    return joined.select(
        surrogate_key("order_id").alias("order_key"),
        "customer_key",
        "order_id",
        "customer_id",
        "order_date",
        standardize_order_status(F.col("order_status")).alias("order_status"),
        low.isin(COMPLETED_STATUSES).alias("is_completed"),
        low.isin(CANCELLED_STATUSES).alias("is_cancelled"),
        low.isin(PENDING_STATUSES).alias("is_pending"),
        "order_amount",
        F.year("order_date").cast("long").alias("order_year"),
        F.month("order_date").cast("long").alias("order_month"),
        F.dayofmonth("order_date").cast("long").alias("order_day"),
        F.quarter("order_date").cast("long").alias("order_quarter"),
        F.date_format("order_date", "EEEE").alias("order_day_name"),
        F.date_format("order_date", "yyyy-MM").alias("order_year_month"),
        F.concat(
            F.year("order_date").cast("string"),
            F.lit("-"),
            F.quarter("order_date").cast("string"),
        ).alias("order_year_quarter"),
        "_loaded_at",
        _updated_at().alias("_updated_at"),
        F.when(F.col("order_amount") <= 0, 1)
        .when(F.col("order_date").isNull(), 1)
        .when(F.col("customer_key").isNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("_has_data_quality_issues"),
    )


def standardize_payment_method(raw: Column) -> Column:
    """models/silver/silver_payments.sql:36-49 method CASE."""
    low = F.lower(raw)
    return (
        F.when(low.isin(CREDIT_CARD_METHODS), "credit_card")
        .when(low.isin(BANK_TRANSFER_METHODS), "bank_transfer")
        .when(low.isin(PAYPAL_METHODS), "paypal")
        .when(low.isin(CASH_METHODS), "cash")
        .when(low.isin(DIGITAL_WALLET_METHODS), "digital_wallet")
        .otherwise("other")
    )


def silver_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference: models/silver/silver_payments.sql:19-94.

    The big fact: one row per order line at lineitem scale. Join to
    silver_orders shuffles both sides on order_id — the dominant shuffle
    of the pipeline; AQE skew-join splits hot orders.
    """
    return silver_payments_df(
        bronze_payments(spark, sf_dir), silver_orders(spark, sf_dir)
    )


def silver_payments_df(p: DataFrame, so: DataFrame) -> DataFrame:
    """Pure transformation: (bronze_payments, silver_orders) → silver_payments."""
    o = so.select("order_id", "order_key")
    joined = p.join(o, "order_id", "inner")
    return joined.select(
        surrogate_key("payment_id").alias("payment_key"),
        "order_key",
        "payment_id",
        "order_id",
        standardize_payment_method(F.col("payment_method")).alias("payment_method"),
        "payment_amount",
        "payment_date",
        (F.col("payment_amount") > 0).alias("is_successful_payment"),
        (F.col("payment_amount") <= 0).alias("is_failed_payment"),
        F.when(F.col("payment_amount") < 50, "small")
        .when(F.col("payment_amount") < 200, "medium")
        .when(F.col("payment_amount") < 500, "large")
        .otherwise("very_large")
        .alias("payment_size_category"),
        "_loaded_at",
        _updated_at().alias("_updated_at"),
        F.when(F.col("payment_amount") <= 0, 1)
        .when(F.col("payment_date").isNull(), 1)
        .when(F.col("order_key").isNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("_has_data_quality_issues"),
    )


def silver_payments_for_agg(
    spark: SparkSession, sf_dir: str, so: DataFrame | None = None
) -> DataFrame:
    """Column-compatible stand-in for silver_payments for AGGREGATION-ONLY
    consumers (the gold marts count payments and sum amounts; real payment
    ids never reach their output). Skips raw_payments' per-(order,line)
    sequence window — at 100 TB that removes a full shuffle+sort of the
    biggest fact from every mart build. Value-identical results.
    """
    from ecommerce_dbt_medallion_spark.sources.mapping import raw_payments_unkeyed

    p = raw_payments_unkeyed(spark, sf_dir)
    o = (so if so is not None else silver_orders(spark, sf_dir)).select(
        "order_id", "order_key"
    )
    return p.join(o, "order_id", "inner").select(
        F.lit("only-ever-counted").alias("payment_key"),
        "order_key",
        standardize_payment_method(F.col("payment_method")).alias("payment_method"),
        F.col("amount").alias("payment_amount"),
        "payment_date",
        (F.col("amount") > 0).alias("is_successful_payment"),
    )
