"""Raw e-commerce source synthesis (deterministic).

The reference ingests ``RAW_DATA.ECOMMERCE.raw_{customers,orders,payments}``
(models/bronze/bronze.yml:5-36). The driver testdata is TPC-H-ish, so this
module derives those three raw tables deterministically:

- ``raw_customers``  ← ``customer``  (1 row per customer)
- ``raw_orders``     ← ``orders``    (1 row per order)
- ``raw_payments``   ← ``lineitem``  (1 payment per order line — the big fact)

The synthesis seeds realistic dirt (NULLs, bad emails, case/whitespace noise,
status synonyms, negative amounts) keyed on stable integer columns, so the
silver layer's cleaning/validation rules (the reference's whole point) have
real work to do — and the DuckDB oracle reproduces the identical rows.

Everything here is built-in Column expressions (JVM, whole-stage codegen);
at 100 TB these are zero-shuffle narrow maps fused into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_dbt_medallion_spark.config import BATCH_TS
from ecommerce_dbt_medallion_spark.sources.registry import load_table

EMAIL_DOMAINS = ["example.com", "shop-mail.com", "gmail.com", "outlook.com", "mail.co"]

# Raw status synonyms per TPC-H o_orderstatus family; silver normalizes them
# back (models/silver/silver_orders.sql:42-51).
STATUS_F = ["completed", "Complete", "SUCCESS", "delivered"]
STATUS_O = ["pending", "Processing", "IN_PROGRESS"]
STATUS_P = ["cancelled", "Canceled", "FAILED", "returned"]

# Raw payment-method spellings; silver normalizes
# (models/silver/silver_payments.sql:36-49).
PAYMENT_METHODS = [
    "credit_card", "Credit Card", "VISA", "mastercard",  # → credit_card
    "wire", "ACH",                                       # → bank_transfer
    "PayPal",                                            # → paypal
    "cash on delivery", "COD",                           # → cash
    "apple_pay",                                         # → digital_wallet
    "crypto",                                            # → other
]


def _pick(key: Column, options: list[str]) -> Column:
    """options[key % len(options)] as a CASE chain (mirrored in oracle SQL)."""
    n = len(options)
    expr = F.when(key % n == 0, F.lit(options[0]))
    for i in range(1, n):
        expr = expr.when(key % n == i, F.lit(options[i]))
    return expr


def raw_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raw_customers(id, first_name, last_name, email, created_at)."""
    c = load_table(spark, sf_dir, "customer")
    cid = F.col("c_custkey")
    base_first = F.split_part(F.col("c_name"), F.lit("#"), F.lit(1))
    base_last = F.concat(F.lit("c"), F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)))

    first0 = (
        F.when(cid % 3 == 0, F.upper(base_first))
        .when(cid % 3 == 1, F.lower(base_first))
        .otherwise(base_first)
    )
    first1 = F.when(cid % 7 == 0, F.concat(F.lit("  "), first0, F.lit(" "))).otherwise(first0)
    first = F.when(cid % 59 == 0, F.lit(None).cast("string")).otherwise(first1)

    last0 = F.when(cid % 4 == 0, F.upper(base_last)).otherwise(base_last)
    last = F.when(cid % 61 == 0, F.lit(None).cast("string")).otherwise(last0)

    email_base = F.concat(
        F.lower(base_first), F.lit("."), F.lower(base_last), F.lit("@"),
        _pick(cid, EMAIL_DOMAINS),
    )
    email = (
        F.when(cid % 53 == 0, F.lit(None).cast("string"))
        .when(cid % 47 == 0, F.regexp_replace(email_base, "@", "-at-"))
        .when(cid % 11 == 0, F.upper(email_base))
        .otherwise(email_base)
    )

    created_at = F.expr(
        "timestamp'2020-01-01 00:00:00'"
        " + make_interval(0, 0, 0, cast(c_custkey % 1461 as int),"
        " 0, 0, cast((c_custkey * 7919) % 86400 as int))"
    )

    return c.select(
        cid.alias("id"),
        first.alias("first_name"),
        last.alias("last_name"),
        email.alias("email"),
        created_at.alias("created_at"),
    )


def raw_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raw_orders(id, user_id, order_date, status, amount, _loaded_at)."""
    o = load_table(spark, sf_dir, "orders")
    oid = F.col("o_orderkey")
    status = (
        F.when(oid % 101 == 0, F.lit("mystery"))
        .when(F.col("o_orderstatus") == "F", _pick(oid, STATUS_F))
        .when(F.col("o_orderstatus") == "O", _pick(oid, STATUS_O))
        .otherwise(_pick(oid, STATUS_P))
    )
    amount0 = F.col("o_totalprice").cast("decimal(18,2)")
    amount = F.when(oid % 97 == 0, -amount0).otherwise(amount0)
    order_date = F.when(oid % 89 == 0, F.lit(None).cast("date")).otherwise(
        F.col("o_orderdate").cast("date")
    )
    return o.select(
        oid.alias("id"),
        F.col("o_custkey").alias("user_id"),
        order_date.alias("order_date"),
        status.alias("status"),
        amount.alias("amount"),
        F.lit(BATCH_TS).cast("timestamp").alias("_loaded_at"),
    )


def raw_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raw_payments(id, order_id, payment_method, amount, payment_date).

    The synthetic lineitem feed contains duplicate (orderkey, linenumber)
    pairs (up to 6), so the payment id adds a per-pair sequence number —
    a partition-local row_number ordered by (suppkey, partkey), which is
    verified unique within each pair — a deterministic "gateway attempt
    sequence". Window partitions on the natural ingest key — no global
    sort at scale, and the narrow sort key keeps column pruning intact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    # Partition the fact by l_orderkey ALONE before the window: hash(ok)
    # satisfies the window's ClusteredDistribution(ok, ln) (subset rule),
    # and downstream consumers join on order_id — at scale (orders too
    # big to broadcast) the SMJ reuses this exchange, so the biggest
    # fact shuffles ONCE instead of hash(ok,ln)-then-hash(ok) twice.
    li = li.repartition("l_orderkey")
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        "l_suppkey", "l_partkey"
    )
    li = li.withColumn("attempt_seq", F.row_number().over(w) - 1)
    pid = F.col("l_orderkey") * 1000 + F.col("l_linenumber") * 10 + F.col("attempt_seq")
    # Exact-decimal discount math (price/discount are 2dp): the product is an
    # exact 4dp decimal in ANY engine — no double-rounding ties.
    amount0 = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    amount = F.when(
        (F.col("l_orderkey") + F.col("l_linenumber")) % 29 == 0, -amount0
    ).otherwise(amount0)
    return li.select(
        pid.alias("id"),
        F.col("l_orderkey").alias("order_id"),
        _pick(F.col("l_suppkey"), PAYMENT_METHODS).alias("payment_method"),
        amount.alias("amount"),
        F.col("l_shipdate").alias("payment_date"),
    )


def raw_payments_unkeyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """raw_payments minus the id (and its row_number window).

    Aggregation-only consumers (gold marts count rows and sum amounts —
    payment ids never reach their output) use this variant to skip the
    per-(order,line) sequence window entirely: at 100 TB that removes a
    full shuffle+sort of the biggest fact from the mart builds. Value-
    identical to ``raw_payments`` for any id-free computation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    amount0 = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    amount = F.when(
        (F.col("l_orderkey") + F.col("l_linenumber")) % 29 == 0, -amount0
    ).otherwise(amount0)
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        _pick(F.col("l_suppkey"), PAYMENT_METHODS).alias("payment_method"),
        amount.alias("amount"),
        F.col("l_shipdate").alias("payment_date"),
    )
